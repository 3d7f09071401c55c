"""Driver-budget guard for the multichip dryrun (VERDICT r3 #5).

Round 3 shipped a driver-visible regression: a new dryrun path blew the
driver's wall-clock budget and the artifact recorded a bare timeout.  This
default-suite test runs the driver-facing fast paths (1-3) INLINE on the
conftest 8-virtual-device CPU mesh under a hard timer, so any future path
addition that would exceed the driver budget fails CI instead of the driver.

The envelope (120 s) is ~6x the measured warm-cache cost (~21 s) — generous
for shared-host CPU weather, tight enough to catch a new minutes-scale path.
"""

import sys
import time
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BUDGET_S = 120.0


def test_fast_paths_within_budget_and_flagship_skip_is_explicit(
        capsys, monkeypatch):
    """One inline dryrun: (a) the fast paths finish inside the driver
    envelope; (b) with a budget they cannot possibly leave room under, the
    flagship path is SKIPPED with an explicit printed line — never a silent
    hang."""
    import __graft_entry__ as g

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    monkeypatch.setenv("GRAFT_FLAGSHIP_BUDGET_S", "0")
    t0 = time.perf_counter()
    g._dryrun_inline(8)
    elapsed = time.perf_counter() - t0
    assert elapsed < BUDGET_S, (
        f"dryrun fast paths took {elapsed:.0f}s (> {BUDGET_S:.0f}s driver "
        f"envelope) — a path got too expensive for the driver's multichip "
        f"artifact; trim it or move it behind the flagship budget")
    out = capsys.readouterr().out
    assert "FLAGSHIP: SKIPPED" in out
    assert "shard_map(dp=8)" in out  # fast paths still ran and printed
    assert "compile-cache:" in out   # cache health is observable
