"""Regression-guard the bench's wedged-attachment insurance.

The axon tunnel wedges for 10-60+ min several times a day (observed rounds
4-5); a bench that hangs forever leaves the round with no artifact.  The
defence in bench.py's warmup_backend:

1. backend-init watchdog (BENCH_BACKEND_TIMEOUT_S): if the first program
   hasn't completed, wait BENCH_WEDGE_WAIT_S and re-exec the whole process
   up to BENCH_WEDGE_RETRIES times (a blocked PJRT init can't be retried
   in-process), then exit 3 with a FATAL diagnostic.
2. stand-down: if the wedge clears DURING the retry wait, the watchdog must
   NOT re-exec — that would kill a healthy in-progress run (observed live in
   round 5: warmup returned at 790 s, 30 s before the blind re-exec fired).

These tests drive the real bench.py in a subprocess on the CPU backend with
the BENCH_TEST_WEDGE_S hook simulating the wedge deterministically, and
assert the observable contract.  Slow-marked: full python+jax subprocess
starts (and one complete small bench run for the stand-down path).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_bench(tmp_path, extra_env, timeout=900):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_SCALE="small",
        BENCH_ROOT=str(tmp_path / "cohort"),
        JAX_CACHE_DIR=str(tmp_path / "cache"),
        **extra_env,
    )
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_wedge_watchdog_reexecs_then_exits_3(tmp_path):
    # The simulated wedge (30 s) far exceeds timeout (0.2 s) + wait (0.5 s),
    # so the watchdog fires in every process: one re-exec (retries=1), then
    # the exhausted process exits 3 with the FATAL diagnostic.
    proc = _run_bench(tmp_path, {
        "BENCH_TEST_WEDGE_S": "30",
        "BENCH_BACKEND_TIMEOUT_S": "0.2",
        "BENCH_WEDGE_RETRIES": "1",
        "BENCH_WEDGE_WAIT_S": "0.5",
    })
    out = proc.stdout + proc.stderr
    assert proc.returncode == 3, out[-2000:]
    assert out.count("re-exec in") == 1, out[-2000:]
    assert "FATAL: backend init/first program still blocked" in out
    assert "standing down" not in out


@pytest.mark.slow
def test_wedge_watchdog_exits_3_without_retries(tmp_path):
    proc = _run_bench(tmp_path, {
        "BENCH_TEST_WEDGE_S": "30",
        "BENCH_BACKEND_TIMEOUT_S": "0.2",
        "BENCH_WEDGE_RETRIES": "0",
    })
    out = proc.stdout + proc.stderr
    assert proc.returncode == 3, out[-2000:]
    assert "re-exec in" not in out


@pytest.mark.slow
def test_wedge_clearing_during_wait_stands_down(tmp_path):
    # Wedge clears (3 s) inside the retry wait (60 s): the watchdog must
    # stand down and the bench must run to completion with its JSON line.
    proc = _run_bench(tmp_path, {
        "BENCH_TEST_WEDGE_S": "3",
        "BENCH_BACKEND_TIMEOUT_S": "0.5",
        "BENCH_WEDGE_RETRIES": "2",
        "BENCH_WEDGE_WAIT_S": "60",
    }, timeout=1800)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-2000:]
    assert "standing down" in out
    assert out.count("re-exec in") == 1  # announced, then cancelled
    assert '"metric": "full_cohort_wallclock"' in out
