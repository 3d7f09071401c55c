"""Matched-weather A/B: batch vs streaming bench pipeline (BENCH_PIPE).

The streaming pipeline launches each timepoint's 16 fleet members as soon
as that timepoint's profile CSVs are parsed, so the ~7-9 s host build and
the ~6 s (u16) fleet upload share the wall-clock instead of serializing.
Alternates the mode across repeats IN ONE PROCESS so both face the same
link weather.

Run with no other jax process on the host.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

VARIANTS = os.environ.get("AB_PIPES", "batch,stream").split(",")


def main():
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    root.mkdir(parents=True, exist_ok=True)
    cfg = bench.setup_cohort(root)
    link = bench.warmup_backend()
    bench.log(f"[ab] link probe: H2D {link[0]:.1f} MB/s")
    os.environ.setdefault("BENCH_FLEET_UPLOAD", "u16")
    cycles = int(os.environ.get("AB_CYCLES", "2"))
    results = {v: [] for v in VARIANTS}
    for v in VARIANTS:  # compile each mode's program shapes once, untimed
        os.environ["BENCH_PIPE"] = v
        t0 = time.perf_counter()
        bench._run_pipeline(root, cfg, warm=True)
        bench.log(f"[ab] warmup pipe={v}: {time.perf_counter() - t0:.1f}s")
    for c in range(cycles):
        for v in VARIANTS:
            os.environ["BENCH_PIPE"] = v
            total, *_ = bench._run_pipeline(root, cfg, warm=False)
            results[v].append(total)
            bench.log(f"[ab] cycle {c} pipe={v}: {total:.2f}s")
    for v, vals in results.items():
        bench.log(f"[ab] pipe={v}: {[round(x, 1) for x in vals]} "
                  f"-> best {min(vals):.2f}s")


if __name__ == "__main__":
    main()
