"""Matched-weather A/B: fleet upload_chunks 1 vs 4 vs 8 (overlap order, u16).

Member-chunked launches should hide chunk N+1's upload + host quantize
under chunk N's execution (the attachment overlaps H2D with exec —
benchmarks/h2d_exec_overlap_probe.py), taking the fleet's ~7.5 s device
exec off the critical path.  Alternates the chunk count across repeats IN
ONE PROCESS so every variant faces the same link weather.

Run with no other jax process on the host.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

VARIANTS = [int(v) for v in
            os.environ.get("AB_CHUNKS", "1,4,8").split(",")]


def main():
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    root.mkdir(parents=True, exist_ok=True)
    cfg = bench.setup_cohort(root)
    link = bench.warmup_backend()
    bench.log(f"[ab] link probe: H2D {link[0]:.1f} MB/s")
    os.environ["BENCH_ORDER"] = "overlap"
    os.environ["BENCH_FLEET_UPLOAD"] = "u16"
    cycles = int(os.environ.get("AB_CYCLES", "2"))
    results = {v: [] for v in VARIANTS}
    for v in VARIANTS:  # compile each chunk shape once, untimed
        os.environ["BENCH_FLEET_CHUNKS"] = str(v)
        t0 = time.perf_counter()
        bench._run_pipeline(root, cfg, warm=True)
        bench.log(f"[ab] warmup chunks={v}: {time.perf_counter() - t0:.1f}s")
    for c in range(cycles):
        for v in VARIANTS:
            os.environ["BENCH_FLEET_CHUNKS"] = str(v)
            total, *_ = bench._run_pipeline(root, cfg, warm=False)
            results[v].append(total)
            bench.log(f"[ab] cycle {c} chunks={v}: {total:.2f}s")
    for v, vals in results.items():
        bench.log(f"[ab] chunks={v}: {[round(x, 1) for x in vals]} "
                  f"-> best {min(vals):.2f}s")


if __name__ == "__main__":
    main()
