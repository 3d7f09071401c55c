"""Matched-weather A/B: geometry upload codec f32 vs u16-delta.

The geometry stage ships ~141.6 MB of padded f32 points; the u16 delta
codec (ops.geo_codec) ships 0.55x at banded metric parity (torsion
recomputed exactly on the host).  Alternates the codec across repeats IN
ONE PROCESS so both variants face the same link weather.

Run with no other jax process on the host.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

VARIANTS = os.environ.get("AB_GEO", "f32,u16d").split(",")


def main():
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    root.mkdir(parents=True, exist_ok=True)
    cfg = bench.setup_cohort(root)
    link = bench.warmup_backend()
    bench.log(f"[ab] link probe: H2D {link[0]:.1f} MB/s")
    cycles = int(os.environ.get("AB_CYCLES", "2"))
    results = {v: [] for v in VARIANTS}
    for v in VARIANTS:  # compile each codec's programs once, untimed
        os.environ["BENCH_GEO_UPLOAD"] = v
        t0 = time.perf_counter()
        bench._run_pipeline(root, cfg, warm=True)
        bench.log(f"[ab] warmup geo={v}: {time.perf_counter() - t0:.1f}s")
    for c in range(cycles):
        for v in VARIANTS:
            os.environ["BENCH_GEO_UPLOAD"] = v
            total, *_ = bench._run_pipeline(root, cfg, warm=False)
            results[v].append(total)
            bench.log(f"[ab] cycle {c} geo={v}: {total:.2f}s")
    for v, vals in results.items():
        bench.log(f"[ab] geo={v}: {[round(x, 1) for x in vals]} "
                  f"-> best {min(vals):.2f}s")


if __name__ == "__main__":
    main()
