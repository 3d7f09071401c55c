"""Matched-weather A/B: fleet upload u16 vs f32 under the 'overlap' order.

The r3 auto-policy (bench.py main) picks f32 above 30 MB/s H2D based on a
fleet_first-era measurement where the quantize pass (0.3 s idle, 2-7 s
under tunnel contention) sat inside the timed enqueue window AND the
geometry fetch queued behind the upload.  Under the round-4 'overlap'
order the quantize runs on an idle link (geometry D2H already drained), so
the tradeoff is ~0.3-0.5 s host vs ~6 s wire at ~32 MB/s.  This probe
alternates the knob across repeats IN ONE PROCESS so both face the same
link weather, like BENCH_ORDER=ab does for stage order.

Run with no other jax process on the host.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def main():
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    root.mkdir(parents=True, exist_ok=True)
    cfg = bench.setup_cohort(root)
    link = bench.warmup_backend()
    bench.log(f"[ab] link probe: H2D {link[0]:.1f} MB/s")
    os.environ["BENCH_ORDER"] = "overlap"
    cycles = int(os.environ.get("AB_CYCLES", "2"))
    results = {"u16": [], "f32": []}
    # one warmup per knob (compile both program variants once, untimed)
    for knob in ("u16", "f32"):
        os.environ["BENCH_FLEET_UPLOAD"] = knob
        t0 = time.perf_counter()
        bench._run_pipeline(root, cfg, warm=True)
        bench.log(f"[ab] warmup {knob}: {time.perf_counter() - t0:.1f}s")
    for c in range(cycles):
        for knob in ("u16", "f32"):
            os.environ["BENCH_FLEET_UPLOAD"] = knob
            total, *_ = bench._run_pipeline(root, cfg, warm=False)
            results[knob].append(total)
            bench.log(f"[ab] cycle {c} {knob}: {total:.2f}s")
    for knob, vals in results.items():
        bench.log(f"[ab] {knob}: {[round(v, 1) for v in vals]} "
                  f"-> best {min(vals):.2f}s")


if __name__ == "__main__":
    main()
