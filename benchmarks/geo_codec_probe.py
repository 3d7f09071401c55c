"""Probe: can geometry points ship as u16 per-streamline DELTA codes?

The geometry stage is wire-bound (141.6 MB padded f32 points at a
13-34 MB/s link); halving the bytes saves 2-5 s/run.  Round 3 rejected
direct u16 coordinates (the eigen inf-gate has no margin), but a DELTA
codec is much finer: first point exact f32, forward differences quantized
u16 per (streamline, axis) range, decoded on device by cumsum.  Per-delta
resolution is range(d)/65535 ~ 2*step/65535 (~3-8 nm for real tracts) and
cumsum errors random-walk, so position error stays ~1e-5 relative.  The
risk is SECOND differences (curvature/torsion/bend: delta noise is
amplified by 1/|a| where |a| ~ kappa*step^2) and the eigen inf-gate
(covered separately by the widened certificate + exact host f64
refinement from the ORIGINAL points, same mechanism as the f32 gate).

This probe measures, on the real bench cohort: per-metric relative shift
(max / p99) between f32 points and decoded points, and the eigen-gate
flag-rate increase.  Decide by the numbers, like the (rejected) fleet
delta-u8 probe (benchmarks/delta_codec_probe.py).

Runs on CPU; no device needed beyond jit.
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from lesionvae_tpu.core.config import load_config  # noqa: E402
from lesionvae_tpu.io.vtk import read_streamlines  # noqa: E402
from lesionvae_tpu.ops.geometry import (STACKED_NAMES,  # noqa: E402
                                        streamline_metrics_stacked)
from lesionvae_tpu.ops.padding import pad_streamlines  # noqa: E402
from lesionvae_tpu.pipeline.geometry_run import _bucket_P  # noqa: E402


def encode_decode_u16_delta(pts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Round-trip the (S, P, 3) padded block through the u16 delta codec.

    Encoding (what the host would ship): p0 f32 exact; d = diff(points)
    quantized per (streamline, axis) to u16 over [lo, hi]; pad rows ship
    zero codes.  Decoding (what the device program would do): cumsum."""
    S, P, _ = pts.shape
    d = np.diff(pts, axis=1)                       # (S, P-1, 3)
    # mask pad deltas out of the range computation
    seg = np.arange(P - 1)[None, :] < (lens[:, None] - 1)
    dm = np.where(seg[..., None], d, np.nan)
    lo = np.nanmin(dm, axis=1)                     # (S, 3)
    hi = np.nanmax(dm, axis=1)
    lo = np.nan_to_num(lo, nan=0.0)
    hi = np.nan_to_num(hi, nan=0.0)
    sc = (hi - lo) / 65535.0
    sc = np.where(sc <= 0, 1.0, sc)
    codes = np.clip(np.rint((d - lo[:, None, :]) / sc[:, None, :]),
                    0, 65535).astype(np.uint16)
    # decode
    dd = lo[:, None, :] + codes.astype(np.float32) * sc[:, None, :]
    dd = np.where(seg[..., None], dd, 0.0)
    out = np.concatenate([pts[:, :1], pts[:, :1] + np.cumsum(dd, axis=1)],
                         axis=1).astype(np.float32)
    # pad rows beyond lens don't matter (masked in the kernel) but keep
    # them equal to the original pad values for a clean comparison
    pt_mask = np.arange(P)[None, :] < lens[:, None]
    return np.where(pt_mask[..., None], out, pts)


def main():
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    cfg = load_config() if (root / "cohort_full.done").exists() else None
    if cfg is None:
        print("bench cohort missing; run bench.py first", file=sys.stderr)
        sys.exit(1)

    # pool streamlines exactly like the pipeline (per-bundle cap 100)
    sls = []
    n_files = 0
    for g, sids in cfg.subjects_by_group().items():
        for sid in sids:
            for tp in cfg.timepoints:
                d = root / "data" / sid / tp / "bundles"
                if not d.is_dir():
                    continue
                # match the pipeline: prefer the .vtk when both exist
                seen = set()
                files = []
                for fp in sorted(d.glob("*.vtk*")):
                    stem = fp.name.split(".vtk")[0]
                    if stem in seen:
                        continue
                    seen.add(stem)
                    files.append(fp)
                for fp in files:
                    try:
                        bundle = read_streamlines(fp, max_streamlines=100)
                    except Exception:
                        continue
                    n_files += 1
                    sls.extend(bundle)
    print(f"{n_files} bundles, {len(sls)} streamlines")

    # bucket like the pipeline so shapes match production
    buckets = {}
    for sl in sls:
        buckets.setdefault(_bucket_P(len(sl)), []).append(sl)

    shifts = {k: [] for k in STACKED_NAMES}
    n_flag_f32 = n_flag_q = n_total = 0
    bytes_f32 = bytes_u16 = 0
    for P, items in sorted(buckets.items()):
        pts, lens = pad_streamlines(items, max_points=P)
        dec = encode_decode_u16_delta(pts, lens)
        bytes_f32 += pts.nbytes
        # codes + p0 + lo + sc per streamline
        bytes_u16 += pts.shape[0] * ((P - 1) * 3 * 2 + 9 * 4)
        m0 = np.asarray(streamline_metrics_stacked(pts, lens))
        m1 = np.asarray(streamline_metrics_stacked(dec, lens))
        valid = m0[STACKED_NAMES.index("valid")] > 0.5
        n_total += int(valid.sum())
        ok_row = STACKED_NAMES.index("eigen_ok")
        n_flag_f32 += int((~(m0[ok_row] > 0.5) & valid).sum())
        n_flag_q += int((~(m1[ok_row] > 0.5) & valid).sum())
        for i, k in enumerate(STACKED_NAMES):
            if k in ("valid", "eigen_ok"):
                continue
            a, b = m0[i][valid], m1[i][valid]
            fin = np.isfinite(a) & np.isfinite(b)
            # inf agreement checked separately via the gate
            rel = np.abs(b[fin] - a[fin]) / np.maximum(np.abs(a[fin]), 1e-12)
            shifts[k].append(rel)

    print(f"wire bytes: f32 {bytes_f32 / 1e6:.1f} MB -> u16-delta "
          f"{bytes_u16 / 1e6:.1f} MB ({bytes_u16 / bytes_f32:.2f}x)")
    print(f"eigen-gate flags: f32 {n_flag_f32}/{n_total} -> "
          f"quantized {n_flag_q}/{n_total} (host-f64 refinements)")
    print(f"{'metric':<18}{'max rel':>12}{'p99 rel':>12}{'median rel':>12}")
    for k, vals in shifts.items():
        if not vals:
            continue
        v = np.concatenate(vals)
        if not v.size:
            continue
        print(f"{k:<18}{v.max():>12.2e}{np.percentile(v, 99):>12.2e}"
              f"{np.median(v):>12.2e}")


if __name__ == "__main__" and not os.environ.get("TORSION_FLAG"):
    main()


def torsion_flag_analysis():
    """Calibrate a device-computable torsion certificate.

    tau = (b.db)/(|b|^2+1e-12) amplifies decode noise without bound as
    |b|^2 -> 0, so (like the eigen inf-gate) fragile rows need an exact
    host recompute from the ORIGINAL points.  The flag must be computable
    from what the device has (the DECODED points + the per-streamline
    quantization resolution), catch every row whose torsion_mean shift
    matters, and flag few rows.  Candidate predictor: the noise-to-signal
    ratio at the row's weakest point, min_i |b_i|^2 / noise_b^2 with
    noise_b ~ sc * (|v| + |a|) (first-order |d(v x a)|)."""
    import jax.numpy as jnp

    from lesionvae_tpu.ops.geometry import _masked_gradient

    @jax.jit
    def row_stats(pts, lens):
        S, P, _ = pts.shape
        n = lens.astype(jnp.float32)
        i = jnp.arange(P)
        pt_mask = i[None, :] < lens[:, None]
        v = _masked_gradient(pts, lens)
        a = _masked_gradient(v, lens)
        b = jnp.cross(v, a)
        db = _masked_gradient(b, lens)
        b2 = jnp.sum(b * b, axis=-1)
        tau = jnp.sum(b * db, axis=-1) / (b2 + 1e-12)
        ok = jnp.isfinite(tau) & pt_mask
        tmean = (jnp.where(ok, tau, 0).sum(1)
                 / jnp.maximum(ok.sum(1), 1))
        tmean = jnp.where(lens >= 4, tmean, 0.0)
        big = jnp.float32(3.4e38)
        min_b2 = jnp.min(jnp.where(pt_mask, b2, big), axis=1)
        vmag = jnp.linalg.norm(v, axis=-1)
        amag = jnp.linalg.norm(a, axis=-1)
        max_va = jnp.max(jnp.where(pt_mask, vmag + amag, 0), axis=1)
        return tmean, min_b2, max_va

    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    cfg = load_config()
    sls = []
    for g, sids in cfg.subjects_by_group().items():
        for sid in sids:
            for tp in cfg.timepoints:
                d = root / "data" / sid / tp / "bundles"
                if not d.is_dir():
                    continue
                seen = set()
                for fp in sorted(d.glob("*.vtk*")):
                    stem = fp.name.split(".vtk")[0]
                    if stem in seen:
                        continue
                    seen.add(stem)
                    try:
                        sls.extend(read_streamlines(fp, max_streamlines=100))
                    except Exception:
                        pass

    buckets = {}
    for sl in sls:
        buckets.setdefault(_bucket_P(len(sl)), []).append(sl)

    rows = []
    for P, items in sorted(buckets.items()):
        pts, lens = pad_streamlines(items, max_points=P)
        # per-streamline resolution: max over axes of the delta scale
        d = np.diff(pts, axis=1)
        seg = np.arange(P - 1)[None, :] < (lens[:, None] - 1)
        dm = np.where(seg[..., None], d, np.nan)
        sc = np.nan_to_num((np.nanmax(dm, 1) - np.nanmin(dm, 1)) / 65535.0,
                           nan=0.0).max(axis=1)
        dec = encode_decode_u16_delta(pts, lens)
        t0, _, _ = [np.asarray(x) for x in row_stats(pts, lens)]
        t1, min_b2, max_va = [np.asarray(x) for x in row_stats(dec, lens)]
        shift = np.abs(t1 - t0)
        rel = shift / np.maximum(np.abs(t0), 1e-12)
        # noise-aware predictor from device-visible quantities
        noise_b = sc * max_va
        ratio = min_b2 / np.maximum(noise_b, 1e-30) ** 2
        rows.append(np.stack([shift, rel, np.abs(t0), min_b2, ratio]))
    A = np.concatenate(rows, axis=1)
    shift, rel, t0abs, min_b2, ratio = A
    print(f"\nrows: {A.shape[1]}; torsion |shift| quantiles: "
          f"p50 {np.percentile(shift, 50):.2e} p99 "
          f"{np.percentile(shift, 99):.2e} max {shift.max():.2e}")
    print(f"torsion |tau| scale: p50 {np.percentile(t0abs, 50):.2e} "
          f"p99 {np.percentile(t0abs, 99):.2e}")
    for tol in (1e-3, 1e-4, 1e-5):
        bad = shift > tol * np.maximum(t0abs, 1e-2)  # rel w/ abs floor
        print(f"tol rel {tol:g} (abs floor 1e-2*tol): {bad.sum()} rows "
              f"exceed")
        if bad.sum():
            # what flag threshold on `ratio` catches ALL of them?
            thr = ratio[bad].max()
            print(f"  flag ratio<= {thr:.3e} -> flags "
                  f"{(ratio <= thr).sum()} rows "
                  f"({100 * (ratio <= thr).mean():.2f}%)")


if __name__ == "__main__" and os.environ.get("TORSION_FLAG"):
    torsion_flag_analysis()
    sys.exit(0)
