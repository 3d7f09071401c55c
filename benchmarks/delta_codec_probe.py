"""Probe: is a u8 delta codec viable for the fleet upload?

The fleet's raw tensors are the biggest wire item (~197 MB as u16 on the
7-40 MB/s remote link).  If profiles are smooth along the 100-node tract
axis, first differences have a much smaller range than the absolute values,
and an error-feedback u8 delta code (node 0 absolute u16 + 99 u8 deltas,
device-side cumsum decode) would ship ~50.5% of the u16 bytes at
delta_range/255 absolute precision.

This probe measures, on the real bench cohort:
  - per-feature delta-range / abs-range ratio (the codec's win factor)
  - the worst-case z-score shift an error-feedback u8 delta code would
    introduce (vs the u16 codec's measured shift)
It prints numbers; it changes nothing.  Run AFTER any bench finishes (one
jax process per host).
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402
from lesionvae_tpu.train.batched import pad_datasets  # noqa: E402


def encode_delta_u8_ef(X):
    """Error-feedback u8 delta encode one (T, n, L, C) block.

    Returns the reconstruction (what the device would decode) so the probe
    can measure end-metric error without writing the device decoder yet.
    """
    T, n, L, C = X.shape
    lo = X.min(axis=(1, 2), keepdims=True)
    hi = X.max(axis=(1, 2), keepdims=True)
    # node-0 absolute u16
    s0 = ((hi - lo) / 65535.0)
    s0 = np.where(s0 > 0, s0, 1.0)
    rec = np.empty_like(X)
    rec[:, :, 0] = (
        lo + np.rint((X[:, :, 0:1] - lo) / s0) * s0)[:, :, 0]
    # delta scale per (member, feature) over true first differences
    d = np.diff(X, axis=2)
    dmax = np.abs(d).max(axis=(1, 2), keepdims=True)
    sd = np.where(dmax > 0, dmax / 127.0, 1.0)[:, :, 0]  # (T,1,C)
    for k in range(1, L):
        want = X[:, :, k] - rec[:, :, k - 1]          # error feedback
        code = np.clip(np.rint(want / sd), -127, 127)
        rec[:, :, k] = rec[:, :, k - 1] + code * sd
    return rec, float(np.mean(dmax / np.maximum(hi - lo, 1e-30)))


def per_feature_table(name, X):
    """VERDICT r4 #5: the all-or-nothing probe rejected delta-u8 because ONE
    feature binds (z-shift 1.06e-2) — measure each feature separately so a
    MIXED codec (u8 for the delta-safe features, u16 for the rest) can be
    accepted or rejected per-feature.  Prints max z-shift per feature and
    the mixed-codec wire math for the u8-safe subset (threshold 1e-4 — the
    band the u16 codec itself achieves, 5.0e-5 measured)."""
    T, n, L, C = X.shape
    rec, _ = encode_delta_u8_ef(X)
    err = np.abs(rec - X)
    std = np.maximum(X.std(axis=(1, 2), keepdims=True), 1e-30)
    z = err / std                                     # (T, n, L, C)
    safe = []
    print(f"{name}: per-feature delta-u8 z-shift "
          f"(u8-safe threshold 1e-4):")
    for c in range(C):
        zmax = float(z[..., c].max())
        zp99 = float(np.percentile(z[..., c], 99))
        ok = zmax <= 1e-4
        safe.append(ok)
        print(f"  [{c:2d}] max {zmax:.2e}  p99 {zp99:.2e}  "
              f"{'u8-SAFE' if ok else 'u16'}")
    k = sum(safe)
    u8d_frac = (2.0 + (L - 1) * 1.0) / (2.0 * L)      # u8-delta/u16 bytes
    mb_u16 = X.size * 2 / 1e6
    mb_mixed = mb_u16 * ((C - k) / C + (k / C) * u8d_frac)
    print(f"{name}: {k}/{C} features u8-safe -> mixed codec "
          f"{mb_u16:.1f} MB u16 vs {mb_mixed:.1f} MB mixed "
          f"(saves {mb_u16 - mb_mixed:.1f} MB)")
    return safe, mb_u16 - mb_mixed


def main():
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    cfg = bench.setup_cohort(root)
    tensor_list, _ = bench.fast_profile_tensors(root, cfg)
    Xm, Xl, n_real = pad_datasets(
        [(xm, xl) for _, xm, xl, _, _ in tensor_list], batch_size=64)
    for name, X in (("Xm", Xm), ("Xl", Xl)):
        rec, ratio = encode_delta_u8_ef(X)
        err = rec - X
        rng = (X.max(axis=(1, 2), keepdims=True)
               - X.min(axis=(1, 2), keepdims=True))
        rel = np.abs(err) / np.maximum(rng, 1e-30)
        std = X.std(axis=(1, 2), keepdims=True)
        zshift = np.abs(err) / np.maximum(std, 1e-30)
        print(f"{name}: delta/abs range ratio {ratio:.3f}  "
              f"max rel err {rel.max():.2e}  mean {rel.mean():.2e}  "
              f"max z-shift {zshift.max():.2e}  p99 {np.percentile(zshift, 99):.2e}")
    u16 = 2.0
    u8d = (2.0 + (Xm.shape[2] - 1) * 1.0) / Xm.shape[2]
    print(f"bytes/elem: u16 {u16:.2f} -> delta-u8 {u8d:.3f} "
          f"({u8d / u16:.1%} of u16 wire)")
    total_saved = 0.0
    for name, X in (("Xm", Xm), ("Xl", Xl)):
        _, saved = per_feature_table(name, X)
        total_saved += saved
    print(f"mixed-codec total saving: {total_saved:.1f} MB "
          f"(u16 fleet wire {((Xm.size + Xl.size) * 2) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
