"""u16 delta codec for the geometry upload (ops.geo_codec): parity pins.

The codec ships 0.55x the point bytes; its measured metric shifts
(benchmarks/geo_codec_probe.py, full bench cohort) are p99 <= 3e-4 for
every column except torsion, which the pipeline REPLACES with a
reference-exact host f64 recompute from the original points.  These tests
pin: native/numpy encoder agreement, decode accuracy, torsion_f64 against
the reference formula, and the end-to-end u16d pipeline against the f32
pipeline (exact inf/valid agreement, banded value agreement, exact-f64
torsion).
"""

import numpy as np
import pytest

from lesionvae_tpu.ops import geo_codec
from lesionvae_tpu.ops.padding import pad_streamlines


def _bundle(rng, n_sl=40, pmin=8, pmax=60):
    out = []
    for _ in range(n_sl):
        P = int(rng.integers(pmin, pmax))
        t = np.linspace(0, 1, P)
        base = rng.normal(size=3) * 5
        dirv = rng.normal(size=3)
        sl = base + t[:, None] * dirv * 10
        sl += 0.5 * np.sin(2 * np.pi * t[:, None]
                           * rng.uniform(0.5, 2, 3) + rng.uniform(0, 6, 3))
        out.append(sl.astype(np.float32))
    return out


def test_encoder_native_matches_numpy():
    rng = np.random.default_rng(0)
    pts, lens = pad_streamlines(_bundle(rng), max_points=64)
    native = geo_codec.encode_u16_delta(pts, lens)
    assert geo_codec._load() is not None, "native codec must build in CI"
    # force the numpy fallback
    lib, geo_codec._lib = geo_codec._lib, None
    tried, geo_codec._lib_tried = geo_codec._lib_tried, True
    try:
        fallback = geo_codec.encode_u16_delta(pts, lens)
    finally:
        geo_codec._lib, geo_codec._lib_tried = lib, tried
    for a, b in zip(native, fallback):
        np.testing.assert_array_equal(a, b)


def test_decode_position_accuracy():
    """Decoded positions stay within a few quantization steps of the
    originals (codes are per-(row, axis) affine; cumsum errors random-walk)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    pts, lens = pad_streamlines(_bundle(rng), max_points=64)
    codes, p0, lo, sc = geo_codec.encode_u16_delta(pts, lens)
    dec = np.asarray(geo_codec.decode_points(
        jnp.asarray(codes), jnp.asarray(p0), jnp.asarray(lo),
        jnp.asarray(sc), jnp.asarray(lens)))
    P = pts.shape[1]
    mask = (np.arange(P)[None, :] < lens[:, None])[..., None]
    err = np.abs(np.where(mask, dec - pts, 0.0))
    # sc ~ delta-range/65535; allow a sqrt(P)-walk of half-steps
    bound = sc.max(axis=1)[:, None, None] * (0.5 * np.sqrt(P) + 1.0)
    assert (err <= bound + 1e-6).all(), float(err.max())
    assert err.max() < 1e-2  # absolute sanity on ~10mm-scale curves


def test_torsion_f64_matches_reference_formula():
    rng = np.random.default_rng(2)
    bundle = _bundle(rng, n_sl=12)
    pts, lens = pad_streamlines(bundle, max_points=64)
    got = geo_codec.torsion_f64(pts, lens)
    for i, sl in enumerate(bundle):
        x = sl.astype(np.float64)
        v = np.gradient(x, axis=0)
        a = np.gradient(v, axis=0)
        b = np.cross(v, a)
        db = np.gradient(b, axis=0)
        tau = np.einsum("ij,ij->i", b, db) / (
            np.einsum("ij,ij->i", b, b) + 1e-12)
        tau = tau[np.isfinite(tau)]
        want = tau.mean() if len(sl) >= 4 and tau.size else 0.0
        np.testing.assert_allclose(got[i], want, rtol=1e-12, atol=1e-15)
    # short streamline -> 0 (reference: torsion needs >= 4 points)
    pts3, lens3 = pad_streamlines([_bundle(rng, n_sl=1, pmin=3, pmax=4)[0][:3]],
                                  max_points=32)
    assert geo_codec.torsion_f64(pts3, lens3)[0] == 0.0


def test_torsion_native_matches_numpy_fallback():
    rng = np.random.default_rng(3)
    pts, lens = pad_streamlines(_bundle(rng, n_sl=10), max_points=64)
    native = geo_codec.torsion_f64(pts, lens)
    lib, geo_codec._lib = geo_codec._lib, None
    tried, geo_codec._lib_tried = geo_codec._lib_tried, True
    try:
        fallback = geo_codec.torsion_f64(pts, lens)
    finally:
        geo_codec._lib, geo_codec._lib_tried = lib, tried
    np.testing.assert_allclose(native, fallback, rtol=1e-12, atol=1e-15)


def test_pipeline_u16d_matches_f32():
    """End-to-end launch_bundle_metrics: u16d vs f32 on random bundles.

    valid/inf verdicts identical; torsion EXACT vs the f64 reference
    formula (better than the f32 device value); other metrics inside the
    probe-measured bands."""
    from lesionvae_tpu.ops.geometry import STACKED_NAMES
    from lesionvae_tpu.pipeline.geometry_run import launch_bundle_metrics

    rng = np.random.default_rng(4)
    bundles = [_bundle(rng, n_sl=30) for _ in range(3)]
    # add a degenerate straight line (inf eigen ratios) to pin the gate
    line = np.stack([np.linspace(0, 1, 20)] * 3, axis=1).astype(np.float32)
    bundles[0].append(line)

    s_f32 = launch_bundle_metrics(bundles, upload="f32")()
    s_u16 = launch_bundle_metrics(bundles, upload="u16d")()
    assert len(s_f32) == len(s_u16) == 3
    for a, b in zip(s_f32, s_u16):
        assert a["n_streamlines"] == b["n_streamlines"]
        for k in a:
            va, vb = a[k], b[k]
            if k == "n_streamlines":
                continue
            if np.isinf(va) or np.isinf(vb):
                assert np.isinf(va) and np.isinf(vb), (k, va, vb)
                continue
            if k == "torsion_mean_avg":
                # host f64 vs device f32: inside the f32 path's own error
                np.testing.assert_allclose(vb, va, rtol=5e-4, atol=1e-7,
                                           err_msg=k)
            else:
                # probe-measured bundle-level bands (per-streamline p99
                # 3e-4; bundle means average lower, keep headroom)
                np.testing.assert_allclose(vb, va, rtol=2e-3, atol=1e-6,
                                           err_msg=k)


def test_pipeline_rejects_unknown_codec():
    from lesionvae_tpu.pipeline.geometry_run import launch_bundle_metrics
    with pytest.raises(ValueError, match="codec"):
        launch_bundle_metrics([], upload="zstd")
