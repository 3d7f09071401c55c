"""uint16 fixed-point fleet upload (train.quantize): parity pins."""

import numpy as np
import pytest

import jax.numpy as jnp

from lesionvae_tpu.train.batched import launch_many_vaes, pad_datasets
from lesionvae_tpu.train.quantize import (MAX_CODE, SENT_NAN, SENT_NINF,
                                          SENT_PINF, dequantize_u16,
                                          quantize_u16)


def test_roundtrip_precision_and_sentinels():
    rng = np.random.default_rng(0)
    X = (rng.normal(size=(3, 40, 8, 5)) * 10.0 ** rng.integers(
        -2, 3, (3, 1, 1, 5))).astype(np.float32)
    X[0, 0, 0, 0] = np.nan
    X[1, 2, 3, 1] = np.inf
    X[2, 4, 5, 2] = -np.inf
    X[:, :, :, 4] = 7.25            # constant feature: exact roundtrip
    # feature bounded far from 0 + a NaN: the fallback must range over the
    # FINITE values only, not zero-fill (review finding: zero-filling would
    # inflate this feature's quantization step ~1000x)
    X[:, :, :, 3] = 1000.0 + np.abs(X[:, :, :, 3]) % 1.0
    X[1, 1, 1, 3] = np.nan
    codes, lo, scale = quantize_u16(X)
    assert codes[0, 0, 0, 0] == SENT_NAN
    assert codes[1, 2, 3, 1] == SENT_PINF
    assert codes[2, 4, 5, 2] == SENT_NINF
    for t in range(3):
        dec = np.asarray(dequantize_u16(jnp.asarray(codes[t]),
                                        jnp.asarray(lo[t]),
                                        jnp.asarray(scale[t])))
        fin = np.isfinite(X[t])
        # max error = scale/2 per (member, feature) + decode rounding
        tol = np.broadcast_to(scale[t] * 0.5 + 1e-6, X[t].shape)
        assert (np.abs(dec[fin] - X[t][fin]) <= tol[fin] * 1.01).all()
        # far-from-zero feature keeps its ~1.5e-5 RANGE precision despite
        # the NaN routing it through the non-finite path
        assert scale[t, 0, 0, 3] < 1.0 / 65000
        assert np.isnan(dec[~np.isfinite(X[t]) & np.isnan(X[t])]).all()
        np.testing.assert_array_equal(dec[:, :, 4], 7.25)
    # relative range precision is ~1.5e-5
    assert (scale[np.isfinite(scale)] >= 0).all()
    rngspan = np.nanmax(np.where(np.isfinite(X), X, np.nan), axis=(1, 2),
                        keepdims=True) - np.nanmin(
        np.where(np.isfinite(X), X, np.nan), axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(scale, rngspan / MAX_CODE, rtol=1e-6)


def test_quantized_launch_requires_normalize():
    rng = np.random.default_rng(1)
    Xm = rng.normal(size=(2, 16, 8, 3)).astype(np.float32)
    Xl = rng.uniform(size=(2, 16, 8, 2)).astype(np.float32)
    with pytest.raises(ValueError):
        launch_many_vaes(Xm, Xl, np.full(2, 16, np.int32), latent_dim=2,
                         epochs=1, batch_size=16, quantize_upload=True)


@pytest.mark.slow
def test_quantized_upload_curve_tracks_f32_upload():
    """End-to-end: training on u16-decoded raw tensors tracks the f32-upload
    run — same normalization stats within quantization tolerance, loss curve
    inside the distributional band."""
    rng = np.random.default_rng(2)
    raw = []
    for n in (50, 40):
        xm = (rng.normal(size=(n, 16, 3)) * 5 + 1).astype(np.float32)
        xm[rng.uniform(size=xm.shape) < 0.02] = np.nan
        xl = rng.uniform(size=(n, 16, 2)).astype(np.float32)
        raw.append((xm, xl))
    Xm, Xl, n_real = pad_datasets(raw, batch_size=16)

    h32 = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=4,
                           batch_size=16, seed=5, normalize_on_device=True)
    h16 = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=4,
                           batch_size=16, seed=5, normalize_on_device=True,
                           quantize_upload=True)
    for k in ("median", "mean", "std"):
        np.testing.assert_allclose(np.asarray(h16.norm_stats_T[k]),
                                   np.asarray(h32.norm_stats_T[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    _, hist32 = h32.fetch()
    _, hist16 = h16.fetch()
    l32, l16 = hist32[:, :, 0], hist16[:, :, 0]
    assert np.isfinite(l16).all()
    rel = np.abs(l16 - l32) / np.abs(l32)
    assert rel.max() < 0.1, f"u16 upload deviates {rel.max():.3f}"


def test_native_quantizer_matches_numpy():
    """The C kernel (native/quantize.cpp) and the numpy fallback must agree
    exactly (same round-half-up formula, same sentinel codes)."""
    from lesionvae_tpu.train import quantize as q

    if q._load() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.default_rng(9)
    X = (rng.normal(size=(4, 50, 10, 7)) * 10.0 ** rng.integers(
        -3, 4, (4, 1, 1, 7))).astype(np.float32)
    X[0, 1, 2, 3] = np.nan
    X[1, 0, 0, 0] = np.inf
    X[2, 5, 5, 5] = -np.inf
    X[:, :, :, 6] = -2.5      # constant feature
    cn, lon, scn = q._quantize_native(X)
    # force the numpy path for comparison
    import unittest.mock as mock
    with mock.patch.object(q, "_quantize_native", lambda _x: None):
        cp, lop, scp = q.quantize_u16(X)
    np.testing.assert_array_equal(lon, lop)
    np.testing.assert_array_equal(scn, scp)
    # codes may differ by at most 1 at exact rounding boundaries (fp order)
    diff = np.abs(cn.astype(np.int32) - cp.astype(np.int32))
    sent = cp >= 0xFFFD
    np.testing.assert_array_equal(cn[sent], cp[sent])
    assert diff[~sent].max() <= 1
    assert (diff[~sent] > 0).mean() < 1e-3
