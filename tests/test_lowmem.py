"""bf16-storage fleet fast path (train.lowmem): parity pins.

1. On all-f32 trees the lowmem optimizer is EXACTLY make_optimizer (same
   fused formulas, the casts are no-ops) — pinned bitwise.
2. bf16 storage (weights + moments, f32 math) tracks the f32-storage
   training curve within the same distributional band the bf16 COMPUTE
   recipe uses (test_mixed_precision.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lesionvae_tpu.train.batched import train_many_vaes
from lesionvae_tpu.train.lowmem import LowmemOptimizer, cast_params_storage
from lesionvae_tpu.train.trainer import make_optimizer


def _tree(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return {
        "fc_dec": {"dense": {"kernel": jnp.asarray(
            rng.normal(size=(40, 30)) * 0.02, dtype),
            "bias": jnp.asarray(rng.normal(size=30) * 0.02, dtype)}},
        "micro_b1": {"scale": jnp.ones(8, jnp.float32),
                     "bias": jnp.zeros(8, jnp.float32)},
    }


def test_lowmem_optimizer_exact_on_f32():
    """On all-f32 trees SR is the identity and the step must be bitwise
    identical to the fused make_optimizer chain."""
    params = _tree(0)
    grads = jax.tree.map(lambda p: 0.1 * p + 0.01, params)
    tx_ref = make_optimizer(2e-4, 1e-3, 2.0)
    tx_low = LowmemOptimizer(2e-4, 1e-3, 2.0)
    o_ref = tx_ref.init(params)
    o_low = tx_low.init(params)
    p_ref, p_low = params, params
    for i in range(5):
        g = jax.tree.map(lambda x: x * (1.0 + 0.3 * i), grads)
        u_ref, o_ref = tx_ref.update(g, o_ref, p_ref)
        p_ref = jax.tree.map(lambda p, u: p + u, p_ref, u_ref)
        p_low, o_low = tx_low.step(g, o_low, p_low)
    for (ka, a), (_kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_ref)[0],
            jax.tree_util.tree_flatten_with_path(p_low)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_stochastic_round_unbiased():
    """SR of a value exactly between two bf16 neighbors must split ~50/50
    and average to the true value; SR of a representable value is exact."""
    from lesionvae_tpu.train.lowmem import _hash_bits, _store_round
    import jax.numpy as jnp

    # bf16 has 8 significand bits -> ulp(1.0) = 2^-7; the midpoint between
    # 1.0 and the next bf16 is 1 + 2^-8, the quarter point 1 + 2^-9
    mid = jnp.full((100000,), 1.0 + 2.0 ** -8, jnp.float32)
    quarter = jnp.full((100000,), 1.0 + 2.0 ** -9, jnp.float32)
    bits = _hash_bits(mid.shape, jnp.uint32(123))
    r = np.asarray(_store_round(mid, bits, jnp.bfloat16), np.float32)
    frac_hi = (r > 1.0).mean()
    assert 0.49 < frac_hi < 0.51, frac_hi
    np.testing.assert_allclose(r.mean(), 1.0 + 2.0 ** -8, rtol=3e-5)
    rq = np.asarray(_store_round(quarter, bits, jnp.bfloat16), np.float32)
    assert 0.24 < (rq > 1.0).mean() < 0.26
    np.testing.assert_allclose(rq.mean(), 1.0 + 2.0 ** -9, rtol=6e-5)
    exact = jnp.full((1000,), 1.0, jnp.float32)   # representable: exact
    r2 = np.asarray(_store_round(exact, bits[:1000], jnp.bfloat16))
    assert (r2 == 1.0).all()


def test_cast_params_storage_selects_weight_leaves():
    params = _tree(1)
    cast = cast_params_storage(params, jnp.bfloat16)
    assert cast["fc_dec"]["dense"]["kernel"].dtype == jnp.bfloat16
    assert cast["fc_dec"]["dense"]["bias"].dtype == jnp.bfloat16
    # BatchNorm affine stays f32 (sensitive + tiny)
    assert cast["micro_b1"]["scale"].dtype == jnp.float32
    assert cast["micro_b1"]["bias"].dtype == jnp.float32


def test_flat_optimizer_matches_per_leaf_on_f32():
    """FlatLowmemOptimizer (flatten_partition buffers) must reproduce the
    per-leaf LowmemOptimizer step on f32 trees to reduction-order tolerance
    (the global grad-norm sums 2 concatenated buffers vs ~4 per-leaf
    partials; everything else is elementwise-identical)."""
    from lesionvae_tpu.train.lowmem import (FlatLowmemOptimizer,
                                            flatten_partition)
    params = _tree(2)
    tx_leaf = LowmemOptimizer(2e-4, 1e-3, 2.0)
    tx_flat = FlatLowmemOptimizer(2e-4, 1e-3, 2.0)
    fw, fo, unflat = flatten_partition(params)
    pp = (fw, fo)
    o_leaf = tx_leaf.init(params)
    o_flat = tx_flat.init(pp)
    p_leaf = params
    for i in range(4):
        g_tree = jax.tree.map(lambda p: 0.1 * p + 0.01 * (i + 1), p_leaf)
        gw, go, _ = flatten_partition(g_tree)
        p_leaf, o_leaf = tx_leaf.step(g_tree, o_leaf, p_leaf)
        pp, o_flat = tx_flat.step((gw, go), o_flat, pp)
    rebuilt = unflat(*pp)
    for (ka, a), (_kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_leaf)[0],
            jax.tree_util.tree_flatten_with_path(rebuilt)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8, err_msg=str(ka))


def test_flatten_partition_roundtrip():
    """unflatten(flatten(params)) reproduces the tree exactly, weight
    leaves in fw, the rest in fo."""
    from lesionvae_tpu.train.lowmem import flatten_partition
    params = cast_params_storage(_tree(3), jnp.bfloat16)
    fw, fo, unflat = flatten_partition(params)
    assert fw.dtype == jnp.bfloat16 and fw.ndim == 1
    assert fo.dtype == jnp.float32 and fo.ndim == 1
    assert fw.size == 40 * 30 + 30 and fo.size == 16
    rebuilt = unflat(fw, fo)
    for (ka, a), (_kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(rebuilt)[0]):
        assert a.dtype == b.dtype, ka
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32),
                                      err_msg=str(ka))


def _data(T=2, n_pad=64, L=32, Cm=5, Cl=3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, L)
    base = np.sin(2 * np.pi * t)[None, None, :, None]
    Xm = (base + 0.2 * rng.normal(size=(T, n_pad, L, Cm))).astype(np.float32)
    Xl = rng.uniform(size=(T, n_pad, L, Cl)).astype(np.float32)
    n_real = np.full(T, 60, np.int32)
    return Xm, Xl, n_real


@pytest.mark.slow
def test_bf16_storage_curve_tracks_f32_storage():
    Xm, Xl, n_real = _data()
    _, hist32 = train_many_vaes(Xm, Xl, n_real, latent_dim=3, epochs=6,
                                batch_size=32, seed=3,
                                compute_dtype=jnp.bfloat16)
    _, hist16 = train_many_vaes(Xm, Xl, n_real, latent_dim=3, epochs=6,
                                batch_size=32, seed=3,
                                compute_dtype=jnp.bfloat16,
                                store_dtype=jnp.bfloat16)
    l32 = hist32[:, :, 0]
    l16 = hist16[:, :, 0]
    assert np.isfinite(l16).all()
    assert (l16[:, -1] < l16[:, 0]).all()
    rel = np.abs(l16 - l32) / np.abs(l32)
    assert rel.max() < 0.1, f"bf16-storage deviates {rel.max():.3f}"


@pytest.mark.slow
def test_flat_opt_curve_tracks_per_leaf():
    """The flat-buffer optimizer variant (measured slower in production,
    kept opt-in — see train.lowmem) must remain numerically sound: its
    training curve tracks the per-leaf bf16-storage path distributionally
    (the SR noise streams differ by construction)."""
    Xm, Xl, n_real = _data()
    _, h_leaf = train_many_vaes(Xm, Xl, n_real, latent_dim=3, epochs=6,
                                batch_size=32, seed=3,
                                compute_dtype=jnp.bfloat16,
                                store_dtype=jnp.bfloat16)
    _, h_flat = train_many_vaes(Xm, Xl, n_real, latent_dim=3, epochs=6,
                                batch_size=32, seed=3,
                                compute_dtype=jnp.bfloat16,
                                store_dtype=jnp.bfloat16, flat_opt=True)
    lf = h_flat[:, :, 0]
    assert np.isfinite(lf).all()
    assert (lf[:, -1] < lf[:, 0]).all()
    rel = np.abs(lf - h_leaf[:, :, 0]) / np.abs(h_leaf[:, :, 0])
    assert rel.max() < 0.1, f"flat_opt deviates {rel.max():.3f}"
