"""bf16 mixed-precision fleet training tracks the f32 curve."""

import numpy as np

import jax.numpy as jnp

from lesionvae_tpu.train.batched import train_many_vaes

import pytest  # noqa: F811

pytestmark = pytest.mark.slow  # full-matrix run: pytest -m slow


def _data(T=2, n_pad=64, L=32, Cm=5, Cl=3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, L)
    base = np.sin(2 * np.pi * t)[None, None, :, None]
    Xm = (base + 0.2 * rng.normal(size=(T, n_pad, L, Cm))).astype(np.float32)
    Xl = rng.uniform(size=(T, n_pad, L, Cl)).astype(np.float32)
    n_real = np.full(T, 60, np.int32)
    return Xm, Xl, n_real


def test_bf16_curve_tracks_f32():
    Xm, Xl, n_real = _data()
    _, hist32 = train_many_vaes(Xm, Xl, n_real, latent_dim=3, epochs=6,
                                batch_size=32, seed=3)
    _, hist16 = train_many_vaes(Xm, Xl, n_real, latent_dim=3, epochs=6,
                                batch_size=32, seed=3,
                                compute_dtype=jnp.bfloat16)
    l32 = hist32[:, :, 0]   # (T, epochs) loss
    l16 = hist16[:, :, 0]
    assert np.isfinite(l16).all()
    # both converge and stay within a tight relative band of each other
    assert (l16[:, -1] < l16[:, 0]).all()
    rel = np.abs(l16 - l32) / np.abs(l32)
    assert rel.max() < 0.1, f"bf16 deviates {rel.max():.3f} from f32"
