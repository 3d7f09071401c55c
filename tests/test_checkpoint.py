"""Orbax checkpoint round-trip for trained VAEs."""

import numpy as np

import jax

from lesionvae_tpu.train.checkpoint import load_vae, save_vae
from lesionvae_tpu.train.trainer import train_lesion_vae


def test_vae_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    Xm = rng.normal(size=(40, 16, 3)).astype(np.float32)
    Xl = rng.uniform(size=(40, 16, 2)).astype(np.float32)
    model, _ = train_lesion_vae(Xm, Xl, latent_dim=2, epochs=2, batch_size=16,
                                seed=0)
    norm = {"median": np.zeros(3, np.float32), "mean": np.ones(3, np.float32),
            "std": np.full(3, 2.0, np.float32)}
    save_vae(tmp_path / "ckpt", model, norm)

    restored, norm2 = load_vae(tmp_path / "ckpt")
    key = jax.random.PRNGKey(1)
    xh1, mu1, _ = model.apply(Xm, Xl, key)
    xh2, mu2, _ = restored.apply(Xm, Xl, key)
    np.testing.assert_allclose(np.asarray(xh1), np.asarray(xh2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)
    if norm2 is not None:
        np.testing.assert_allclose(norm2["std"], norm["std"])
