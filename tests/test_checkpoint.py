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
    # deliberately non-standard keys AND shapes: save_vae accepts arbitrary
    # Dict[str, ndarray]; the restore template comes from recorded metadata
    norm = {"median": np.zeros(3, np.float32), "mean": np.ones(3, np.float32),
            "std": np.full(3, 2.0, np.float32),
            "per_position_scale": np.arange(16 * 3, dtype=np.float64
                                            ).reshape(16, 3)}
    save_vae(tmp_path / "ckpt", model, norm)

    restored, norm2 = load_vae(tmp_path / "ckpt")
    key = jax.random.PRNGKey(1)
    xh1, mu1, _ = model.apply(Xm, Xl, key)
    xh2, mu2, _ = restored.apply(Xm, Xl, key)
    np.testing.assert_allclose(np.asarray(xh1), np.asarray(xh2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)
    assert norm2 is not None and set(norm2) == set(norm)
    for k in norm:
        np.testing.assert_allclose(norm2[k], norm[k])
        assert norm2[k].dtype == norm[k].dtype


def test_vae_checkpoint_without_norm_stats(tmp_path):
    rng = np.random.default_rng(1)
    Xm = rng.normal(size=(20, 16, 3)).astype(np.float32)
    Xl = rng.uniform(size=(20, 16, 2)).astype(np.float32)
    model, _ = train_lesion_vae(Xm, Xl, latent_dim=2, epochs=1, batch_size=10,
                                seed=0)
    save_vae(tmp_path / "ckpt", model)
    restored, norm2 = load_vae(tmp_path / "ckpt")
    assert norm2 is None
    key = jax.random.PRNGKey(2)
    xh1, _, _ = model.apply(Xm, Xl, key)
    xh2, _, _ = restored.apply(Xm, Xl, key)
    np.testing.assert_allclose(np.asarray(xh1), np.asarray(xh2), atol=1e-6)
