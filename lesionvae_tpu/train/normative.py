"""Normative modeling: Sham reconstruction statistics and z-score residuals.

Reference: compute_normative_statistics (src/vae/vae_model.py:229-274) and
compute_zscore_residuals (:277-334).  The reference loops 256-row batches with
a D2H copy per batch; here each stage is a single device call (the cohorts are
small relative to HBM) with an explicit key for the reparameterization noise.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .trainer import TrainedVAE


def _reconstruct(model: TrainedVAE, X_micro, X_lesion, key) -> np.ndarray:
    Xm = jnp.nan_to_num(jnp.asarray(X_micro, jnp.float32), nan=0.0)
    Xl = jnp.nan_to_num(jnp.asarray(X_lesion, jnp.float32), nan=0.0)
    xh, _, _ = model.apply(Xm, Xl, key, train=False)
    return np.asarray(jnp.nan_to_num(xh, nan=0.0))


def compute_normative_statistics(model: TrainedVAE, X_micro_sham,
                                 X_lesion_sham, seed: int = 0
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Mean/std of Sham reconstructions per (position, feature);
    std floored at 1e-6 (vae_model.py:267-269)."""
    recon = _reconstruct(model, X_micro_sham, X_lesion_sham,
                         jax.random.PRNGKey(seed))
    mean_recon = recon.mean(axis=0)
    std_recon = np.maximum(recon.std(axis=0), 1e-6)
    return mean_recon, std_recon


def normative_zscores_fused(model: TrainedVAE, X_micro, X_lesion,
                            sham_mask: np.ndarray, seed: int = 0
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                       np.ndarray]:
    """Normative stats + z-scores as ONE device program.

    Numerically identical to compute_normative_statistics on the sham subset
    followed by compute_zscore_residuals on everything (eval-mode BatchNorm
    has no cross-row coupling, so a sham-only forward equals the sham rows of
    a full forward), but runs a single fixed-shape program — first-execution
    latency on remote-attached TPUs is paid per program.

    Returns (mean_recon, std_recon, Z, magnitude).
    """
    import jax.numpy as jnp

    Xm = jnp.nan_to_num(jnp.asarray(X_micro, jnp.float32), nan=0.0)
    Xl = jnp.nan_to_num(jnp.asarray(X_lesion, jnp.float32), nan=0.0)
    sham = jnp.asarray(sham_mask, jnp.float32)
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    module = model.module

    @jax.jit
    def run(variables, Xm, Xl, sham, k1, k2):
        # draw A: sham statistics (vae_model.py:229-274)
        xh_a, _, _ = module.apply(variables, Xm, Xl, k1, None, False)
        xh_a = jnp.nan_to_num(xh_a, nan=0.0)
        n_sham = jnp.maximum(jnp.sum(sham), 1.0)
        w = sham[:, None, None]
        mean_r = jnp.sum(xh_a * w, axis=0) / n_sham
        var_r = jnp.sum(((xh_a - mean_r) ** 2) * w, axis=0) / n_sham
        std_r = jnp.maximum(jnp.sqrt(var_r), 1e-6)
        # draw B: residual z-scores (vae_model.py:277-334)
        xh_b, _, _ = module.apply(variables, Xm, Xl, k2, None, False)
        xh_b = jnp.nan_to_num(xh_b, nan=0.0)
        z = (Xm - xh_b - mean_r[None]) / std_r[None]
        z = jnp.nan_to_num(z, nan=0.0, posinf=10.0, neginf=-10.0)
        mag = jnp.sqrt(jnp.mean(z ** 2, axis=(1, 2)))
        return mean_r, std_r, z, mag

    mean_r, std_r, z, mag = run(variables, Xm, Xl, sham,
                                jax.random.PRNGKey(seed),
                                jax.random.PRNGKey(seed + 1))
    return (np.asarray(mean_r), np.asarray(std_r), np.asarray(z),
            np.asarray(mag))


def compute_zscore_residuals(model: TrainedVAE, X_micro, X_lesion,
                             mean_recon: np.ndarray, std_recon: np.ndarray,
                             seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """z = (observed − reconstructed − normative_mean) / normative_std,
    inf→±10 / nan→0 (vae_model.py:318-326); magnitude = RMS over
    (position, feature)."""
    observed = np.nan_to_num(np.asarray(X_micro, np.float32), nan=0.0)
    recon = _reconstruct(model, X_micro, X_lesion, jax.random.PRNGKey(seed))
    residuals = observed - recon
    z = (residuals - mean_recon[None]) / std_recon[None]
    z = np.nan_to_num(z, nan=0.0, posinf=10.0, neginf=-10.0)
    magnitude = np.sqrt(np.mean(z ** 2, axis=(1, 2)))
    return z, magnitude
