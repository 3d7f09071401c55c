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
