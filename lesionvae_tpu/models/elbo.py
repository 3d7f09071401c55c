"""ELBO with the reference's exact reduction semantics (SURVEY.md §7 #2).

- reconstruction: MSE with *mean* reduction over every tensor element
  (vae_model.py:126)
- KL: −½·mean(1 + logv − μ² − e^logv) — a mean over ALL elements (batch x
  latent), NOT a per-sample sum (vae_model.py:127; parity-critical)
- β anneals linearly 0.1 → 2.0 over epochs (vae_model.py:135-137)

The masked variants reduce over valid rows only, so a padded partial batch
yields bit-identical losses to an unpadded one.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def beta_schedule(epoch, total):
    """KLD weight annealing (vae_model.py:135-137); epoch is 0-based."""
    if isinstance(total, int) and total <= 1:
        return 1.0
    return 0.1 + 1.9 * (epoch / (total - 1))


def elbo(xh: jnp.ndarray, x: jnp.ndarray, mu: jnp.ndarray, logv: jnp.ndarray,
         beta=1.0, mask: Optional[jnp.ndarray] = None
         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (loss, recon, kld); all scalars.

    With ``mask`` (shape (N,), 1 = real row), means run over valid rows only.
    """
    if mask is None:
        recon = jnp.mean((xh - x) ** 2)
        kld = -0.5 * jnp.mean(1 + logv - mu ** 2 - jnp.exp(logv))
    else:
        m = mask.astype(xh.dtype)
        per_elem = x[0].size  # L*C per row
        denom_x = jnp.maximum(jnp.sum(m) * per_elem, 1.0)
        recon = jnp.sum(((xh - x) ** 2) * m[:, None, None]) / denom_x
        denom_z = jnp.maximum(jnp.sum(m) * mu.shape[1], 1.0)
        kld = -0.5 * jnp.sum(
            (1 + logv - mu ** 2 - jnp.exp(logv)) * m[:, None]) / denom_z
    return recon + beta * kld, recon, kld
