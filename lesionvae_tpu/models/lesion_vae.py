"""Lesion-conditioned dual-pathway 1-D convolutional VAE (flax).

Architecture mirrors the reference exactly (src/vae/vae_model.py:17-121):
- micro encoder: Conv1d(13→64→128→128, k=5, p=2) + BatchNorm + ReLU +
  AvgPool/2 after each block → flatten 128·(L/8)
- lesion encoder: Conv1d(3→32→64) ×2 blocks → flatten 64·(L/4)
- concat → fc_mu / fc_logv → latent (default 10)
- decoder: Linear(latent + lesion_ctx → 128·(L/8)) → [ConvT+BN+ReLU+Up×2] ×2
  → ConvT(→13) + Up×2 → linear resize to L

Differences by design (TPU-first, numerics preserved):
- tensors are channel-last (N, L, C) so the feature axis lands on TPU lanes;
- every layer takes a batch-row mask so the fully-jitted trainer can pad the
  final partial batch without polluting BatchNorm statistics;
- reparameterization noise comes from an explicit jax.random key (the
  reference's torch.randn_like at vae_model.py:100 is unseeded).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (Conv1d, ConvTranspose1d, Dense, MaskedBatchNorm,
                     avg_pool_half, interp_linear, upsample2_linear)


class LesionConditionedVAE(nn.Module):
    seq_len: int = 100
    micro_ch: int = 13
    lesion_ch: int = 3
    latent: int = 10
    # computation dtype for conv/dense (None = follow inputs); params and
    # BatchNorm statistics stay float32 — pass jnp.bfloat16 for the TPU
    # mixed-precision fast path (~2.7x per training step)
    compute_dtype: Optional[type] = None
    # mesh axis for cross-shard BatchNorm statistics under explicit
    # shard_map data parallelism (parallel/sharded.py)
    axis_name: Optional[str] = None

    def setup(self):
        L = self.seq_len
        dt = self.compute_dtype
        ax = self.axis_name
        self.micro_out = 128 * (L // 8)
        self.lesion_out = 64 * (L // 4)

        self.micro_c1 = Conv1d(64, dtype=dt)
        self.micro_b1 = MaskedBatchNorm(64, axis_name=ax)
        self.micro_c2 = Conv1d(128, dtype=dt)
        self.micro_b2 = MaskedBatchNorm(128, axis_name=ax)
        self.micro_c3 = Conv1d(128, dtype=dt)
        self.micro_b3 = MaskedBatchNorm(128, axis_name=ax)

        self.lesion_c1 = Conv1d(32, dtype=dt)
        self.lesion_b1 = MaskedBatchNorm(32, axis_name=ax)
        self.lesion_c2 = Conv1d(64, dtype=dt)
        self.lesion_b2 = MaskedBatchNorm(64, axis_name=ax)

        self.fc_mu = Dense(self.latent, dtype=dt)
        self.fc_logv = Dense(self.latent, dtype=dt)
        self.fc_dec = Dense(self.micro_out, dtype=dt)

        self.dec_t1 = ConvTranspose1d(64, dtype=dt)
        self.dec_b1 = MaskedBatchNorm(64, axis_name=ax)
        self.dec_t2 = ConvTranspose1d(64, dtype=dt)
        self.dec_b2 = MaskedBatchNorm(64, axis_name=ax)
        self.dec_t3 = ConvTranspose1d(self.micro_ch, dtype=dt)

    # ------------------------------------------------------------------
    def encode_microstructure(self, x, mask, train):
        h = avg_pool_half(nn.relu(self.micro_b1(self.micro_c1(x), mask, train)))
        h = avg_pool_half(nn.relu(self.micro_b2(self.micro_c2(h), mask, train)))
        h = avg_pool_half(nn.relu(self.micro_b3(self.micro_c3(h), mask, train)))
        return h.reshape(h.shape[0], -1)          # (N, (L/8)*128), l-major

    def encode_lesion(self, x, mask, train):
        h = avg_pool_half(nn.relu(self.lesion_b1(self.lesion_c1(x), mask, train)))
        h = avg_pool_half(nn.relu(self.lesion_b2(self.lesion_c2(h), mask, train)))
        return h.reshape(h.shape[0], -1)          # (N, (L/4)*64)

    def encode(self, x_micro, x_lesion, mask=None, train=False):
        if self.compute_dtype is not None:
            x_micro = x_micro.astype(self.compute_dtype)
            x_lesion = x_lesion.astype(self.compute_dtype)
        h_micro = self.encode_microstructure(x_micro, mask, train)
        h_lesion = self.encode_lesion(x_lesion, mask, train)
        h = jnp.concatenate([h_micro, h_lesion], axis=1)
        return self.fc_mu(h), self.fc_logv(h), h_lesion

    @staticmethod
    def reparam(rng, mu, logv):
        std = jnp.exp(0.5 * logv)
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return mu + eps * std

    def decode(self, z, h_lesion, mask=None, train=False):
        h = jnp.concatenate([z, h_lesion], axis=1)
        h = self.fc_dec(h)
        h = h.reshape(h.shape[0], self.seq_len // 8, 128)   # (N, L/8, 128)
        h = upsample2_linear(nn.relu(self.dec_b1(self.dec_t1(h), mask, train)))
        h = upsample2_linear(nn.relu(self.dec_b2(self.dec_t2(h), mask, train)))
        h = upsample2_linear(self.dec_t3(h))
        if h.shape[1] != self.seq_len:                      # vae_model.py:112-113
            h = interp_linear(h, self.seq_len)
        return h                                            # (N, L, micro_ch)

    def __call__(self, x_micro, x_lesion, rng, mask=None, train=False,
                 eps=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        mu, logv, h_lesion = self.encode(x_micro, x_lesion, mask, train)
        if eps is not None:
            # explicit noise (sharded execution passes pre-drawn eps so a
            # sharded step is bit-comparable to the single-device step)
            z = mu + eps.astype(mu.dtype) * jnp.exp(0.5 * logv)
        else:
            z = self.reparam(rng, mu, logv)
        xh = self.decode(z, h_lesion, mask, train)
        return xh, mu, logv
