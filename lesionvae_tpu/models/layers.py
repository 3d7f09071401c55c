"""Torch-semantics layers for the lesion VAE, channel-last for TPU.

The reference model (src/vae/vae_model.py:17-121) is built from Conv1d /
BatchNorm1d / AvgPool1d / ConvTranspose1d / linear Upsample.  We keep tensors
channel-LAST ((N, L, C) — feature dim on the TPU lane axis) instead of
torch's (N, C, L), and add a batch-row mask so padded rows in the fully-jitted
training loop never contaminate batch statistics (SURVEY.md §7 hard part #2).

``MaskedBatchNorm`` reproduces torch BatchNorm1d exactly: biased batch
variance for normalization, unbiased variance in the running-stat update,
momentum 0.1, eps 1e-5.  ``interp_linear`` reproduces
``F.interpolate(mode="linear", align_corners=False)`` including edge clamping
(used by Upsample at vae_model.py:63-70 and the final resize at :112-113).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_init(fan_in: int):
    """torch Linear/Conv default init: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in)
    for both weight and bias — used so training curves are distributionally
    comparable to the reference."""
    bound = 1.0 / math.sqrt(fan_in)
    return _uniform_init(bound), _uniform_init(bound)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (N, L) per channel with a validity mask on N.

    Statistics and normalization always run in float32 regardless of the
    compute dtype (standard TPU mixed-precision recipe); the output is cast
    back to the input dtype.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    # mesh axis to psum batch statistics over (explicit shard_map data
    # parallelism; None under single-device or GSPMD execution)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 train: bool) -> jnp.ndarray:
        # x: (N, L, C); mask: (N,) in {0, 1} or None
        out_dtype = x.dtype
        stat_dtype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
        x32 = x.astype(stat_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        # explicit float32 param dtype: the default initializer dtype follows
        # jnp.float_, which is float64 when x64 is enabled and would silently
        # promote the whole forward pass
        gamma = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)

        if train:
            if mask is None:
                m = jnp.ones((x.shape[0], 1, 1), stat_dtype)
            else:
                m = mask[:, None, None].astype(stat_dtype)
            cnt = jnp.sum(m) * x.shape[1]
            s1 = jnp.sum(x32 * m, axis=(0, 1))
            if self.axis_name is not None:
                # cross-shard batch statistics: identical to single-device
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            s2 = jnp.sum(((x32 - mean) ** 2) * m, axis=(0, 1))
            if self.axis_name is not None:
                s2 = jax.lax.psum(s2, self.axis_name)
            var = s2 / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        if out_dtype == jnp.bfloat16:
            # mixed precision: fold mean/var/affine into one per-channel
            # scale+shift (computed in f32, applied in bf16) — avoids
            # materializing f32 activations and the bf16↔f32 relayouts
            # around every BN, which dominated the bf16 fleet step.  Only
            # the rounding inside the affine differs from the exact form;
            # the f32 path below keeps the reference-exact formula.
            a = gamma / jnp.sqrt(var + self.eps)
            b = beta - mean * a
            return x * a.astype(out_dtype) + b.astype(out_dtype)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        return (y * gamma + beta).astype(out_dtype)


def avg_pool_half(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool1d(kernel=2, stride=2), floor mode — drops an odd tail element
    exactly like torch (25 → 12 in the micro encoder, vae_model.py:40).

    Implemented as reshape + mean, NOT strided slices: ``x[:, 0::2]`` under
    vmap lowers to a gather, which XLA turns into a serial L/2-iteration
    while loop (and a scatter loop in the backward pass) — measured at ~20%
    of the whole fleet training step before this change."""
    L = (x.shape[1] // 2) * 2
    x = x[:, :L]
    pairs = x.reshape(x.shape[0], L // 2, 2, x.shape[2])
    # sum-reduce (not slice+add): the backward of a reduction is a cheap
    # broadcast, where slicing cotangents lower to pad+add fusions with
    # layout round-trips
    return 0.5 * jnp.sum(pairs, axis=2)


@functools.lru_cache(maxsize=32)
def _interp_matrix(L_in: int, out_size: int, dtype_name: str):
    """(out_size, L_in) linear-interpolation matrix, torch
    align_corners=False semantics: src(i) = (i + 0.5)·L_in/L_out − 0.5,
    clamped; each row holds the (1−w, w) pair.

    Returns a NUMPY array (cached): caching a jax array created inside a
    trace would leak tracers into later traces."""
    import numpy as _np
    src = (_np.arange(out_size) + 0.5) * (L_in / out_size) - 0.5
    src = _np.clip(src, 0.0, L_in - 1.0)
    lo = _np.floor(src).astype(int)
    hi = _np.minimum(lo + 1, L_in - 1)
    w = src - lo
    W = _np.zeros((out_size, L_in))
    _np.add.at(W, (_np.arange(out_size), lo), 1.0 - w)
    _np.add.at(W, (_np.arange(out_size), hi), w)
    return _np.asarray(W, dtype=jnp.dtype(dtype_name))


def interp_linear(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Linear resize along axis 1 (torch align_corners=False), computed as a
    matmul against a constant interpolation matrix — gathers lower poorly on
    TPU; a tiny dense matmul rides the MXU instead."""
    W = _interp_matrix(x.shape[1], out_size, x.dtype.name)
    return jnp.einsum("ol,blc->boc", W, x)


def upsample2_linear(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='linear', align_corners=False)."""
    return interp_linear(x, 2 * x.shape[1])


class Conv1d(nn.Module):
    """Conv1d(kernel=5, padding=2) torch-equivalent, channel-last.

    ``dtype``: computation dtype (None = promote from inputs/params); params
    stay float32 under mixed precision."""

    features: int
    kernel: int = 5
    padding: int = 2
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w_init, b_init = torch_linear_init(x.shape[-1] * self.kernel)
        return nn.Conv(self.features, kernel_size=(self.kernel,),
                       padding=[(self.padding, self.padding)],
                       use_bias=True, kernel_init=w_init, bias_init=b_init,
                       dtype=self.dtype, name="conv")(x)


class ConvTranspose1d(nn.Module):
    """ConvTranspose1d(kernel=5, stride=1, padding=2).

    With stride 1 this is exactly a regular convolution with the kernel
    flipped and padding (kernel-1-padding); we implement it as nn.Conv
    (weight-copy parity with torch handles the flip, tests/test_vae_parity).
    torch computes ConvTranspose fan_in from weight dim 1 = out_channels.
    """

    features: int
    kernel: int = 5
    padding: int = 2
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w_init, b_init = torch_linear_init(self.features * self.kernel)
        eff = self.kernel - 1 - self.padding
        return nn.Conv(self.features, kernel_size=(self.kernel,),
                       padding=[(eff, eff)], use_bias=True,
                       kernel_init=w_init, bias_init=b_init,
                       dtype=self.dtype, name="conv")(x)


class Dense(nn.Module):
    """Linear layer with torch default init."""

    features: int
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w_init, b_init = torch_linear_init(x.shape[-1])
        return nn.Dense(self.features, kernel_init=w_init, bias_init=b_init,
                        dtype=self.dtype, name="dense")(x)
