"""Pallas TPU kernel: star-convex radius sampling (fused matmul + row-max).

The radius function r(θ,φ) = max_j <surface_j − centroid, direction_i> is the
hot op of the lesion SH stage (reference HOT LOOP #2: a 2000-iteration Python
loop of dot products, lesion_sh_heme_comprehensive.py:147-156).  The XLA path
(ops/sh.py:sample_radii) materializes a (D, N) projection block per lesion in
HBM; this kernel keeps each (TD, N) projection tile in VMEM only — the max is
reduced before anything leaves the chip, so HBM traffic is exactly inputs +
the (B, D) result.

Grid: (B/LB, D/TD), LB = 8 lesions per step (sublane tiling), TD = 256
directions per step.  Per step: LB sequential (TD, 3) x (3, N) MXU matmuls
with masked row-max reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_D = 256   # directions per grid step (multiple of 128 lanes)
LB = 8         # lesions per grid step (sublane tile)


def _radius_kernel(count_ref, dirs_ref, pts_ref, out_ref):
    # count_ref: (B, 1) SMEM (whole array); dirs_ref: (TD, 3);
    # pts_ref: (LB, 3, N) pre-centered; out_ref: (LB, TD)
    b0 = pl.program_id(0) * LB
    N = pts_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (dirs_ref.shape[0], N), 1)

    def body(i, _):
        # fori_loop (not an unrolled range) so the (TD, N) projection tile is
        # a single reused VMEM buffer, not LB live copies
        n = count_ref[b0 + i, 0]
        pts = pts_ref[i]                                      # (3, N)
        proj = jnp.dot(dirs_ref[:], pts,
                       preferred_element_type=jnp.float32)    # (TD, N) VMEM
        proj = jnp.where(col < n, proj, -jnp.inf)
        r = jnp.max(proj, axis=1)
        out_ref[i, :] = jnp.where(n > 0, r, 0.0)
        return 0

    jax.lax.fori_loop(0, LB, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_radii_pallas(surface: jnp.ndarray, counts: jnp.ndarray,
                        centroids: jnp.ndarray, directions: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas version of ops.sh.sample_radii.

    surface: (B, N, 3) float32 padded surface points with B % LB == 0;
    counts: (B,) int32; centroids: (B, 3); directions: (D, 3) with
    D % TILE_D == 0 (use sample_radii_padded for arbitrary B/D).
    Returns (B, D) float32 radii.
    """
    surface = surface.astype(jnp.float32)
    centroids = centroids.astype(jnp.float32)
    directions = directions.astype(jnp.float32)
    B, N, _ = surface.shape
    D = directions.shape[0]
    assert D % TILE_D == 0 and B % LB == 0
    counts2 = counts.astype(jnp.int32).reshape(B, 1)
    # (B, 3, N) layout: N on the 128-lane axis — (N, 3) blocks would pad the
    # 3-wide trailing dim to 128 lanes and blow VMEM by 42x
    centered = jnp.swapaxes(surface - centroids[:, None, :], 1, 2)

    grid = (B // LB, D // TILE_D)
    return pl.pallas_call(
        _radius_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_D, 3), lambda b, d: (d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, 3, N), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LB, TILE_D), lambda b, d: (b, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=interpret,
    )(counts2, directions, centered)


def sample_radii_padded(surface, counts, centroids, directions,
                        interpret: bool = False):
    """Pad B to LB and D to TILE_D, run the kernel, slice back — drop-in for
    ops.sh.sample_radii on TPU."""
    B = surface.shape[0]
    D = directions.shape[0]
    B_pad = -(-B // LB) * LB
    D_pad = -(-D // TILE_D) * TILE_D
    if D_pad != D:
        directions = jnp.concatenate(
            [directions, jnp.zeros((D_pad - D, 3), directions.dtype)], axis=0)
    if B_pad != B:
        surface = jnp.concatenate(
            [surface, jnp.zeros((B_pad - B,) + surface.shape[1:],
                                surface.dtype)], axis=0)
        counts = jnp.concatenate(
            [counts, jnp.zeros(B_pad - B, counts.dtype)], axis=0)
        centroids = jnp.concatenate(
            [centroids, jnp.zeros((B_pad - B, 3), centroids.dtype)], axis=0)
    out = sample_radii_pallas(surface, counts, centroids, directions,
                              interpret=interpret)
    return out[:B, :D]
