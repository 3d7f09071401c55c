"""Pallas TPU kernel: star-convex radius sampling (fused matmul + row-max).

The radius function r(θ,φ) = max_j <surface_j − centroid, direction_i> is the
hot op of the lesion SH stage (reference HOT LOOP #2: a 2000-iteration Python
loop of dot products, lesion_sh_heme_comprehensive.py:147-156).  The XLA path
(ops/sh.py:sample_radii) materializes a (D, N) projection block per lesion in
HBM; this kernel tiles directions over the grid and keeps each (TD, N)
projection tile in VMEM only — the max is reduced before anything leaves the
chip, so HBM traffic is exactly inputs + the (B, D) result.

Grid: (B, D/TD).  Per step: dirs tile (TD, 3) x centered points (3, N) on the
MXU, masked by the per-lesion count from SMEM, reduced with a row max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_D = 256  # directions per grid step (multiple of 8 sublanes)


def _radius_kernel(count_ref, dirs_ref, pts_ref, cen_ref, out_ref):
    # count_ref: (1, 1) SMEM; dirs_ref: (TD, 3); pts_ref: (N, 3);
    # cen_ref: (1, 3); out_ref: (1, TD)
    n = count_ref[0, 0]
    centered = pts_ref[0] - cen_ref[0, :][None, :]            # (N, 3)
    proj = jnp.dot(dirs_ref[:], centered.T,
                   preferred_element_type=jnp.float32)        # (TD, N) in VMEM
    col = jax.lax.broadcasted_iota(jnp.int32, proj.shape, 1)
    proj = jnp.where(col < n, proj, -jnp.inf)
    r = jnp.max(proj, axis=1)                                  # (TD,)
    out_ref[0, :] = jnp.where(n > 0, r, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_radii_pallas(surface: jnp.ndarray, counts: jnp.ndarray,
                        centroids: jnp.ndarray, directions: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas version of ops.sh.sample_radii.

    surface: (B, N, 3) float32 padded surface points; counts: (B,) int32;
    centroids: (B, 3); directions: (D, 3) with D a multiple of TILE_D
    (callers pad D and slice — fibonacci_sphere sizes are arbitrary).
    Returns (B, D) float32 radii.
    """
    surface = surface.astype(jnp.float32)
    centroids = centroids.astype(jnp.float32)
    directions = directions.astype(jnp.float32)
    B, N, _ = surface.shape
    D = directions.shape[0]
    assert D % TILE_D == 0, f"D={D} must be a multiple of {TILE_D}"
    counts2 = counts.astype(jnp.int32).reshape(B, 1)

    grid = (B, D // TILE_D)
    return pl.pallas_call(
        _radius_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, d: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_D, 3), lambda b, d: (d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_D), lambda b, d: (b, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=interpret,
    )(counts2, directions, surface, centroids)


def sample_radii_padded(surface, counts, centroids, directions,
                        interpret: bool = False):
    """Pad D to TILE_D, run the kernel, slice back — drop-in for
    ops.sh.sample_radii on TPU."""
    D = directions.shape[0]
    D_pad = -(-D // TILE_D) * TILE_D
    if D_pad != D:
        pad = jnp.zeros((D_pad - D, 3), directions.dtype)
        directions = jnp.concatenate([directions, pad], axis=0)
    out = sample_radii_pallas(surface, counts, centroids, directions,
                              interpret=interpret)
    return out[:, :D]
