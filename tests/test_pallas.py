"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lesionvae_tpu.ops.pallas_radius import sample_radii_padded
from lesionvae_tpu.ops.sh import fibonacci_sphere, sample_radii


@pytest.mark.parametrize("D,N", [(256, 128), (512, 200)])
def test_radius_kernel_matches_xla(rng, D, N):
    directions, _, _ = fibonacci_sphere(D, dtype=jnp.float32)
    B = 3
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    counts = np.array([N, N // 2, 0], np.int32)
    cens = rng.normal(size=(B, 3)).astype(np.float32)

    want = np.asarray(sample_radii(jnp.asarray(pts), jnp.asarray(counts),
                                   jnp.asarray(cens), directions))
    got = np.asarray(sample_radii_padded(jnp.asarray(pts), jnp.asarray(counts),
                                         jnp.asarray(cens), directions,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_radius_kernel_non_tile_multiple(rng):
    """D=2000 (the reference's sample count) is not a TILE_D multiple."""
    directions, _, _ = fibonacci_sphere(2000, dtype=jnp.float32)
    pts = rng.normal(size=(2, 64, 3)).astype(np.float32)
    counts = np.array([64, 10], np.int32)
    cens = np.zeros((2, 3), np.float32)
    got = np.asarray(sample_radii_padded(jnp.asarray(pts), jnp.asarray(counts),
                                         jnp.asarray(cens), directions,
                                         interpret=True))
    want = np.asarray(sample_radii(jnp.asarray(pts), jnp.asarray(counts),
                                   jnp.asarray(cens), directions))
    assert got.shape == (2, 2000)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
