"""SH ops tests: scipy oracle parity for the real SH basis, least-squares fit
equivalence, spectrum properties on closed-form shapes."""

import numpy as np
import pytest

import jax.numpy as jnp

from lesionvae_tpu.ops import sh as sh_ops


def scipy_real_sh(l, m, theta, phi):
    """Reference semantics: scipy sph_harm(m, l, phi, theta) then Re/Im x sqrt2
    (lesion_sh_heme_comprehensive.py:159-168)."""
    import scipy.special as sp
    if hasattr(sp, "sph_harm_y"):
        # sph_harm(m, l, azimuth, polar) == sph_harm_y(l, m, polar, azimuth)
        Y = sp.sph_harm_y(l, m, theta, phi)
    else:
        Y = sp.sph_harm(m, l, phi, theta)
    if m < 0:
        return np.imag(Y) * np.sqrt(2)
    elif m > 0:
        return np.real(Y) * np.sqrt(2)
    return np.real(Y)


def test_fibonacci_sphere_matches_reference_formula():
    directions, theta, phi = sh_ops.fibonacci_sphere(500)
    directions, theta, phi = map(np.asarray, (directions, theta, phi))
    i = np.arange(500)
    gr = (1 + 5 ** 0.5) / 2
    np.testing.assert_allclose(theta, np.arccos(1 - 2 * (i + 0.5) / 500),
                               rtol=1e-12)
    np.testing.assert_allclose(phi, 2 * np.pi * i / gr, rtol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(directions, axis=1), 1.0,
                               rtol=1e-12)


@pytest.mark.parametrize("max_l", [4, 6, 8])
def test_real_sh_basis_matches_scipy(max_l):
    rng = np.random.default_rng(0)
    theta = rng.uniform(0.01, np.pi - 0.01, 200)
    phi = rng.uniform(0, 2 * np.pi, 200)
    A = np.asarray(sh_ops.real_sh_basis(jnp.asarray(theta), jnp.asarray(phi),
                                        max_l))
    for j, (l, m) in enumerate(sh_ops.sh_index_list(max_l)):
        want = scipy_real_sh(l, m, theta, phi)
        np.testing.assert_allclose(A[:, j], want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"(l={l}, m={m})")


def test_sh_fit_matches_scipy_lstsq():
    """Normal-equation fit == scipy lsq_linear (unbounded) == numpy lstsq."""
    from scipy.optimize import lsq_linear
    max_l, D = 6, 2000
    _, theta, phi, A, chol = sh_ops.cached_basis(max_l, D)
    A_np = np.asarray(A)
    rng = np.random.default_rng(1)
    # smooth synthetic radius functions
    radii = (1.0 + 0.3 * np.cos(np.asarray(theta))[None, :] ** 2
             + 0.1 * rng.normal(size=(3, D)))
    out = sh_ops.sh_fit_batch(jnp.asarray(radii), A, chol, max_l=max_l)
    coeffs = np.asarray(out["coeffs"])
    for b in range(radii.shape[0]):
        ref = lsq_linear(A_np, radii[b]).x
        np.testing.assert_allclose(coeffs[b], ref, rtol=1e-6, atol=1e-9)
        ls = np.linalg.lstsq(A_np, radii[b], rcond=None)[0]
        np.testing.assert_allclose(coeffs[b], ls, rtol=1e-6, atol=1e-9)


def test_sphere_spectrum_is_pure_P0():
    """Unit sphere: all power in l=0, reconstruction_r undefined-free."""
    max_l, D = 6, 2000
    _, theta, phi, A, chol = sh_ops.cached_basis(max_l, D)
    radii = jnp.ones((1, D), jnp.float64)
    out = sh_ops.sh_fit_batch(radii, A, chol, max_l=max_l)
    P = np.asarray(out["P_norm"])[0]
    assert P[0] > 0.999999
    np.testing.assert_allclose(P.sum(), 1.0, rtol=1e-9)
    # c0_0 of a unit sphere: r = c * Y00 = c/sqrt(4π) → c = sqrt(4π)
    np.testing.assert_allclose(float(out["c_l0"][0, 0]), np.sqrt(4 * np.pi),
                               rtol=1e-6)


def test_ellipsoid_spectrum_has_even_power():
    """Axis-aligned ellipsoid radius: power only in even l, dominated by P0+P2."""
    max_l, D = 6, 2000
    _, theta, phi, A, chol = sh_ops.cached_basis(max_l, D)
    ct = np.cos(np.asarray(theta))
    a, c = 1.0, 1.5
    r = a * c / np.sqrt(c ** 2 * (1 - ct ** 2) + a ** 2 * ct ** 2)
    out = sh_ops.sh_fit_batch(jnp.asarray(r[None, :]), A, chol, max_l=max_l)
    P = np.asarray(out["P_norm"])[0]
    assert P[0] + P[2] > 0.999
    assert P[1] < 1e-6 and P[3] < 1e-6  # odd degrees vanish by symmetry
    assert float(out["reconstruction_r"][0]) > 0.999


def test_sample_radii_masked_max():
    rng = np.random.default_rng(2)
    directions, _, _ = sh_ops.fibonacci_sphere(64)
    pts = rng.normal(size=(2, 50, 3))
    counts = np.array([50, 10], np.int32)
    cens = rng.normal(size=(2, 3))
    got = np.asarray(sh_ops.sample_radii(
        jnp.asarray(pts), jnp.asarray(counts), jnp.asarray(cens),
        directions))
    d_np = np.asarray(directions)
    for b, n in enumerate(counts):
        centered = pts[b, :n] - cens[b]
        want = (centered @ d_np.T).max(axis=0)
        np.testing.assert_allclose(got[b], want, rtol=1e-10)


def test_sample_radii_zero_count():
    directions, _, _ = sh_ops.fibonacci_sphere(16)
    pts = np.zeros((1, 4, 3))
    got = np.asarray(sh_ops.sample_radii(
        jnp.asarray(pts), jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.zeros((1, 3))), directions))
    np.testing.assert_array_equal(got, 0.0)
