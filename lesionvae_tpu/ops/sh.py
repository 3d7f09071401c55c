"""Spherical-harmonic lesion shape descriptors — TPU compute path.

The reference builds a (2000, 49) SH design matrix via 49 scipy
``sph_harm`` evaluations and solves with ``lsq_linear`` per lesion
(src/lesion/lesion_sh_heme_comprehensive.py:159-223), and samples the radius
function with a 2000-iteration Python loop of dot products (:147-156, HOT
LOOP #2 of SURVEY.md §3.2).  Here:

- the real SH basis is computed scipy-free in JAX via associated-Legendre
  recurrences, matching ``scipy.special.sph_harm`` + the reference's Re/Im×√2
  real conversion (:159-168) to ~1e-6 (SURVEY.md §7 hard part #4);
- radius sampling is one (D, 3) x (3, N) matmul + masked row-max per lesion;
- the least-squares fit uses normal equations with a single Cholesky
  factorization of the (K, K) Gram matrix shared by every lesion in the
  cohort — the whole cohort solves in one batched dispatch.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fibonacci_sphere(num_samples: int = 2000,
                     dtype=jnp.float64) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Golden-ratio spiral directions — exact reference formulas
    (lesion_sh_heme_comprehensive.py:98-114)."""
    golden_ratio = (1 + 5 ** 0.5) / 2
    i = jnp.arange(num_samples, dtype=dtype)
    theta = jnp.arccos(1 - 2 * (i + 0.5) / num_samples)   # polar
    phi = 2 * jnp.pi * i / golden_ratio                   # azimuth
    st, ct = jnp.sin(theta), jnp.cos(theta)
    directions = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=1)
    return directions, theta, phi


def sh_index_list(max_l: int):
    """(l, m) order of the design-matrix columns: l ascending, m from -l to l
    (lesion_sh_heme_comprehensive.py:176-180)."""
    return [(l, m) for l in range(max_l + 1) for m in range(-l, l + 1)]


def _legendre_all(ct: jnp.ndarray, max_l: int) -> Dict[Tuple[int, int], jnp.ndarray]:
    """Associated Legendre P_l^m(ct) for 0<=m<=l<=max_l, with the
    Condon-Shortley phase (matching scipy's lpmv, hence sph_harm)."""
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    P: Dict[Tuple[int, int], jnp.ndarray] = {}
    P[(0, 0)] = jnp.ones_like(ct)
    for m in range(1, max_l + 1):
        # P_m^m = (-1)^m (2m-1)!! (1-x^2)^{m/2}
        P[(m, m)] = -(2 * m - 1) * st * P[(m - 1, m - 1)]
    for m in range(0, max_l):
        P[(m + 1, m)] = (2 * m + 1) * ct * P[(m, m)]
    for m in range(0, max_l + 1):
        for l in range(m + 2, max_l + 1):
            P[(l, m)] = ((2 * l - 1) * ct * P[(l - 1, m)]
                         - (l + m - 1) * P[(l - 2, m)]) / (l - m)
    return P


def real_sh_basis(theta: jnp.ndarray, phi: jnp.ndarray, max_l: int = 6) -> jnp.ndarray:
    """Real SH design matrix, shape (len(theta), (max_l+1)^2).

    Column (l, m) equals the reference's ``compute_spherical_harmonic``
    (lesion_sh_heme_comprehensive.py:159-168):
      m = 0 : Re(Y_l^0)            = N_l0 P_l(cos θ)
      m > 0 : Re(Y_l^m)  · sqrt(2) = sqrt(2) N_lm P_l^m(cos θ) cos(mφ)
      m < 0 : Im(Y_l^m)  · sqrt(2) = (-1)^{k+1} sqrt(2) N_lk P_l^k(cos θ) sin(kφ),
              k = |m|  (scipy evaluates Y at negative order; the (-1)^{k+1}
              comes from P_l^{-k} = (-1)^k (l-k)!/(l+k)! P_l^k).
    """
    ct = jnp.cos(theta)
    P = _legendre_all(ct, max_l)
    cols = []
    for l, m in sh_index_list(max_l):
        k = abs(m)
        # N_lk = sqrt((2l+1)/(4π) (l-k)!/(l+k)!)
        norm = np.sqrt((2 * l + 1) / (4 * np.pi)
                       * float(math.factorial(l - k))
                       / float(math.factorial(l + k)))
        base = norm * P[(l, k)]
        if m == 0:
            cols.append(base)
        elif m > 0:
            cols.append(np.sqrt(2.0) * base * jnp.cos(k * phi))
        else:
            cols.append(((-1.0) ** (k + 1)) * np.sqrt(2.0) * base * jnp.sin(k * phi))
    return jnp.stack(cols, axis=1)


@functools.lru_cache(maxsize=8)
def cached_basis(max_l: int, num_samples: int, x64: bool = True):
    """Host-cached (directions, theta, phi, basis, cho_factor(AtA))."""
    dtype = jnp.float64 if x64 else jnp.float32
    directions, theta, phi = fibonacci_sphere(num_samples, dtype=dtype)
    A = real_sh_basis(theta, phi, max_l).astype(dtype)
    AtA = A.T @ A
    chol_c, _lower = jax.scipy.linalg.cho_factor(AtA)  # lower=False
    return directions, theta, phi, A, chol_c


def sample_radii(surface: jnp.ndarray, counts: jnp.ndarray,
                 centroids: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Star-convex radius function r(θ,φ) for a batch of lesions.

    surface: (B, N, 3) padded surface points (pad rows arbitrary),
    counts: (B,), centroids: (B, 3), directions: (D, 3).
    Returns (B, D): max projection per direction — the matmul + masked
    row-max replacement for the reference's per-direction loop (:147-156).
    Runs as a sequential ``lax.map`` over lesions to bound memory at
    (D, N) per step while keeping a single fused dispatch.
    """
    neg = jnp.asarray(-jnp.inf, surface.dtype)
    N = surface.shape[1]

    def one(args):
        pts, cnt, cen = args
        centered = pts - cen[None, :]
        proj = directions @ centered.T               # (D, N) — MXU matmul
        mask = jnp.arange(N) < cnt
        proj = jnp.where(mask[None, :], proj, neg)
        r = jnp.max(proj, axis=1)
        return jnp.where(cnt > 0, r, 0.0)

    return jax.lax.map(one, (surface, counts, centroids))


@functools.partial(jax.jit, static_argnames=("max_l",))
def sh_fit_batch(radii: jnp.ndarray, basis: jnp.ndarray, chol_c,
                 max_l: int = 6) -> Dict[str, jnp.ndarray]:
    """Batched SH fit + spectra + reconstruction quality.

    radii: (B, D) scale-normalized radius functions; basis: (D, K);
    chol_c: upper Cholesky factor of basisᵀ basis (shared across the batch).
    Returns coeffs (B, K), raw powers (B, L+1), normalized powers,
    reconstruction (B, D) and its Pearson r vs the input (reference
    computes these at :190-223, :433-434).
    """
    Atb = basis.T @ radii.T                                    # (K, B)
    coeffs = jax.scipy.linalg.cho_solve((chol_c, False), Atb).T  # (B, K)

    powers = []
    idx = 0
    for l in range(max_l + 1):
        width = 2 * l + 1
        powers.append(jnp.sum(coeffs[:, idx:idx + width] ** 2, axis=1))
        idx += width
    P_raw = jnp.stack(powers, axis=1)                  # (B, L+1)
    total = jnp.sum(P_raw, axis=1, keepdims=True)
    P_norm = jnp.where(total > 0, P_raw / total, P_raw)  # normalize_powers(:204-210)

    recon = coeffs @ basis.T                           # (B, D)

    # reconstruction quality: Pearson r(radii, recon) (:433-434)
    def _pearson(x, y):
        xm = x - jnp.mean(x, axis=1, keepdims=True)
        ym = y - jnp.mean(y, axis=1, keepdims=True)
        num = jnp.sum(xm * ym, axis=1)
        den = jnp.sqrt(jnp.sum(xm ** 2, axis=1) * jnp.sum(ym ** 2, axis=1))
        return num / den

    r = _pearson(radii, recon)

    # axisymmetric coefficients c_l^0 (column index l^2 + l) (:427-430)
    c_l0 = jnp.stack([coeffs[:, l * l + l] for l in range(max_l + 1)], axis=1)

    return {"coeffs": coeffs, "P_raw": P_raw, "P_norm": P_norm,
            "recon": recon, "reconstruction_r": r, "c_l0": c_l0}


@functools.partial(jax.jit, static_argnames=("max_l",))
def sh_fit_batch_packed(radii: jnp.ndarray, basis: jnp.ndarray, chol_c,
                        max_l: int = 6) -> jnp.ndarray:
    """sh_fit_batch packed into ONE (B, K + 3·(L+1) + 1) array for a single
    device→host transfer (remote-attached TPUs pay per-buffer latency).
    Column layout: [coeffs | P_raw | P_norm | c_l0 | reconstruction_r]."""
    out = sh_fit_batch(radii, basis, chol_c, max_l=max_l)
    return jnp.concatenate([
        out["coeffs"], out["P_raw"], out["P_norm"], out["c_l0"],
        out["reconstruction_r"][:, None]], axis=1)


def unpack_sh_fit(packed: np.ndarray, max_l: int) -> Dict[str, np.ndarray]:
    K = (max_l + 1) ** 2
    L1 = max_l + 1
    i0, i1, i2, i3 = K, K + L1, K + 2 * L1, K + 3 * L1
    return {"coeffs": packed[:, :K], "P_raw": packed[:, i0:i1],
            "P_norm": packed[:, i1:i2], "c_l0": packed[:, i2:i3],
            "reconstruction_r": packed[:, i3]}


def reconstruct_surface(coeffs: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """Radius reconstruction from coefficients (reference :213-223)."""
    return coeffs @ basis.T
