"""Batched, masked streamline geometry metrics — the TPU replacement for the
reference's per-streamline Python loop (tract_geom_proc.py:31-187).

Design: instead of looping over streamlines and calling 17 metric helpers per
curve (HOT LOOP #1, SURVEY.md §3.1), the entire bundle is one dense
``(S, P, 3)`` tensor; all 17 metrics are computed in a single fused, jitted
function whose every reduction is mask-exact for ragged lengths.  XLA fuses
the elementwise chains; the only matmul-shaped work (3x3 covariances) uses a
closed-form symmetric eigensolver so no per-item LAPACK calls are dispatched.

Numerical semantics replicated from the reference (file:line cited per
metric below); notably:
- derivatives are ``np.gradient`` central differences with one-sided edges
  (tract_geom_proc.py:48-51), reproduced mask-aware;
- ``elongation_ratio``/``planarity_ratio`` return +inf when denominators are
  <= 1e-12 (tract_geom_proc.py:126-136) — reproduced, not "fixed";
- covariance uses ddof=1 like ``np.cov`` (tract_geom_proc.py:122);
- streamlines with arc length <= 1e-8 are flagged invalid so callers can drop
  them (tract_geom_proc.py:159-161).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

METRIC_NAMES = (
    "length", "end_to_end", "tortuosity", "straightness",
    "curv_mean", "curv_std", "curv_energy", "torsion_mean",
    "bend_angle_mean", "bbox_vol", "elongation_ratio", "planarity_ratio",
    "anisotropy_ratio", "centroid_x", "centroid_y", "centroid_z",
    "ang_dispersion",
)


def _masked_gradient(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """np.gradient(axis=-2) over the first ``n`` rows of each padded curve.

    x: (..., P, 3); n: (...,) valid lengths.  Matches numpy exactly:
    one-sided differences at rows 0 and n-1, central elsewhere
    (tract_geom_proc.py:48-51 uses np.gradient twice for v and a).

    Implemented with static shifts + elementwise selects — no gather ops,
    which lower poorly on TPU.
    """
    P = x.shape[-2]
    i = jnp.arange(P)
    n_ = n[..., None]                                  # (..., 1)
    # static shifts (edge rows replicate — corrected by the selects below)
    x_next = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    x_prev = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    central = (x_next - x_prev) * jnp.asarray(0.5, x.dtype)
    fwd = x_next - x                                    # one-sided at i=0
    bwd = x - x_prev                                    # one-sided at i=n-1
    is_first = (i == 0)
    is_last = (i[None] == (n_ - 1)) | (i[None] >= P - 1)
    sel_last = jnp.where(is_last[..., None], bwd,
                         central)
    out = jnp.where(jnp.broadcast_to(is_first[:, None], sel_last.shape),
                    fwd, sel_last)
    return out


def _eigh3_trig(C: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (trigonometric) eigenvalues of symmetric 3x3 matrices,
    descending.  ~20 elementwise ops — far faster than XLA's iterative Eigh
    on TPU; accuracy ~sqrt(eps)·‖C‖ for near-degenerate spectra."""
    a00, a11, a22 = C[..., 0, 0], C[..., 1, 1], C[..., 2, 2]
    a01, a02, a12 = C[..., 0, 1], C[..., 0, 2], C[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)
    b00, b11, b22 = (a00 - q) / safe_p, (a11 - q) / safe_p, (a22 - q) / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    eigs = jnp.stack([e1, e2, e3], axis=-1)
    return jnp.where((p2 <= 0)[..., None], q[..., None] * jnp.ones(3, C.dtype),
                     eigs)


def _eigh3_descending(C: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of batched symmetric 3x3 matrices, sorted descending
    (λ1 ≥ λ2 ≥ λ3).  The reference calls np.linalg.eigh per curve
    (tract_geom_proc.py:119-124).

    float64 (CPU parity path): one batched XLA Eigh call — LAPACK-grade
    accuracy so the reference's 1e-12 inf-threshold
    (tract_geom_proc.py:126-136) resolves identically to numpy.
    float32 (TPU path): closed-form trig solver — in f32 the iterative Eigh
    is no more accurate at the 1e-12 threshold (f32 eigen-noise is ~1e-6·λ1
    for either method) and is ~100x slower on TPU."""
    if C.dtype == jnp.float64:
        return jnp.linalg.eigvalsh(C)[..., ::-1]
    return _eigh3_trig(C)


def _msum(x, mask, axis):
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis)


def _mmean(x, mask, axis):
    cnt = jnp.sum(mask, axis=axis)
    return _msum(x, mask, axis) / jnp.maximum(cnt, 1)


@functools.partial(jax.jit, static_argnames=("dtype",))
def streamline_metrics(points: jnp.ndarray, lengths: jnp.ndarray,
                       dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """All 17 per-streamline metrics for a padded bundle.

    Args:
      points:  (S, P, 3) padded streamline coordinates.
      lengths: (S,) valid point counts (each >= 3 per the reader contract,
               tract_geom_proc.py:21).
    Returns:
      dict of (S,) arrays for every METRIC_NAMES entry, plus ``valid``
      (bool: arc length > 1e-8, tract_geom_proc.py:159-161).
    """
    x = points.astype(dtype)
    S, P, _ = x.shape
    n = lengths.astype(jnp.int32)                     # (S,)
    i = jnp.arange(P)
    pt_mask = (i[None, :] < n[:, None])               # (S, P) valid points
    seg_mask = (i[None, :] < (n - 1)[:, None])[:, : P - 1]  # (S, P-1) segments
    seg_maskf = seg_mask.astype(dtype)
    pt_maskf = pt_mask.astype(dtype)
    nf = n.astype(dtype)

    eps = jnp.asarray(1e-8, dtype)
    tiny = jnp.asarray(1e-12, dtype)

    # --- segment differences -------------------------------------------------
    d = x[:, 1:, :] - x[:, :-1, :]                    # (S, P-1, 3)
    seg_len = jnp.linalg.norm(d, axis=-1)             # (S, P-1)

    # length / end_to_end / tortuosity / straightness (tract_geom_proc.py:31-46)
    L = _msum(seg_len, seg_mask, axis=1)
    last = jnp.take_along_axis(x, (n - 1)[:, None, None].astype(jnp.int32)
                               * jnp.ones((1, 1, 3), jnp.int32), axis=1)[:, 0]
    e2e = jnp.linalg.norm(last - x[:, 0, :], axis=-1)
    tortuosity = L / jnp.maximum(e2e, eps)
    straightness = e2e / jnp.maximum(L, eps)

    # --- derivatives (np.gradient semantics) ---------------------------------
    v = _masked_gradient(x, n)                        # (S, P, 3)
    a = _masked_gradient(v, n)
    cross = jnp.cross(v, a)
    cross_mag = jnp.linalg.norm(cross, axis=-1)       # (S, P)
    v_mag = jnp.linalg.norm(v, axis=-1) + tiny

    # curvature mean/std: reference filters non-finite kappa then takes
    # mean/std with ddof=0 (tract_geom_proc.py:53-71)
    kappa = cross_mag / (v_mag ** 3)
    kappa_ok = jnp.isfinite(kappa) & pt_mask
    k_cnt = jnp.maximum(jnp.sum(kappa_ok, axis=1), 1)
    k_mean = _msum(kappa, kappa_ok, axis=1) / k_cnt
    k_var = _msum((kappa - k_mean[:, None]) ** 2, kappa_ok, axis=1) / k_cnt
    curv_mean = jnp.where(n >= 3, k_mean, 0.0)
    curv_std = jnp.where(n >= 3, jnp.sqrt(jnp.maximum(k_var, 0.0)), 0.0)

    # curvature energy: sum kappa[:m]^2 * ds[:m], m = n-1, kappa nan->0
    # (tract_geom_proc.py:73-83)
    ds = seg_len + tiny
    kap_nan0 = jnp.where(jnp.isfinite(kappa), kappa, 0.0)
    curv_energy = _msum((kap_nan0[:, : P - 1] ** 2) * ds, seg_mask, axis=1)
    curv_energy = jnp.where(n >= 3, curv_energy, 0.0)

    # torsion: tau = (b . db)/(|b|^2 + 1e-12), finite-filtered mean; 0 if n<4
    # (tract_geom_proc.py:85-96)
    b = cross
    db = _masked_gradient(b, n)
    tau = jnp.sum(b * db, axis=-1) / (jnp.sum(b * b, axis=-1) + tiny)
    tau_ok = jnp.isfinite(tau) & pt_mask
    tau_mean = _msum(tau, tau_ok, axis=1) / jnp.maximum(jnp.sum(tau_ok, axis=1), 1)
    torsion = jnp.where(n >= 4, tau_mean, 0.0)

    # bending angle: mean |arccos(clip(t_i . t_{i+1}))| over n-2 pairs
    # (tract_geom_proc.py:98-106)
    t_hat = d / (seg_len[..., None] + tiny)           # (S, P-1, 3)
    cosines = jnp.sum(t_hat[:, :-1, :] * t_hat[:, 1:, :], axis=-1)  # (S, P-2)
    pair_mask = (i[None, : P - 2] < (n - 2)[:, None])
    angles = jnp.arccos(jnp.clip(cosines, -1.0, 1.0))
    bend = _mmean(jnp.abs(angles), pair_mask, axis=1)
    bend = jnp.where(n >= 3, bend, 0.0)

    # bbox volume (tract_geom_proc.py:114-117)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    xmax = jnp.max(jnp.where(pt_mask[..., None], x, -big), axis=1)
    xmin = jnp.min(jnp.where(pt_mask[..., None], x, big), axis=1)
    bbox_vol = jnp.prod(xmax - xmin, axis=-1)

    # centroid (tract_geom_proc.py:111-112)
    centroid = _msum(x, pt_mask[..., None], axis=1) / nf[:, None]

    # PCA eigenvalues of the 3x3 covariance, ddof=1 (tract_geom_proc.py:119-141)
    xc = jnp.where(pt_mask[..., None], x - centroid[:, None, :], 0.0)
    C = jnp.einsum("spi,spj->sij", xc, xc) / jnp.maximum(nf - 1.0, 1.0)[:, None, None]
    eigs = _eigh3_descending(C)
    lam1, lam2, lam3 = eigs[:, 0], eigs[:, 1], eigs[:, 2]
    inf = jnp.asarray(jnp.inf, dtype)
    elongation = jnp.where(lam2 <= tiny, inf, lam1 / lam2)
    planarity = jnp.where(lam3 <= tiny, inf, lam2 / lam3)
    anisotropy = lam1 / (lam1 + lam2 + lam3 + tiny)

    # angular dispersion: var of unit tangents (tract_geom_proc.py:143-148)
    mean_t = _mmean(t_hat, seg_mask[..., None], axis=1)     # (S, 3)
    dev = jnp.sum((t_hat - mean_t[:, None, :]) ** 2, axis=-1)
    ang_disp = _mmean(dev, seg_mask, axis=1)

    return {
        "length": L,
        "end_to_end": e2e,
        "tortuosity": tortuosity,
        "straightness": straightness,
        "curv_mean": curv_mean,
        "curv_std": curv_std,
        "curv_energy": curv_energy,
        "torsion_mean": torsion,
        "bend_angle_mean": bend,
        "bbox_vol": bbox_vol,
        "elongation_ratio": elongation,
        "planarity_ratio": planarity,
        "anisotropy_ratio": anisotropy,
        "centroid_x": centroid[:, 0],
        "centroid_y": centroid[:, 1],
        "centroid_z": centroid[:, 2],
        "ang_dispersion": ang_disp,
        "valid": L > eps,
    }


STACKED_NAMES = (*METRIC_NAMES, "valid")


@functools.partial(jax.jit, static_argnames=("dtype",))
def streamline_metrics_stacked(points: jnp.ndarray, lengths: jnp.ndarray,
                               dtype=jnp.float32) -> jnp.ndarray:
    """All metrics as ONE stacked (18, S) array (rows follow STACKED_NAMES,
    ``valid`` as 0/1 float).  A single device→host transfer per call — small
    per-buffer transfers are expensive on remote-attached TPUs."""
    m = streamline_metrics(points, lengths, dtype=dtype)
    return jnp.stack([m[k].astype(dtype) if k != "valid"
                      else m[k].astype(dtype) for k in STACKED_NAMES])


def unstack_metrics(stacked: np.ndarray) -> Dict[str, np.ndarray]:
    out = {k: np.asarray(stacked[i]) for i, k in enumerate(STACKED_NAMES)}
    out["valid"] = out["valid"] > 0.5
    return out


# Bundle-summary quantities and their source metric (tract_geom_proc.py:195-210)
BUNDLE_SUMMARY = (
    ("length_mean", "length"),
    ("tortuosity_mean", "tortuosity"),
    ("curv_mean_avg", "curv_mean"),
    ("curv_energy_mean", "curv_energy"),
    ("torsion_mean_avg", "torsion_mean"),
    ("bend_angle_mean_avg", "bend_angle_mean"),
    ("elongation_ratio_mean", "elongation_ratio"),
    ("planarity_ratio_mean", "planarity_ratio"),
    ("anisotropy_ratio_mean", "anisotropy_ratio"),
    ("ang_dispersion_mean", "ang_dispersion"),
    ("centroid_x_mean", "centroid_x"),
    ("centroid_y_mean", "centroid_y"),
    ("centroid_z_mean", "centroid_z"),
)


def bundle_summary(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Bundle-level nanmean summary over valid streamlines — matches
    _safe_mean (tract_geom_proc.py:192-210).  inf values propagate into the
    mean exactly as in the reference (SURVEY.md §7 hard part #6)."""
    valid = np.asarray(metrics["valid"])
    out: Dict[str, float] = {"n_streamlines": int(valid.sum())}
    for col, src in BUNDLE_SUMMARY:
        vals = np.asarray(metrics[src])[valid]
        out[col] = float(np.nanmean(vals)) if len(vals) else float("nan")
    return out
