"""Geometry kernel tests: numpy-oracle parity over randomized ragged bundles,
plus golden closed-form cases (helix, straight line, circle).

The oracle below re-implements the reference formulas in plain numpy from the
documented semantics (SURVEY.md §2 C2); it is NOT imported from /root/reference.
"""

import numpy as np
import pytest

from lesionvae_tpu.ops.geometry import (bundle_summary, streamline_metrics)
from lesionvae_tpu.ops.padding import pad_streamlines

import jax.numpy as jnp


# ----------------------------------------------------------------------------
# numpy oracle (reference formula semantics, float64)
# ----------------------------------------------------------------------------
def oracle_metrics(sl: np.ndarray) -> dict:
    d = np.diff(sl, axis=0)
    seg = np.linalg.norm(d, axis=1)
    L = seg.sum()
    e2e = np.linalg.norm(sl[-1] - sl[0])

    v = np.gradient(sl, axis=0)
    a = np.gradient(v, axis=0)
    cross = np.cross(v, a)
    cross_mag = np.linalg.norm(cross, axis=1)
    v_mag = np.linalg.norm(v, axis=1) + 1e-12
    kappa = cross_mag / v_mag ** 3
    kfin = kappa[np.isfinite(kappa)]
    curv_mean = kfin.mean() if kfin.size and len(sl) >= 3 else 0.0
    curv_std = kfin.std() if kfin.size and len(sl) >= 3 else 0.0

    ds = seg + 1e-12
    kap0 = np.nan_to_num(kappa)
    m = min(len(kap0), len(ds))
    curv_energy = float(np.sum(kap0[:m] ** 2 * ds[:m])) if len(sl) >= 3 else 0.0

    if len(sl) >= 4:
        b = np.cross(v, a)
        db = np.gradient(b, axis=0)
        tau = np.einsum("ij,ij->i", b, db) / (np.linalg.norm(b, axis=1) ** 2 + 1e-12)
        tau = tau[np.isfinite(tau)]
        torsion = float(tau.mean()) if tau.size else 0.0
    else:
        torsion = 0.0

    t = d / (seg[:, None] + 1e-12)
    cosines = np.clip(np.einsum("ij,ij->i", t[:-1], t[1:]), -1, 1)
    bend = float(np.mean(np.abs(np.arccos(cosines)))) if len(sl) >= 3 else 0.0

    bbox = float(np.prod(sl.max(0) - sl.min(0)))
    c = sl.mean(0)
    X = sl - c
    C = np.cov(X.T)
    vals = np.sort(np.linalg.eigvalsh(C))[::-1]
    elong = float("inf") if vals[1] <= 1e-12 else vals[0] / vals[1]
    planar = float("inf") if vals[2] <= 1e-12 else vals[1] / vals[2]
    aniso = vals[0] / (vals.sum() + 1e-12)

    mt = t.mean(0)
    ang = float(np.mean(np.linalg.norm(t - mt, axis=1) ** 2))

    return dict(length=L, end_to_end=e2e, tortuosity=L / max(e2e, 1e-8),
                straightness=e2e / max(L, 1e-8), curv_mean=curv_mean,
                curv_std=curv_std, curv_energy=curv_energy,
                torsion_mean=torsion, bend_angle_mean=bend, bbox_vol=bbox,
                elongation_ratio=elong, planarity_ratio=planar,
                anisotropy_ratio=aniso, centroid_x=c[0], centroid_y=c[1],
                centroid_z=c[2], ang_dispersion=ang)


def _random_bundle(rng, n=20, lo=3, hi=40):
    out = []
    for _ in range(n):
        npts = int(rng.integers(lo, hi))
        t = np.linspace(0, 1, npts)
        base = rng.normal(size=3) * 5
        dirv = rng.normal(size=3)
        sl = base + t[:, None] * dirv * 10
        sl += 0.5 * np.sin(2 * np.pi * t[:, None] * rng.uniform(0.5, 2, 3)
                           + rng.uniform(0, 6, 3))
        out.append(sl)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_metrics_match_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    bundle = _random_bundle(rng)
    pts, lens = pad_streamlines(bundle, dtype=np.float64)
    got = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens),
                             dtype=jnp.float64)
    for i, sl in enumerate(bundle):
        want = oracle_metrics(sl)
        for k, wv in want.items():
            gv = float(np.asarray(got[k])[i])
            if np.isinf(wv):
                assert np.isinf(gv), f"{k}[{i}]: want inf got {gv}"
            else:
                np.testing.assert_allclose(
                    gv, wv, rtol=1e-8, atol=1e-10,
                    err_msg=f"{k}[{i}] (n={len(sl)})")


def test_metrics_f32_tolerance():
    rng = np.random.default_rng(7)
    bundle = _random_bundle(rng, n=10)
    pts, lens = pad_streamlines(bundle, dtype=np.float32)
    got = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens))
    for i, sl in enumerate(bundle):
        want = oracle_metrics(sl)
        for k in ["length", "tortuosity", "curv_mean", "bend_angle_mean",
                  "anisotropy_ratio", "ang_dispersion"]:
            np.testing.assert_allclose(float(np.asarray(got[k])[i]), want[k],
                                       rtol=2e-4, err_msg=f"{k}[{i}]")


def test_golden_helix():
    # x=(r cos t, r sin t, c t): curvature r/(r^2+c^2), torsion c/(r^2+c^2)
    r, c = 2.0, 0.5
    t = np.linspace(0, 4 * np.pi, 2000)
    sl = np.stack([r * np.cos(t), r * np.sin(t), c * t], 1)
    pts, lens = pad_streamlines([sl], dtype=np.float64)
    got = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens),
                             dtype=jnp.float64)
    k_true = r / (r ** 2 + c ** 2)
    assert abs(float(got["curv_mean"][0]) - k_true) / k_true < 1e-3
    # NOTE: the reference's "torsion" (tract_geom_proc.py:85-96) is
    # (b . db)/|b|^2 with b = v x a — the log-derivative of |v x a|, NOT the
    # Frenet torsion.  For a true helix |v x a| is constant, so it is ~0.
    # We replicate the reference formula (parity over textbook correctness).
    assert abs(float(got["torsion_mean"][0])) < 1e-6
    L_true = np.sqrt(r ** 2 + c ** 2) * 4 * np.pi
    assert abs(float(got["length"][0]) - L_true) / L_true < 1e-4


def test_golden_straight_line_inf_ratios():
    t = np.linspace(0, 1, 50)
    sl = np.stack([t * 10, np.zeros_like(t), np.zeros_like(t)], 1)
    pts, lens = pad_streamlines([sl], dtype=np.float64)
    got = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens),
                             dtype=jnp.float64)
    # perfectly straight: tortuosity 1, inf elongation/planarity (λ2=λ3=0)
    np.testing.assert_allclose(float(got["tortuosity"][0]), 1.0, rtol=1e-9)
    assert np.isinf(float(got["elongation_ratio"][0]))
    assert np.isinf(float(got["planarity_ratio"][0]))
    np.testing.assert_allclose(float(got["anisotropy_ratio"][0]), 1.0, atol=1e-9)
    np.testing.assert_allclose(float(got["curv_mean"][0]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(got["ang_dispersion"][0]), 0.0, atol=1e-12)


def test_golden_circle_planarity():
    t = np.linspace(0, 2 * np.pi, 300, endpoint=False)
    sl = np.stack([3 * np.cos(t), 3 * np.sin(t), np.zeros_like(t)], 1)
    pts, lens = pad_streamlines([sl], dtype=np.float64)
    got = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens),
                             dtype=jnp.float64)
    # planar closed-ish curve: λ3 = 0 → planarity inf; curvature = 1/r
    assert np.isinf(float(got["planarity_ratio"][0]))
    # one-sided np.gradient edges at the two open ends dominate the error
    assert abs(float(got["curv_mean"][0]) - 1 / 3) < 5e-3


def test_bundle_summary_schema_and_inf_propagation():
    rng = np.random.default_rng(3)
    bundle = _random_bundle(rng, n=5)
    t = np.linspace(0, 1, 30)
    bundle.append(np.stack([t, 0 * t, 0 * t], 1))  # straight → inf ratios
    pts, lens = pad_streamlines(bundle, dtype=np.float64)
    got = {k: np.asarray(v) for k, v in streamline_metrics(
        jnp.asarray(pts), jnp.asarray(lens), dtype=jnp.float64).items()}
    summ = bundle_summary(got)
    assert summ["n_streamlines"] == 6
    expected_cols = {"n_streamlines", "length_mean", "tortuosity_mean",
                     "curv_mean_avg", "curv_energy_mean", "torsion_mean_avg",
                     "bend_angle_mean_avg", "elongation_ratio_mean",
                     "planarity_ratio_mean", "anisotropy_ratio_mean",
                     "ang_dispersion_mean", "centroid_x_mean",
                     "centroid_y_mean", "centroid_z_mean"}
    assert set(summ) == expected_cols
    # inf from the straight streamline must propagate into the bundle mean
    assert np.isinf(summ["elongation_ratio_mean"])


def test_degenerate_zero_length_flagged_invalid():
    sl = np.zeros((5, 3))
    pts, lens = pad_streamlines([sl], dtype=np.float64)
    got = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens),
                             dtype=jnp.float64)
    assert not bool(got["valid"][0])
