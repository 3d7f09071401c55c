"""f32 <-> f64 inf-pattern stability of the eigen-ratio geometry metrics.

The reference gates elongation/planarity to +inf when the PCA eigenvalue
denominator is <= 1e-12 — in f64 LAPACK arithmetic
(tract_geom_proc.py:119-141).  The production geometry CSV runs f32 on TPU,
where eigen-noise (~2e-4·λ1 worst case, measured) dwarfs that gate, so a
near-degenerate streamline could flip inf<->finite vs the reference.  The
fix under test: the kernel emits an ``eigen_ok`` certificate
(λ2, λ3 > EIGEN_SAFE_REL·λ1) and the pipeline recomputes failed rows on the
host in exact f64 (ops.geometry.eigen_metrics_f64).  These tests pin, on a
cohort-scale adversarial bundle:

- the f32 pipeline's inf/finite pattern == the f64 pipeline's, and
- all finite metric columns agree within tolerance.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from lesionvae_tpu.pipeline.geometry_run import metrics_dataframe  # noqa: E402


def _adversarial_bundle(n_per_kind: int = 60):
    """Streamlines spanning the full degeneracy spectrum: generic 3D,
    near-planar and near-linear at scales crossing the f32 noise floor,
    exactly planar, exactly collinear, and point-scale-tiny curves."""
    rng = np.random.default_rng(2024)
    sls = []
    for i in range(n_per_kind):
        P = int(rng.integers(5, 100))
        t = np.linspace(0, 1, P)
        # generic smooth 3D curve (typical tract)
        sls.append(np.stack([20 * t, 3 * np.sin(5 * t),
                             1.5 * np.cos(7 * t)], 1))
        # near-planar: z-extent sweeps 1e-9..1e-2 of the curve scale
        s = 10.0 ** rng.uniform(-9, -2)
        sls.append(np.stack([15 * t, 2 * np.sin(6 * t),
                             s * rng.normal(size=P)], 1))
        # near-linear
        s = 10.0 ** rng.uniform(-9, -2)
        sls.append(np.stack([25 * t, s * np.sin(6 * t),
                             0.5 * s * np.cos(9 * t)], 1))
        # exactly planar (reference: planarity = inf)
        sls.append(np.stack([20 * t, np.sin(4 * t), np.zeros(P)], 1))
        # exactly collinear (reference: elongation = planarity = inf)
        d = rng.normal(size=3)
        sls.append(np.outer(10 * t, d / np.linalg.norm(d)))
        # point-scale-tiny curve (λ1 below any certifiable level)
        sls.append(1e-6 * np.stack([t, np.sin(3 * t), np.cos(2 * t)], 1))
    return [sl.astype(np.float32) for sl in sls]


@pytest.fixture(scope="module")
def frames():
    bundle = _adversarial_bundle()
    df32, _ = metrics_dataframe(bundle, dtype=jnp.float32)
    df64, _ = metrics_dataframe(bundle, dtype=jnp.float64)
    assert len(df32) == len(df64) == len(bundle)
    return df32, df64


def test_inf_pattern_matches_f64(frames):
    df32, df64 = frames
    for col in ("elongation_ratio", "planarity_ratio"):
        inf32 = np.isinf(df32[col].values)
        inf64 = np.isinf(df64[col].values)
        mismatch = np.nonzero(inf32 != inf64)[0]
        assert mismatch.size == 0, (
            f"{col}: {mismatch.size} inf-pattern flips at rows "
            f"{mismatch[:10]} (f32 {df32[col].values[mismatch[:10]]} vs "
            f"f64 {df64[col].values[mismatch[:10]]})")
        # degenerate kinds are present, so the pattern is non-trivial
        assert inf64.any() and (~inf64).any()


def test_finite_columns_agree(frames):
    df32, df64 = frames
    for col in df32.columns:
        a = df32[col].values
        b = df64[col].values
        fin = np.isfinite(b)
        # refined / certified ratios: 2% (unrefined rows carry up to ~1%
        # f32 eigen error by construction); everything else tighter
        rtol = 2e-2 if col in ("elongation_ratio", "planarity_ratio",
                               "anisotropy_ratio") else 1e-3
        # arccos near cos=1 has sqrt(eps_f32)≈3e-4 absolute sensitivity —
        # near-straight curves put bend angles exactly there
        atol = 1e-3 if col == "bend_angle_mean" else 1e-4
        np.testing.assert_allclose(a[fin], b[fin], rtol=rtol, atol=atol,
                                   err_msg=col)


def test_certificate_flags_only_near_degenerate():
    """Well-conditioned curves must not be flagged (the host refinement
    loop must stay near-empty on real cohorts)."""
    from lesionvae_tpu.ops.geometry import (streamline_metrics_stacked,
                                            unstack_metrics, STACKED_NAMES)
    from lesionvae_tpu.ops.padding import pad_streamlines

    rng = np.random.default_rng(5)
    sls = []
    for _ in range(200):
        P = int(rng.integers(10, 100))
        t = np.linspace(0, 1, P)
        sls.append(np.stack([20 * t + rng.normal(0, 0.1, P),
                             3 * np.sin(5 * t) + rng.normal(0, 0.1, P),
                             2 * np.cos(4 * t) + rng.normal(0, 0.1, P)],
                            1).astype(np.float32))
    pts, lens = pad_streamlines(sls, max_points=112)
    out = unstack_metrics(np.asarray(streamline_metrics_stacked(
        jnp.asarray(pts), jnp.asarray(lens), dtype=jnp.float32)))
    assert out["eigen_ok"].all()
