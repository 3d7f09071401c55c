"""Lesion SH pipeline tests: zero-row contract, strict/lenient variants,
heme metrics, scipy end-to-end spectrum oracle."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from lesionvae_tpu.io import nifti, synth
from lesionvae_tpu.io.synth import tiny_config
from lesionvae_tpu.ops import volume as vol
from lesionvae_tpu.pipeline import lesion_run


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    cfg = tiny_config(n_per_group=1, tracts=["atr_left"])
    root = synth.generate_cohort(tmp_path_factory.mktemp("lesions"), cfg,
                                 seed=11, n_streamlines=3,
                                 volume_shape=(24, 24, 24), with_profiles=False)
    return cfg, root


LENIENT_COLS = (
    ["subject_id", "timepoint", "original_volume_mm3", "brain_volume_mm3",
     "lesion_brain_ratio", "scale_factor", "centroid_x", "centroid_y",
     "centroid_z", "num_surface_points"]
    + [c for l in range(7) for c in (f"P{l}", f"P{l}_raw", f"c{l}_0")]
    + ["reconstruction_r", "group", "heme_mean", "heme_std", "heme_total",
       "heme_max", "heme_95percentile", "heme_volume_mm3"]
)

STRICT_COLS = (
    ["subject_id", "timepoint", "original_volume_mm3", "brain_volume_mm3",
     "lesion_brain_ratio", "scale_factor", "centroid_x", "centroid_y",
     "centroid_z", "num_surface_points"]
    + [f"P{l}" for l in range(7)] + [f"P{l}_raw" for l in range(7)]
    + [f"c{l}_0" for l in range(7)] + ["reconstruction_r", "group"]
)


def test_lenient_cohort_csv(cohort, tmp_path):
    cfg, root = cohort
    df = lesion_run.run_lesion_analysis(cfg, data_dir=root / "data",
                                        output_dir=tmp_path, num_samples=500,
                                        seed=0)
    # 2 subjects (TBI+PTE) x 4 timepoints, zero-row contract for 2d
    assert len(df) == 2 * 4
    assert list(df.columns) == LENIENT_COLS
    d2 = df[df["timepoint"] == "2d"]
    assert (d2["original_volume_mm3"] == 0).all()
    assert (d2[[f"P{l}" for l in range(7)]] == 0).all().all()
    assert (d2["brain_volume_mm3"] > 0).all()  # brain volume always present
    d9 = df[df["timepoint"] == "9d"]
    assert (d9["original_volume_mm3"] > 0).all()
    np.testing.assert_allclose(
        d9[[f"P{l}" for l in range(7)]].sum(axis=1), 1.0, rtol=1e-6)
    assert (d9["reconstruction_r"] > 0.95).all()
    assert (d9["P0"] > 0.5).all()  # roughly ellipsoidal blob → P0-dominant
    assert (df["heme_mean"] > 0).all()
    assert (tmp_path / "lesion_sh_heme_comprehensive.csv").exists()


def test_strict_variant(cohort, tmp_path):
    cfg, root = cohort
    tbi = cfg.subjects_by_group()["TBI"][0]
    # strict fails on missing lesion (2d)
    res, ok = lesion_run.analyze_single_lesion(
        tbi, "2d", root / "data", strict=True, num_samples=500)
    assert res is None and not ok
    # strict succeeds on a real lesion
    res, ok = lesion_run.analyze_single_lesion(
        tbi, "9d", root / "data", strict=True, num_samples=500,
        rng=np.random.default_rng(0))
    assert ok and res is not None
    assert list(res.keys()) == STRICT_COLS[:-1]  # 'group' added by driver
    assert res["original_volume_mm3"] > 0

    df = lesion_run.run_lesion_shape_descriptors(
        cfg, data_dir=root / "data", output_dir=tmp_path, num_samples=500,
        make_plots=True)
    assert list(df.columns) == STRICT_COLS
    assert (df["timepoint"] != "2d").all()  # strict drops missing lesions
    assert (tmp_path / "lesion_sh_descriptors.csv").exists()
    assert (tmp_path / "group_statistics.csv").exists()
    assert (tmp_path / "group_spectra_comparison.png").exists()
    assert (tmp_path / "brain_volume_analysis.png").exists()


def test_lenient_single_matches_cohort(cohort, tmp_path):
    """Per-item public API must agree with the batched cohort path when fed
    the same surface subsample (seeded rng)."""
    cfg, root = cohort
    pte = cfg.subjects_by_group()["PTE"][0]
    res, ok = lesion_run.analyze_single_lesion(
        pte, "1mo", root / "data", num_samples=500,
        rng=np.random.default_rng(123))
    assert ok
    res2, _ = lesion_run.analyze_single_lesion(
        pte, "1mo", root / "data", num_samples=500,
        rng=np.random.default_rng(123))
    for k in res:
        if isinstance(res[k], float):
            np.testing.assert_allclose(res[k], res2[k], rtol=1e-12, err_msg=k)


def test_heme_metrics_oracle(cohort):
    cfg, root = cohort
    tbi = cfg.subjects_by_group()["TBI"][0]
    got = vol.compute_heme_content(tbi, "9d", root / "data")
    img = nifti.load(root / "data" / tbi / "9d" / "heme.nii.gz")
    data = img.get_fdata()
    vals = data[data > 0]
    np.testing.assert_allclose(got["heme_mean"], vals.mean(), rtol=1e-12)
    np.testing.assert_allclose(got["heme_std"], vals.std(), rtol=1e-12)
    np.testing.assert_allclose(got["heme_total"], vals.sum(), rtol=1e-12)
    np.testing.assert_allclose(got["heme_max"], vals.max(), rtol=1e-12)
    thr = np.percentile(vals, 95)
    np.testing.assert_allclose(got["heme_95percentile"], thr, rtol=1e-12)
    np.testing.assert_allclose(
        got["heme_volume_mm3"], (data > thr).sum() * img.voxel_volume(),
        rtol=1e-12)


def test_spectrum_matches_scipy_end_to_end(cohort):
    """Full scipy oracle: same surface points → lsq_linear SH fit → powers.
    Our TPU path must match to ~1e-6 (BASELINE.md SH-parity target)."""
    from scipy.optimize import lsq_linear
    from tests.test_sh import scipy_real_sh

    cfg, root = cohort
    tbi = cfg.subjects_by_group()["TBI"][0]
    num_samples, max_l = 400, 6

    # host preprocessing with a fixed seed
    lesion_path = root / "data" / tbi / "5mo" / "lesion_cleaned.nii.gz"
    p, reason = lesion_run.prepare_lesion(lesion_path, num_samples,
                                          rng=np.random.default_rng(7))
    assert reason == "ok"

    # oracle: reference-formula numpy/scipy implementation
    gr = (1 + 5 ** 0.5) / 2
    i = np.arange(num_samples)
    theta = np.arccos(1 - 2 * (i + 0.5) / num_samples)
    phi = 2 * np.pi * i / gr
    dirs = np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi), np.cos(theta)], 1)
    centered = p.surface - p.centroid_mm
    radii = (centered @ dirs.T).max(axis=0) * p.scale
    A = np.column_stack([scipy_real_sh(l, m, theta, phi)
                         for l in range(max_l + 1) for m in range(-l, l + 1)])
    coeffs = lsq_linear(A, radii).x
    P_raw = np.array([sum(coeffs[l * l + (m + l)] ** 2 for m in range(-l, l + 1))
                      for l in range(max_l + 1)])
    P_norm = P_raw / P_raw.sum()

    # our path
    res, ok = lesion_run.analyze_single_lesion(
        tbi, "5mo", root / "data", num_samples=num_samples,
        rng=np.random.default_rng(7))
    assert ok
    got_norm = np.array([res[f"P{l}"] for l in range(max_l + 1)])
    got_raw = np.array([res[f"P{l}_raw"] for l in range(max_l + 1)])
    np.testing.assert_allclose(got_norm, P_norm, atol=1e-8)
    np.testing.assert_allclose(got_raw, P_raw, atol=1e-8)
    recon = A @ coeffs
    want_r = np.corrcoef(radii, recon)[0, 1]
    np.testing.assert_allclose(res["reconstruction_r"], want_r, atol=1e-8)


def test_corrupt_lesion_file_yields_zero_row(cohort, tmp_path):
    """Lenient contract: ANY analysis failure → zero SH row, not a crash
    (lesion_sh_heme_comprehensive.py:438-441)."""
    cfg, root = cohort
    tbi = cfg.subjects_by_group()["TBI"][0]
    data2 = tmp_path / "data"
    import shutil
    shutil.copytree(root / "data", data2)
    bad = data2 / tbi / "9d" / "lesion_cleaned.nii.gz"
    bad.write_bytes(b"corrupt" * 100)
    res, ok = lesion_run.analyze_single_lesion(tbi, "9d", data2,
                                               num_samples=200)
    assert ok and res is not None
    assert res["original_volume_mm3"] == 0.0
    assert res["P0"] == 0.0
    # strict variant fails instead
    res2, ok2 = lesion_run.analyze_single_lesion(tbi, "9d", data2,
                                                 num_samples=200, strict=True)
    assert res2 is None and not ok2
