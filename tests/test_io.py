"""IO layer tests: VTK round-trip, NIfTI round-trip, synth factory contract."""

from pathlib import Path

import numpy as np
import pytest

from lesionvae_tpu.io import nifti, synth, vtk
from lesionvae_tpu.io.synth import tiny_config


def _random_bundle(rng, n=5):
    return [rng.normal(size=(int(rng.integers(3, 12)), 3)) for _ in range(n)]


@pytest.mark.parametrize("binary", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_vtk_roundtrip(tmp_path, rng, binary, compress):
    bundle = _random_bundle(rng)
    path = tmp_path / ("b.vtk.gz" if compress else "b.vtk")
    vtk.write_vtk_polylines(path, bundle, binary=binary)
    back = vtk.read_streamlines(path)
    assert len(back) == len(bundle)
    for a, b in zip(bundle, back):
        tol = 1e-6 if binary else 1e-6  # float32 storage either way
        np.testing.assert_allclose(a, b, rtol=0, atol=np.abs(a).max() * 1e-6 + tol)


def test_vtk_filters_short_and_nonfinite(tmp_path, rng):
    # reference keeps only polylines with >2 points and all-finite coords
    # (tract_geom_proc.py:21)
    good = rng.normal(size=(10, 3))
    short = rng.normal(size=(2, 3))
    bad = rng.normal(size=(8, 3))
    bad[3, 1] = np.nan
    path = tmp_path / "f.vtk"
    vtk.write_vtk_polylines(path, [short, good, bad])
    back = vtk.read_streamlines(path)
    assert len(back) == 1
    assert back[0].shape == (10, 3)


def test_vtk_max_streamlines(tmp_path, rng):
    bundle = _random_bundle(rng, n=7)
    path = tmp_path / "m.vtk"
    vtk.write_vtk_polylines(path, bundle)
    assert len(vtk.read_streamlines(path, max_streamlines=3)) == 3


def test_vtk_v51_offsets_layout(tmp_path):
    # hand-written v5.1 OFFSETS/CONNECTIVITY ASCII file
    text = """# vtk DataFile Version 5.1
t
ASCII
DATASET POLYDATA
POINTS 6 float
0 0 0
1 0 0
2 0 0
0 1 0
1 1 0
2 1 0
LINES 3 6
OFFSETS vtktypeint64
0 3 6
CONNECTIVITY vtktypeint64
0 1 2 3 4 5
"""
    p = tmp_path / "v51.vtk"
    p.write_text(text)
    sls = vtk.read_streamlines(p)
    assert len(sls) == 2
    np.testing.assert_allclose(sls[0], [[0, 0, 0], [1, 0, 0], [2, 0, 0]])


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.normal(size=(7, 6, 5)).astype(np.float32)
    affine = np.array([[0.5, 0, 0, -3.0], [0, 0.7, 0, 1.0],
                       [0, 0, 1.1, 2.0], [0, 0, 0, 1.0]])
    for name in ["a.nii", "a.nii.gz"]:
        path = tmp_path / name
        nifti.save(path, data, affine)
        img = nifti.load(path)
        np.testing.assert_allclose(img.get_fdata(), data, rtol=1e-6)
        np.testing.assert_allclose(img.affine, affine, rtol=1e-5, atol=1e-6)
        assert abs(img.voxel_volume() - 0.5 * 0.7 * 1.1) < 1e-6


def test_nifti_apply_affine():
    affine = np.array([[2.0, 0, 0, 10.0], [0, 3.0, 0, -5.0],
                       [0, 0, 1.0, 0.0], [0, 0, 0, 1.0]])
    out = nifti.apply_affine(affine, np.array([[1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(out, [[12.0, -2.0, 1.0]])


def test_synth_cohort_layout(tmp_path):
    cfg = tiny_config(n_per_group=1, tracts=["atr_left"])
    root = synth.generate_cohort(tmp_path, cfg, seed=3, n_streamlines=4,
                                 volume_shape=(16, 16, 16))
    sham = cfg.subjects_by_group()["Sham"][0]
    tbi = cfg.subjects_by_group()["TBI"][0]
    assert (root / "data" / sham / "9d" / "bundles" / "atr_left_curves.vtk.gz").exists()
    assert (root / "data" / sham / "9d" / "tissue.nii.gz").exists()
    assert not (root / "data" / sham / "9d" / "lesion_cleaned.nii.gz").exists()
    assert (root / "data" / tbi / "9d" / "lesion_cleaned.nii.gz").exists()
    assert not (root / "data" / tbi / "2d" / "lesion_cleaned.nii.gz").exists()
    csv = (root / "results" / tbi / f"timepoint_analysis_{tbi}_9d"
           / f"comprehensive_tract_data_{tbi}_9d.csv")
    assert csv.exists()
    import pandas as pd
    df = pd.read_csv(csv)
    assert set(["tract_id", "streamline_id", "point_id",
                "position_along_tract"]).issubset(df.columns)
    assert df["point_id"].nunique() == 100  # data_loader.py:98-100 contract
    assert "in_lesion" in df.columns
    # Sham CSVs must NOT carry lesion columns (imputation-path contract)
    df_sham = pd.read_csv(root / "results" / sham / f"timepoint_analysis_{sham}_9d"
                          / f"comprehensive_tract_data_{sham}_9d.csv")
    assert "in_lesion" not in df_sham.columns


def test_synth_determinism(tmp_path):
    cfg = tiny_config(n_per_group=1, tracts=["atr_left"])
    r1 = synth.generate_cohort(tmp_path / "a", cfg, seed=7, n_streamlines=3,
                               volume_shape=(12, 12, 12), with_profiles=False)
    r2 = synth.generate_cohort(tmp_path / "b", cfg, seed=7, n_streamlines=3,
                               volume_shape=(12, 12, 12), with_profiles=False)
    f1 = sorted(p.relative_to(r1) for p in r1.rglob("*.gz"))
    f2 = sorted(p.relative_to(r2) for p in r2.rglob("*.gz"))
    assert f1 == f2
    for rel in f1[:5]:
        assert (r1 / rel).read_bytes() == (r2 / rel).read_bytes()
