"""Geometry pipeline end-to-end on a synthetic cohort."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from lesionvae_tpu.io import synth
from lesionvae_tpu.io.synth import tiny_config
from lesionvae_tpu.pipeline import geometry_run


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    cfg = tiny_config(n_per_group=1, tracts=["atr_left", "fimbria_right"])
    root = synth.generate_cohort(tmp_path_factory.mktemp("cohort"), cfg, seed=5,
                                 n_streamlines=8, volume_shape=(16, 16, 16),
                                 with_profiles=False)
    return cfg, root


EXPECTED_COLS = [
    "n_streamlines", "length_mean", "tortuosity_mean", "curv_mean_avg",
    "curv_energy_mean", "torsion_mean_avg", "bend_angle_mean_avg",
    "elongation_ratio_mean", "planarity_ratio_mean", "anisotropy_ratio_mean",
    "ang_dispersion_mean", "centroid_x_mean", "centroid_y_mean",
    "centroid_z_mean", "subject_id", "timepoint", "tract", "group",
]


def test_run_geometry_csv_schema(cohort, tmp_path):
    cfg, root = cohort
    from lesionvae_tpu.utils import profiling
    profiling.reset()
    df = geometry_run.run_geometry(cfg, data_dir=root / "data",
                                   output_dir=tmp_path, max_streamlines=100,
                                   dtype=jnp.float64)
    # profiling is wired into the pipeline (SURVEY.md §5.1)
    rep = profiling.report()
    for key in ("geometry", "geometry.read", "geometry.compute",
                "geometry.write"):
        assert key in rep and rep[key] >= 0.0
    # 3 subjects x 4 timepoints x 2 tracts
    assert len(df) == 3 * 4 * 2
    assert list(df.columns) == EXPECTED_COLS
    csv = pd.read_csv(tmp_path / "comprehensive_tract_geometry_metrics.csv")
    assert list(csv.columns) == EXPECTED_COLS
    assert (tmp_path / "summary_statistics_by_group_timepoint.csv").exists()
    assert (tmp_path / "summary_statistics_by_tract_group.csv").exists()
    assert set(csv["group"]) == {"Sham", "TBI", "PTE"}
    assert (csv["n_streamlines"] == 8).all()


def test_public_api_matches_batched(cohort):
    """compute_streamline_metrics (single bundle) must agree with the
    bucketed batched cohort path."""
    cfg, root = cohort
    sid = cfg.subjects_by_group()["TBI"][0]
    path = root / "data" / sid / "9d" / "bundles" / "atr_left_curves.vtk.gz"
    df_sl, df_bundle = geometry_run.compute_streamline_metrics(
        path, max_streamlines=100, dtype=jnp.float64)
    assert len(df_sl) == 8
    from lesionvae_tpu.io.vtk import read_streamlines
    sls = read_streamlines(path, max_streamlines=100)
    batched = geometry_run.batched_bundle_metrics([sls], dtype=jnp.float64)[0]
    for k, v in batched.items():
        np.testing.assert_allclose(df_bundle.iloc[0][k], v, rtol=1e-12,
                                   err_msg=k)


def test_max_streamlines_cap(cohort):
    cfg, root = cohort
    sid = cfg.subjects_by_group()["Sham"][0]
    path = root / "data" / sid / "2d" / "bundles" / "atr_left_curves.vtk.gz"
    df_sl, df_bundle = geometry_run.compute_streamline_metrics(
        path, max_streamlines=3)
    assert len(df_sl) == 3
    assert df_bundle.iloc[0]["n_streamlines"] == 3


def test_missing_files_skipped(cohort, tmp_path):
    cfg, root = cohort
    cfg2 = tiny_config(n_per_group=1, tracts=["atr_left", "nonexistent_tract"])
    df = geometry_run.process_all_tracts(cfg2, root / "data",
                                         max_streamlines=10)
    assert set(df["tract"]) == {"atr_left"}
    assert len(df) == 3 * 4


def test_decompress_vtk_if_needed(tmp_path):
    """Reference-parity inflate cache (comprehensive_tract_geometry_analysis
    .py:54-76): .gz inflates to a KEPT sibling .vtk, fresh siblings are
    reused, and failures fall back to the original path."""
    import gzip
    import os
    import time as _time

    import numpy as np

    from lesionvae_tpu.io import vtk
    from lesionvae_tpu.pipeline.geometry_run import decompress_vtk_if_needed

    sl = [np.cumsum(np.ones((5, 3), np.float64), axis=0)]
    raw = tmp_path / "bundle_curves.vtk"
    vtk.write_vtk_polylines(raw, sl, binary=True)
    gz = tmp_path / "bundle_curves.vtk.gz"
    gz.write_bytes(gzip.compress(raw.read_bytes()))
    raw.unlink()

    out = decompress_vtk_if_needed(gz)
    assert out == tmp_path / "bundle_curves.vtk" and out.exists()
    got = vtk.read_streamlines(out)
    np.testing.assert_allclose(got[0], sl[0])

    # warm reuse: the kept file is NOT rewritten when fresh
    mtime = out.stat().st_mtime_ns
    assert decompress_vtk_if_needed(gz) == out
    assert out.stat().st_mtime_ns == mtime

    # stale sibling (older than the archive) is refreshed
    os.utime(out, (1, 1))
    assert decompress_vtk_if_needed(gz) == out
    assert out.stat().st_mtime_ns > 1e9

    # corrupt archive -> fall back to the original path, no partial file
    bad = tmp_path / "bad_curves.vtk.gz"
    bad.write_bytes(b"not gzip at all")
    assert decompress_vtk_if_needed(bad) == bad
    assert not (tmp_path / "bad_curves.vtk").exists()

    # non-gz input is returned untouched
    plain = tmp_path / "plain_curves.vtk"
    vtk.write_vtk_polylines(plain, sl, binary=True)
    assert decompress_vtk_if_needed(plain) == plain


def test_launch_geometry_equals_sync(cohort, tmp_path):
    """The async launch/finish split (used by the bench to overlap device
    work with the tensor build) must produce the sync stage's exact CSVs."""
    cfg, root = cohort
    df_sync = geometry_run.run_geometry(cfg, data_dir=root / "data",
                                        output_dir=tmp_path / "sync",
                                        max_streamlines=50)
    finish = geometry_run.launch_geometry(cfg, data_dir=root / "data",
                                          output_dir=tmp_path / "async",
                                          max_streamlines=50)
    df_async = finish()
    pd.testing.assert_frame_equal(df_async, df_sync)
    a = (tmp_path / "async" / "comprehensive_tract_geometry_metrics.csv")
    s = (tmp_path / "sync" / "comprehensive_tract_geometry_metrics.csv")
    assert a.read_bytes() == s.read_bytes()


def test_cli_trace_flag(cohort, tmp_path):
    """--trace writes a jax.profiler trace of the stage (the profiling
    module's trace() wrapper is part of the CLI surface, SURVEY §5.1)."""
    cfg, root = cohort
    import json as _json

    from lesionvae_tpu import cli

    cfg_path = tmp_path / "cfg.json"
    d = cfg.to_json_dict()
    d["base_path"] = str(root)
    d["geometry_tracts"] = list(cfg.geometry_tracts)
    cfg_path.write_text(_json.dumps(d))
    trace_dir = tmp_path / "trace"
    assert cli.main(["geometry", "--config", str(cfg_path),
                     "--data-dir", str(root / "data"),
                     "--output-dir", str(tmp_path / "out"),
                     "--max-streamlines", "10",
                     "--trace", str(trace_dir)]) == 0
    assert any(trace_dir.rglob("*")), "trace dir is empty"
