"""End-to-end: full pipeline through the CLI on a synthetic cohort, plus a
small run_vae_analysis pass."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from lesionvae_tpu import cli
from lesionvae_tpu.io import synth
from lesionvae_tpu.io.synth import tiny_config

pytestmark = pytest.mark.slow  # full-matrix run: pytest -m slow


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    cfg = tiny_config(n_per_group=2, tracts=["atr_left", "fimbria_right"])
    synth.generate_cohort(root, cfg, seed=13, n_streamlines=6,
                          volume_shape=(20, 20, 20), with_profiles=True)
    cfg_path = root / "config.json"
    d = cfg.to_json_dict()
    d["base_path"] = str(root)
    d["geometry_tracts"] = list(cfg.geometry_tracts)
    cfg_path.write_text(json.dumps(d))
    return root, cfg_path


def test_cli_full_pipeline(cohort, capsys):
    root, cfg_path = cohort
    from lesionvae_tpu.utils import profiling
    profiling.reset()
    assert cli.main(["all", "--config", str(cfg_path),
                     "--num-samples", "400",
                     "--with-vae", "--epochs", "2"]) == 0
    res = root / "results"
    geo = pd.read_csv(res / "comprehensive_tract_geometry"
                      / "comprehensive_tract_geometry_metrics.csv")
    assert len(geo) == 6 * 4 * 2
    les = pd.read_csv(res / "lesion_sh_heme_comprehensive"
                      / "lesion_sh_heme_comprehensive.csv")
    assert len(les) == 4 * 4  # TBI+PTE subjects x timepoints
    assert (res / "tbi_pte_classification"
            / "classification_summary.csv").exists()
    assert (res / "lesion_tract_correlations").exists()
    # --with-vae runs the fleet as part of the one-command pipeline
    assert (res / "vae_cohort"
            / "training_history_atr_left_9d.csv").exists()

    # profiling is wired into every stage and the CLI prints the table
    rep = profiling.report()
    for key in ("geometry", "geometry.read", "geometry.compute", "lesion",
                "lesion.sh_batch", "vae_cohort.train",
                "vae_cohort.normative", "classify.cv", "correlate"):
        assert key in rep, f"missing profiling stage {key}"
    out = capsys.readouterr().out
    assert "stage wall-clock" in out and "geometry.read" in out


def test_run_vae_analysis_small(cohort):
    root, cfg_path = cohort
    from lesionvae_tpu.core.config import load_config
    from lesionvae_tpu.pipeline.vae_run import run_vae_analysis

    cfg = load_config(cfg_path)
    results = run_vae_analysis("atr_left", latent_dim=3, epochs=2,
                               batch_size=16, config=cfg, base_path=root,
                               timepoints=["9d"],
                               output_dir=root / "results" / "vae" / "atr_left",
                               seed=0, make_plots=True)
    assert "9d" in results
    r = results["9d"]
    assert r["Z"].shape[1:] == (100, 13)
    assert np.isfinite(r["magnitude"]).all()
    assert set(r["history"].columns) == {"loss", "recon", "kld", "beta"}
    out = root / "results" / "vae" / "atr_left"
    assert (out / "training_history_9d.csv").exists()
    assert (out / "zscores_9d.npz").exists()
    assert (out / "deviation_profiles_9d.png").exists()
    assert (out / "lesion_impact_9d.png").exists()
    assert (out / "latent_space_9d.png").exists()


def test_run_vae_cohort_fleet(cohort):
    """Fleet cohort API: both tracts x one timepoint trained concurrently."""
    root, cfg_path = cohort
    from lesionvae_tpu.core.config import load_config
    from lesionvae_tpu.pipeline.vae_run import run_vae_cohort

    cfg = load_config(cfg_path)
    results = run_vae_cohort(["atr_left", "fimbria_right"], latent_dim=3,
                             epochs=2, batch_size=16, config=cfg,
                             base_path=root, timepoints=["9d"],
                             output_dir=root / "results" / "vae_cohort",
                             seed=0, save_z=True)
    assert set(results) == {("atr_left", "9d"), ("fimbria_right", "9d")}
    for key, r in results.items():
        assert r["Z"].shape[1:] == (100, 13)
        assert np.isfinite(r["magnitude"]).all()
        assert len(r["history"]) == 2
        # on-device per-subject profiles == host aggregation of the full Z
        for sid, prof in r["subj_profiles"].items():
            m = r["subj_ids"] == sid
            np.testing.assert_allclose(
                prof, np.abs(r["Z"][m]).mean(axis=(0, 2)), rtol=2e-5,
                atol=1e-6)
    assert (root / "results" / "vae_cohort"
            / "training_history_atr_left_9d.csv").exists()
    assert (root / "results" / "vae_cohort"
            / "zscores_fimbria_right_9d.npz").exists()
