"""Default-suite pipeline smoke: `python -m lesionvae_tpu all` on a minimal
synthetic cohort.

The full-matrix e2e tests (test_e2e.py) are `slow`-marked and deselected by
the default run, which previously meant a green default CI could miss a
pipeline-level regression entirely (VERDICT r2).  This smoke keeps the
one-command CLI path — synth → geometry → lesion → classification →
correlation — inside every `pytest -q`, trimmed to the smallest cohort the
stages accept (VAE fleet excluded here; it has dedicated default-suite
coverage in test_trainer/test_parallel and slow e2e coverage).
"""

import json

import pandas as pd
import pytest

from lesionvae_tpu import cli
from lesionvae_tpu.io import synth
from lesionvae_tpu.io.synth import tiny_config


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke")
    cfg = tiny_config(n_per_group=2, tracts=["atr_left"])
    synth.generate_cohort(root, cfg, seed=29, n_streamlines=4,
                          volume_shape=(16, 16, 16), with_profiles=False)
    cfg_path = root / "config.json"
    d = cfg.to_json_dict()
    d["base_path"] = str(root)
    d["geometry_tracts"] = list(cfg.geometry_tracts)
    cfg_path.write_text(json.dumps(d))
    return root, cfg_path


def test_cli_all_smoke(cohort, capsys):
    root, cfg_path = cohort
    from lesionvae_tpu.utils import profiling
    profiling.reset()
    assert cli.main(["all", "--config", str(cfg_path),
                     "--num-samples", "256"]) == 0
    res = root / "results"
    geo = pd.read_csv(res / "comprehensive_tract_geometry"
                      / "comprehensive_tract_geometry_metrics.csv")
    assert len(geo) == 6 * 4 * 1  # subjects x timepoints x tracts
    assert geo["n_streamlines"].gt(0).all()
    les = pd.read_csv(res / "lesion_sh_heme_comprehensive"
                      / "lesion_sh_heme_comprehensive.csv")
    assert len(les) == 4 * 4  # TBI+PTE subjects x timepoints
    assert (res / "tbi_pte_classification"
            / "classification_summary.csv").exists()
    assert (res / "lesion_tract_correlations").exists()

    rep = profiling.report()
    for key in ("geometry", "geometry.compute", "lesion", "classify.cv",
                "correlate"):
        assert key in rep, f"missing profiling stage {key}"
    assert "stage wall-clock" in capsys.readouterr().out
