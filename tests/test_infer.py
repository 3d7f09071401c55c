"""Serving path: checkpoint → score new subjects end to end."""

import numpy as np
import pytest

from lesionvae_tpu.io import synth
from lesionvae_tpu.io.synth import tiny_config
from lesionvae_tpu.pipeline.infer import score_subjects
from lesionvae_tpu.train import data as vdata
from lesionvae_tpu.train.checkpoint import save_vae
from lesionvae_tpu.train.normative import compute_normative_statistics
from lesionvae_tpu.train.trainer import train_lesion_vae


def test_checkpoint_then_score(tmp_path):
    cfg = tiny_config(n_per_group=1, tracts=["atr_left"])
    root = synth.generate_cohort(tmp_path / "cohort", cfg, seed=31,
                                 n_streamlines=8, volume_shape=(12, 12, 12),
                                 with_profiles=True)
    groups = cfg.subjects_by_group()
    subjects = [s for subs in groups.values() for s in subs]
    Xm, Xl, sids, glabels, _ = vdata.build_tensor_with_lesion_context(
        root, "atr_left", "9d", subjects, cfg.microstructure_features,
        cfg.lesion_features, groups)
    stats = vdata.fit_normalization_stats(Xm, Xl, cfg.microstructure_features)
    Xz, Xl = vdata.apply_normalization(Xm, Xl, stats)
    model, _ = train_lesion_vae(Xz, Xl, latent_dim=3, epochs=2, batch_size=16,
                                seed=0)
    sham = glabels == "Sham"
    mean_r, std_r = compute_normative_statistics(model, Xz[sham], Xl[sham])
    save_vae(tmp_path / "ckpt", model, stats)

    summary = score_subjects(tmp_path / "ckpt", mean_r, std_r, root,
                             "atr_left", "1mo", subjects, config=cfg)
    assert {"subject_id", "group", "mean", "std", "max", "count"} \
        <= set(summary.columns)
    assert summary["count"].sum() > 0
    assert np.isfinite(summary["mean"]).all()
