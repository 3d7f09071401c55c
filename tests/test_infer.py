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


def test_score_cohort_one_program(tmp_path):
    """Fleet serving: every checkpointed member scored in ONE vmapped
    program; per-member results equal the one-at-a-time score_subjects
    path."""
    import json

    from lesionvae_tpu import cli
    from lesionvae_tpu.core.config import load_config
    from lesionvae_tpu.pipeline.infer import load_normative, score_cohort
    from lesionvae_tpu.pipeline.vae_run import run_vae_cohort

    cfg = tiny_config(n_per_group=2, tracts=["atr_left", "fimbria_right"])
    root = synth.generate_cohort(tmp_path / "cohort", cfg, seed=17,
                                 n_streamlines=8, volume_shape=(12, 12, 12),
                                 with_profiles=True)
    subjects = [s for subs in cfg.subjects_by_group().values() for s in subs]
    run_vae_cohort(["atr_left", "fimbria_right"], latent_dim=2, epochs=2,
                   batch_size=16, config=cfg, base_path=root,
                   timepoints=["9d"], output_dir=root / "results" / "vae_cohort",
                   seed=0, save_checkpoints=True)

    out = score_cohort(root / "results" / "vae_cohort", root, subjects,
                       config=cfg, seed=3,
                       output_dir=root / "results" / "serving")
    assert (root / "results" / "serving" / "cohort_scores.csv").exists()
    assert set(out["tract"]) == {"atr_left", "fimbria_right"}
    assert np.isfinite(out["mean"]).all()

    # per-member parity with the single-member serving path
    norm = load_normative(root / "results" / "vae_cohort"
                          / "zscores_atr_left_9d.npz")
    single = score_subjects(
        root / "results" / "vae_cohort" / "checkpoints" / "atr_left_9d",
        norm["mean"], norm["std"], root, "atr_left", "9d", subjects,
        config=cfg, seed=3)
    batched = out[(out["tract"] == "atr_left")
                  & (out["timepoint"] == "9d")]
    merged = single.merge(batched, on=["subject_id", "group"],
                          suffixes=("_s", "_b"))
    assert len(merged) == len(single)
    # the eval forward SAMPLES z (reference semantics, vae_model.py:117-121)
    # and the two paths draw from different key streams/shapes, so parity
    # is at sampling-noise level, not bitwise
    np.testing.assert_allclose(merged["mean_b"], merged["mean_s"], rtol=5e-3)
    np.testing.assert_allclose(merged["max_b"], merged["max_s"], rtol=5e-3)

    # member-sharded serving (shard_map over the mesh's data axis) must
    # reproduce the single-device program EXACTLY — same per-member math,
    # just placed on different devices
    from lesionvae_tpu.parallel.mesh import make_mesh

    sharded = score_cohort(root / "results" / "vae_cohort", root, subjects,
                           config=cfg, seed=3,
                           mesh=make_mesh(2, model_parallel=1))
    on = ["tract", "timepoint", "subject_id", "group"]
    m2 = out.merge(sharded, on=on, suffixes=("_1", "_n"))
    assert len(m2) == len(out)
    np.testing.assert_allclose(m2["mean_n"], m2["mean_1"], rtol=1e-6)
    np.testing.assert_allclose(m2["max_n"], m2["max_1"], rtol=1e-6)

    # a fleet that doesn't tile the mesh falls back to single-device with a
    # warning, not an error
    fallback = score_cohort(root / "results" / "vae_cohort", root, subjects,
                            config=cfg, seed=3,
                            mesh=make_mesh(8, model_parallel=1))
    m3 = out.merge(fallback, on=on, suffixes=("_1", "_f"))
    np.testing.assert_allclose(m3["mean_f"], m3["mean_1"], rtol=1e-6)


def test_score_cohort_missing_checkpoints_dir(tmp_path):
    """A cohort dir without checkpoints/ (fleet ran without
    save_checkpoints) must raise the curated error naming the fix, not an
    unhandled FileNotFoundError."""
    from lesionvae_tpu.pipeline.infer import score_cohort

    cohort = tmp_path / "vae_cohort"
    cohort.mkdir()
    cfg = tiny_config(n_per_group=1, tracts=["atr_left"])
    with pytest.raises(ValueError, match="save_checkpoints"):
        score_cohort(cohort, tmp_path, ["9001"], config=cfg)
    # stray non-member dirs (no underscore / temp files) are ignored, and
    # with nothing else present the same curated error fires
    (cohort / "checkpoints").mkdir()
    (cohort / "checkpoints" / "tmpdir").mkdir()
    (cohort / "checkpoints" / "notes.txt").write_text("x")
    with pytest.raises(ValueError, match="no member checkpoints"):
        score_cohort(cohort, tmp_path, ["9001"], config=cfg)
    # an underscore-named but unreadable dir (interrupted save, backup
    # copy) is skipped with a warning, not a crash: with no scoreable
    # member left the empty-schema frame comes back
    (cohort / "checkpoints" / "atr_left_9d").mkdir()
    out = score_cohort(cohort, tmp_path, ["9001"], config=cfg)
    assert len(out) == 0 and "tract" in out.columns
