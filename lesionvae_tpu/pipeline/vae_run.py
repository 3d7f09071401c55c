"""run_vae_analysis — the VAE stage end-to-end.

The reference README advertises ``run_vae_analysis`` (README.md:103-111) but
the function exists nowhere in the reference (SURVEY.md §2 discrepancy #1);
its real surface is the five-step composition below (SURVEY.md §3.3).  We ship
it as a first-class API:

  build_tensor_with_lesion_context → fit/apply_normalization →
  train_lesion_vae → compute_normative_statistics → compute_zscore_residuals

plus the training-history CSV, z-score arrays, latent means, and the three
reference figures per timepoint (viz/vae_viz.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from ..core.config import Config, load_config
from ..train import data as vdata
from ..train.normative import (normative_zscores_fleet,
                               normative_zscores_fused)
from ..train.trainer import train_lesion_vae
from ..utils.logging import get_logger
from ..utils.profiling import stage

log = get_logger("vae")


def run_vae_analysis(tract: str, latent_dim: int = 10, epochs: int = 40,
                     batch_size: int = 64, lr: float = 2e-4,
                     config: Optional[Config] = None,
                     base_path: str | Path | None = None,
                     timepoints: Optional[Sequence[str]] = None,
                     output_dir: str | Path | None = None,
                     seed: int = 42, make_plots: bool = True,
                     mesh=None) -> Dict[str, dict]:
    """Train a lesion-conditioned VAE per timepoint and compute normative
    z-score deviation maps.

    Returns {timepoint: {"model", "history", "Z", "magnitude", "subj_ids",
    "group_labels", "latents", "lesion_burden", "s"}}.
    """
    config = config or load_config()
    base_path = Path(base_path) if base_path else Path(config.base_path)
    timepoints = list(timepoints if timepoints is not None else config.timepoints)
    output_dir = (Path(output_dir) if output_dir
                  else base_path / "results" / "vae_analysis" / tract)
    output_dir.mkdir(parents=True, exist_ok=True)

    groups_dict = {g: list(s) for g, s in config.subjects_by_group().items()}
    subjects = [s for subs in groups_dict.values() for s in subs]

    results: Dict[str, dict] = {}
    bundle_profiles, lesion_profiles, group_mappings = {}, {}, {}
    latents_by_tp, burden_by_tp, groups_by_tp = {}, {}, {}

    for tp in timepoints:
        log.info("=== %s @ %s ===", tract, tp)
        try:
            with stage("vae.tensors"):
                Xm, Xl, subj_ids, group_labels, s = \
                    vdata.build_tensor_with_lesion_context(
                        base_path, tract, tp, subjects,
                        config.microstructure_features,
                        config.lesion_features, groups_dict)
        except ValueError as e:
            log.warning("%s", e)
            continue

        with stage("vae.normalize"):
            stats = vdata.fit_normalization_stats(
                Xm, Xl, list(config.microstructure_features))
            Xz, Xl = vdata.apply_normalization(Xm, Xl, stats)

        with stage("vae.train"):
            model, hist = train_lesion_vae(
                Xz, Xl, latent_dim=latent_dim, epochs=epochs,
                batch_size=batch_size, lr=lr, seed=seed, mesh=mesh)
        hist.to_csv(output_dir / f"training_history_{tp}.csv", index=False)

        sham = group_labels == "Sham"
        if not sham.any():
            log.warning("no Sham streamlines at %s — skipping z-scores", tp)
            continue
        with stage("vae.normative"):
            mean_r, std_r, Z, magnitude = normative_zscores_fused(
                model, Xz, Xl, sham, seed=seed)

        mu, _, _ = model.encode(Xz, Xl)
        mu = np.asarray(mu)
        lesion_burden = Xl[:, :, 0].mean(axis=1)  # mean in_lesion per streamline

        np.savez_compressed(
            output_dir / f"zscores_{tp}.npz", Z=Z, magnitude=magnitude,
            subj_ids=subj_ids, group_labels=group_labels, latents=mu,
            lesion_burden=lesion_burden, norm_mean=mean_r, norm_std=std_r)

        results[tp] = dict(model=model, history=hist, Z=Z, magnitude=magnitude,
                           subj_ids=subj_ids, group_labels=group_labels,
                           latents=mu, lesion_burden=lesion_burden, s=s)

        # per-subject profiles for the figures: mean |z| over
        # (streamlines, features) per position; mean in_lesion per position
        prof, les, gmap = {}, {}, {}
        for sid in np.unique(subj_ids):
            m = subj_ids == sid
            prof[sid] = np.abs(Z[m]).mean(axis=(0, 2))
            les[sid] = Xl[m, :, 0].mean(axis=0)
            gmap[sid] = group_labels[m][0]
        bundle_profiles[tp] = prof
        lesion_profiles[tp] = les
        group_mappings[tp] = gmap
        latents_by_tp[tp] = mu
        burden_by_tp[tp] = lesion_burden
        groups_by_tp[tp] = subj_ids  # per-streamline subject ids for grouping

    if make_plots and bundle_profiles:
        with stage("vae.figures"):
            _make_vae_figures(bundle_profiles, lesion_profiles, group_mappings,
                              latents_by_tp, burden_by_tp, groups_by_tp,
                              results, output_dir)

    log.info("VAE analysis complete for %s: %d timepoints → %s",
             tract, len(results), output_dir)
    return results


def _make_vae_figures(bundle_profiles, lesion_profiles, group_mappings,
                      latents_by_tp, burden_by_tp, groups_by_tp, results,
                      output_dir):
    from ..viz.vae_viz import (plot_latent_space_with_lesion_context,
                               plot_lesion_aware_deviation_profiles,
                               plot_lesion_impact_analysis)
    for tp in bundle_profiles:
        plot_lesion_aware_deviation_profiles(
            bundle_profiles, lesion_profiles, group_mappings, tp,
            output_dir / f"deviation_profiles_{tp}.png")
        plot_lesion_impact_analysis(
            bundle_profiles, lesion_profiles, group_mappings, tp,
            output_dir / f"lesion_impact_{tp}.png")
        plot_latent_space_with_lesion_context(
            latents_by_tp, burden_by_tp, groups_by_tp,
            {tp2: results[tp2]["group_labels"] for tp2 in results}, tp,
            output_dir / f"latent_space_{tp}.png")


def run_vae_cohort(tracts: Sequence[str], latent_dim: int = 10,
                   epochs: int = 40, batch_size: int = 64, lr: float = 2e-4,
                   config: Optional[Config] = None,
                   base_path: str | Path | None = None,
                   timepoints: Optional[Sequence[str]] = None,
                   output_dir: str | Path | None = None,
                   seed: int = 42, save_z: bool = False,
                   compute_dtype=None, store_dtype=None,
                   quantize_upload: bool = False,
                   upload_chunks: "int | str" = 1,
                   save_checkpoints: bool = False) -> Dict[tuple, dict]:
    """Train the whole (tract x timepoint) VAE fleet CONCURRENTLY (one
    vmapped device program, train.batched) and compute normative z-scores
    per member — the production cohort path; the reference can only train
    one VAE per invocation.

    By default the full per-streamline z-score block stays on the device and
    only summaries cross the host link (per-streamline magnitudes,
    per-subject mean-|z| profiles, normative mean/std) — at cohort scale the
    full block is ~GBs and remote D2H runs at tens of MB/s.  Pass
    ``save_z=True`` to also fetch and store the full ``Z`` per member
    (reference semantics of compute_zscore_residuals, vae_model.py:277-334;
    the single-tract :func:`run_vae_analysis` always returns full Z).

    Perf knobs (each parity-pinned, see the cited tests):
    ``compute_dtype=jnp.bfloat16`` — bf16 compute (test_mixed_precision);
    ``store_dtype=jnp.bfloat16`` — bf16 weight/moment storage with
    stochastic rounding, 1.33x per step (train.lowmem, test_lowmem);
    ``quantize_upload=True`` — uint16 fixed-point raw-tensor upload, halves
    the H2D bytes (train.quantize, test_quantize_upload);
    ``upload_chunks="auto"`` — member-chunked launch that pipelines each
    chunk's H2D upload under the previous chunk's execution
    (train.batched, test_upload_chunks).

    Returns {(tract, timepoint): {"model", "history", "magnitude",
    "subj_profiles", "subj_ids", "group_labels"[, "Z"]}}.
    """
    from ..train.batched import launch_many_vaes, pad_datasets

    config = config or load_config()
    base_path = Path(base_path) if base_path else Path(config.base_path)
    timepoints = list(timepoints if timepoints is not None else config.timepoints)
    output_dir = (Path(output_dir) if output_dir
                  else base_path / "results" / "vae_cohort")
    output_dir.mkdir(parents=True, exist_ok=True)

    groups_dict = {g: list(s) for g, s in config.subjects_by_group().items()}
    subjects = [s for subs in groups_dict.values() for s in subs]

    keys, tensors, meta = [], [], []
    with stage("vae_cohort.tensors"):
        for tract in tracts:
            for tp in timepoints:
                try:
                    Xm, Xl, subj_ids, group_labels, _s = \
                        vdata.build_tensor_with_lesion_context(
                            base_path, tract, tp, subjects,
                            config.microstructure_features,
                            config.lesion_features, groups_dict)
                except ValueError as e:
                    log.warning("%s", e)
                    continue
                # RAW tensors: normalization (fit+apply) runs inside the
                # fleet program (train.data.normalize_on_device)
                keys.append((tract, tp))
                tensors.append((Xm, Xl))
                meta.append((subj_ids, group_labels))

    if not tensors:
        log.error("no datasets for the VAE cohort")
        return {}

    with stage("vae_cohort.train"):
        Xm_all, Xl_all, n_real = pad_datasets(tensors, batch_size=batch_size)
        n_pad = Xm_all.shape[1]
        T = len(keys)
        sham_T = np.zeros((T, n_pad), np.float32)
        uniq_subj = [np.unique(s) for s, _ in meta]
        n_seg = max(len(u) for u in uniq_subj) + 1  # last segment = pad rows
        subj_idx_T = np.full((T, n_pad), n_seg - 1, np.int32)
        for i, (subj_ids, group_labels) in enumerate(meta):
            sham_T[i, :n_real[i]] = (group_labels == "Sham")
            subj_idx_T[i, :n_real[i]] = np.searchsorted(uniq_subj[i],
                                                        subj_ids)
        # normalization + training + normative summary fused into ONE
        # device program
        handle = launch_many_vaes(Xm_all, Xl_all, n_real,
                                  latent_dim=latent_dim, epochs=epochs,
                                  batch_size=batch_size, lr=lr, seed=seed,
                                  compute_dtype=compute_dtype,
                                  summary_spec=(sham_T, subj_idx_T, n_seg,
                                                seed),
                                  normalize_on_device=True,
                                  store_dtype=store_dtype,
                                  quantize_upload=quantize_upload,
                                  upload_chunks=upload_chunks)
        models, hist = handle.fetch()

    with stage("vae_cohort.normative"):
        mean_T, std_T, mag_T, prof_T, _cnt = [np.asarray(x)
                                              for x in handle.summary_T]
        Z_T = None
        if save_z:
            _m, _s, Z_T, _mag = normative_zscores_fleet(
                handle.module, handle.params_T, handle.stats_T,
                handle.Xm_j, handle.Xl_j, sham_T, seed=seed)

    results: Dict[tuple, dict] = {}
    for i, key in enumerate(keys):
        tract, tp = key
        subj_ids, group_labels = meta[i]
        n_i = int(n_real[i])
        hist_df = pd.DataFrame(hist[i], columns=["loss", "recon", "kld",
                                                 "beta"])
        hist_df.to_csv(output_dir / f"training_history_{tract}_{tp}.csv",
                       index=False)
        entry = dict(model=models[i], history=hist_df, subj_ids=subj_ids,
                     group_labels=group_labels)
        if sham_T[i].any():
            profiles = {sid: prof_T[i, j]
                        for j, sid in enumerate(uniq_subj[i])}
            payload = dict(magnitude=mag_T[i, :n_i], subj_ids=subj_ids,
                           group_labels=group_labels, norm_mean=mean_T[i],
                           norm_std=std_T[i],
                           subj_profile=prof_T[i, :len(uniq_subj[i])],
                           subj_order=uniq_subj[i])
            entry.update(magnitude=mag_T[i, :n_i], subj_profiles=profiles)
            if Z_T is not None:
                payload["Z"] = Z_T[i, :n_i]
                entry["Z"] = Z_T[i, :n_i]
            np.savez_compressed(output_dir / f"zscores_{tract}_{tp}.npz",
                                **payload)
        if save_checkpoints:
            # member checkpoint incl. its data-normalization stats — the
            # full serving bundle for pipeline.infer.score_subjects
            from ..train.checkpoint import save_vae
            member_norm = None
            if handle.norm_stats_T is not None:
                member_norm = {k: np.asarray(v[i])
                               for k, v in handle.norm_stats_T.items()}
            save_vae(output_dir / "checkpoints" / f"{tract}_{tp}",
                     models[i], norm_stats=member_norm)
        results[key] = entry

    log.info("VAE cohort complete: %d members → %s", len(results), output_dir)
    return results
