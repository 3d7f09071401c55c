"""Batch inference / serving: z-score new subjects with a trained model.

Production deployment path: train once (pipeline/vae_run.py), checkpoint
(train/checkpoint.py), then score incoming subject profile CSVs against the
frozen normative model without retraining — a capability the reference lacks
entirely (it never persists the model, SURVEY.md §5.4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from ..core.config import Config, load_config
from ..train import data as vdata
from ..train.checkpoint import load_vae
from ..train.normative import compute_zscore_residuals
from ..utils.logging import get_logger

log = get_logger("infer")


def score_subjects(checkpoint_dir: str | Path,
                   norm_mean: np.ndarray, norm_std: np.ndarray,
                   base_path: str | Path, tract: str, timepoint: str,
                   subjects: Sequence, config: Optional[Config] = None,
                   seed: int = 0) -> pd.DataFrame:
    """Z-score deviation magnitudes for new subjects.

    Loads the checkpointed VAE (+ stored normalization stats), builds tensors
    from the subjects' profile CSVs, and returns one row per streamline with
    subject id, group and deviation magnitude, plus per-subject means.
    """
    config = config or load_config()
    model, norm_stats = load_vae(checkpoint_dir)
    if norm_stats is None:
        raise ValueError(f"{checkpoint_dir} lacks normalization stats; "
                         "save_vae(..., norm_stats=...) when training")

    groups_dict = {g: list(s) for g, s in config.subjects_by_group().items()}
    Xm, Xl, subj_ids, group_labels, _s = vdata.build_tensor_with_lesion_context(
        base_path, tract, timepoint, subjects,
        config.microstructure_features, config.lesion_features, groups_dict)
    Xz, Xl = vdata.apply_normalization(Xm, Xl, norm_stats)

    Z, magnitude = compute_zscore_residuals(model, Xz, Xl, norm_mean,
                                            norm_std, seed=seed)
    df = pd.DataFrame({
        "subject_id": subj_ids,
        "group": group_labels,
        "z_magnitude": magnitude,
    })
    summary = (df.groupby(["subject_id", "group"])["z_magnitude"]
               .agg(["mean", "std", "max", "count"]).reset_index())
    log.info("scored %d streamlines across %d subjects for %s@%s",
             len(df), summary.shape[0], tract, timepoint)
    return summary


def load_normative(npz_path: str | Path) -> Dict[str, np.ndarray]:
    """Load the normative statistics emitted by run_vae_analysis
    (zscores_{tp}.npz: norm_mean / norm_std)."""
    z = np.load(npz_path, allow_pickle=True)
    return {"mean": z["norm_mean"], "std": z["norm_std"]}


def score_cohort(cohort_dir: str | Path, base_path: str | Path,
                 subjects: Sequence, config: Optional[Config] = None,
                 keys: Optional[Sequence] = None, seed: int = 0,
                 output_dir: str | Path | None = None,
                 mesh=None) -> pd.DataFrame:
    """Score a whole cohort of checkpointed members as ONE device program.

    Mirrors the fleet trainer's design for serving (SURVEY.md §5.7: batch
    the whole cohort into single dispatches): every ``(tract, timepoint)``
    member under ``cohort_dir/checkpoints`` — the layout
    ``run_vae_cohort(save_checkpoints=True)`` writes, with its normative
    ``zscores_{tract}_{tp}.npz`` sibling — is loaded, the subjects' tensors
    are padded into one ``(T, n_pad, L, C)`` block, and normalization
    (checkpointed per-member stats), eval-mode reconstruction, and the
    z-score magnitude all run in one vmapped jit.  ``score_subjects``
    dispatches one program per member; at cohort scale (64 members) this is
    one dispatch total.

    Returns one summary row per (tract, timepoint, subject): mean/std/max/
    count of per-streamline z magnitudes; also writes ``cohort_scores.csv``
    when ``output_dir`` is given.

    ``mesh``: optional jax.sharding.Mesh — shard the member axis over the
    mesh's ``data`` axis via shard_map (members are independent, so the
    partitioned program has zero collectives; same design as the fleet
    trainer, train/batched._fleet_program).  Falls back to single-device
    when T doesn't tile the axis.
    """
    import jax
    import jax.numpy as jnp

    config = config or load_config()
    cohort_dir = Path(cohort_dir)
    ckpt_root = cohort_dir / "checkpoints"
    if keys is None:
        keys = []
        if ckpt_root.is_dir():
            for d in sorted(ckpt_root.iterdir()):
                # member dirs are named <tract>_<timepoint>; anything else
                # (temp dirs, stray files) is not a checkpoint
                if d.is_dir() and "_" in d.name:
                    tract, tp = d.name.rsplit("_", 1)
                    keys.append((tract, tp))
    if not keys:
        raise ValueError(
            f"no member checkpoints under {ckpt_root} — run the fleet with "
            "checkpointing first (run_vae_cohort(save_checkpoints=True); "
            "CLI: vae-cohort --save-checkpoints)")

    groups_dict = {g: list(s) for g, s in config.subjects_by_group().items()}
    members, tensors = [], []
    module = None
    # all member restores at once: one shared template + thread-pooled IO
    # (serial load_vae x64 was the cohort-scale bottleneck, VERDICT r3 #7)
    from ..train.checkpoint import load_vae_many
    restored = load_vae_many([ckpt_root / f"{t}_{tp}" for t, tp in keys])
    csv_cache: dict = {}  # (subject, tp) -> profile df, shared across tracts
    for (tract, tp), member in zip(keys, restored):
        if isinstance(member, Exception):
            # skip-and-continue doctrine (SURVEY §5.3): an interrupted save
            # or stray underscore-named dir must not abort the whole cohort
            log.warning("skipping %s@%s: unreadable checkpoint (%s)",
                        tract, tp, member)
            continue
        model, norm_stats = member
        if norm_stats is None:
            raise ValueError(f"{tract}_{tp} checkpoint lacks norm stats")
        if module is None:
            module = model.module
        elif (module.seq_len, module.micro_ch, module.lesion_ch,
              module.latent) != (model.module.seq_len, model.module.micro_ch,
                                 model.module.lesion_ch, model.module.latent):
            raise ValueError("cohort members have mismatched architectures")
        npz = cohort_dir / f"zscores_{tract}_{tp}.npz"
        if not npz.exists():
            # run_vae_cohort only writes normative stats for members with
            # at least one Sham row — skip, don't abort the whole cohort
            log.warning("skipping %s@%s: no normative stats (%s)", tract,
                        tp, npz.name)
            continue
        norm = load_normative(npz)
        try:
            Xm, Xl, sids, glabels, _ = vdata.build_tensor_with_lesion_context(
                base_path, tract, tp, subjects,
                config.microstructure_features, config.lesion_features,
                groups_dict, csv_cache=csv_cache)
        except ValueError as e:   # no data for this member -> skip
            log.warning("skipping %s@%s: %s", tract, tp, e)
            continue
        members.append(dict(tract=tract, tp=tp, model=model,
                            norm_stats=norm_stats, norm=norm, sids=sids,
                            groups=glabels))
        tensors.append((Xm, Xl))
    empty_cols = ["tract", "timepoint", "subject_id", "group", "mean",
                  "std", "max", "count"]
    if not members:
        out = pd.DataFrame(columns=empty_cols)
        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            out.to_csv(output_dir / "cohort_scores.csv", index=False)
        log.warning("score_cohort: no scoreable members")
        return out

    # the ONE padding contract (train.batched.pad_datasets); batch_size=1
    # pads to the max member row count exactly
    from ..train.batched import pad_datasets
    Xm_T, Xl_T, n_real = pad_datasets(tensors, batch_size=1)
    T = len(members)

    stack = lambda xs: jax.tree.map(  # noqa: E731
        lambda *a: jnp.stack([jnp.asarray(x) for x in a]), *xs)
    params_T = stack([m["model"].params for m in members])
    stats_T = stack([m["model"].batch_stats for m in members])
    med_T = jnp.asarray(np.stack([m["norm_stats"]["median"]
                                  for m in members]))
    mean_T = jnp.asarray(np.stack([m["norm_stats"]["mean"]
                                   for m in members]))
    std_T = jnp.asarray(np.stack([m["norm_stats"]["std"] for m in members]))
    nm_T = jnp.asarray(np.stack([m["norm"]["mean"] for m in members]))
    ns_T = jnp.asarray(np.stack([m["norm"]["std"] for m in members]))

    mod = module

    from ..train.data import apply_normalization_device
    from ..train.normative import z_residual

    def score_one(p, s, med, mean, std, nm, ns, Xm_i, Xl_i, key):
        # checkpointed normalization stats, applied on device — the SAME
        # traceable helpers as training (train.data / train.normative), so
        # serving cannot silently diverge from the training-side semantics
        Xz, Xl_i = apply_normalization_device(
            Xm_i, Xl_i, {"median": med, "mean": mean, "std": std})
        xh, _, _ = mod.apply({"params": p, "batch_stats": s}, Xz, Xl_i,
                             key, None, False)
        z = z_residual(Xz, xh, nm, ns)
        return jnp.sqrt(jnp.mean(z ** 2, axis=(1, 2)))

    score_one.__name__ = "score_fleet"  # trace attribution (device_trace)
    mapped = jax.vmap(score_one)
    args = (params_T, stats_T, med_T, mean_T, std_T, nm_T, ns_T,
            jnp.asarray(Xm_T), jnp.asarray(Xl_T),
            jax.random.split(jax.random.PRNGKey(seed), T))
    if mesh is not None and T % mesh.shape["data"] == 0:
        import functools as _ft

        from jax.sharding import NamedSharding, PartitionSpec as PSpec
        try:
            from jax import shard_map as _sm
            _smap = _ft.partial(_sm, check_vma=False)
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map as _sm
            _smap = _ft.partial(_sm, check_rep=False)
        mapped = _smap(mapped, mesh=mesh, in_specs=PSpec("data"),
                       out_specs=PSpec("data"))
        member_sh = NamedSharding(mesh, PSpec("data"))
        args = tuple(jax.device_put(a, member_sh) for a in args)
    elif mesh is not None:
        log.warning("score_cohort: %d members don't tile the mesh's data "
                    "axis (%d); scoring single-device", T,
                    mesh.shape["data"])
    mags = np.asarray(jax.jit(mapped)(*args))

    rows = []
    for i, m in enumerate(members):
        df = pd.DataFrame({"subject_id": m["sids"], "group": m["groups"],
                           "z_magnitude": mags[i, :n_real[i]]})
        summ = (df.groupby(["subject_id", "group"])["z_magnitude"]
                .agg(["mean", "std", "max", "count"]).reset_index())
        summ.insert(0, "tract", m["tract"])
        summ.insert(1, "timepoint", m["tp"])
        rows.append(summ)
    out = pd.concat(rows, ignore_index=True)
    log.info("scored %d members x %d subjects in one program",
             T, out["subject_id"].nunique())
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        out.to_csv(output_dir / "cohort_scores.csv", index=False)
    return out
