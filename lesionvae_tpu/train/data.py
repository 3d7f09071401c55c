"""VAE tensor building and normalization.

Ports of the reference's data stage:
- ``csv_path`` / ``build_tensor_with_lesion_context``
  (src/vae/data_loader.py:10-148): pivot per-subject long CSVs into
  (n_streamlines, 100, n_feats) tensors, with the reference's quirks kept —
  missing lesion features imputed identically for Sham and non-Sham
  (in_lesion/in_cavity=False, lesion_distance=15.0, :77-88), lesion_distance
  hard-coded as column 2 clipped to [0,15]/15 (:116-117), exactly 100 nodes
  required (:98-100).
- ``fit_normalization_stats`` / ``apply_normalization``
  (src/vae/normalization.py:8-69): per-feature median/mean/std over finite
  values (std floor 1e-6), median-impute, z-score, clamp ±1e6.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..utils.logging import get_logger

log = get_logger("data")


def csv_path(base_path, subject_id, tp) -> Path:
    return (Path(base_path) / "results" / str(subject_id)
            / f"timepoint_analysis_{subject_id}_{tp}"
            / f"comprehensive_tract_data_{subject_id}_{tp}.csv")


def build_tensor_with_lesion_context(
        base_path, tract: str, tp: str, subjects: Sequence,
        micro_feats: Sequence[str], lesion_feats: Sequence[str],
        groups_dict: Dict[str, List],
        csv_cache: Optional[dict] = None) -> Tuple[np.ndarray, np.ndarray,
                                                   np.ndarray, np.ndarray,
                                                   np.ndarray]:
    """Returns (X_micro, X_lesion, subj_ids, group_labels, s).

    ``csv_cache``: optional dict keyed by (subject, tp) holding the full
    profile dataframes.  Cohort-scale callers (pipeline/infer.score_cohort:
    16 tracts share each subject CSV) pass one dict across members so every
    CSV is read once instead of once per tract."""
    X_micro_list, X_lesion_list = [], []
    subj_stream_ids, group_stream_labels = [], []

    subj_to_group = {str(sid): g for g, subs in groups_dict.items()
                     for sid in subs}

    df = None
    for sid in subjects:
        fp = csv_path(base_path, sid, tp)
        ckey = (str(sid), str(tp))
        if csv_cache is not None and ckey in csv_cache:
            df_full = csv_cache[ckey]
            if df_full is None:  # negative cache: file known missing
                log.warning("missing %s", fp)
                continue
        elif not fp.exists():
            if csv_cache is not None:
                csv_cache[ckey] = None
            log.warning("missing %s", fp)
            continue
        else:
            df_full = pd.read_csv(fp)
            if csv_cache is not None:
                csv_cache[ckey] = df_full
        df = df_full[df_full["tract_id"] == tract].copy()
        if df.empty:
            continue

        missing_micro = [c for c in micro_feats if c not in df.columns]
        if missing_micro:
            log.warning("missing microstructure features in %s: %s",
                        fp, missing_micro)
            continue

        subject_group = subj_to_group[str(sid)]
        for lf in lesion_feats:
            if lf not in df.columns:
                # imputation is identical for Sham and lesioned groups
                # (data_loader.py:79-88)
                if lf in ("in_lesion", "in_cavity"):
                    df[lf] = False
                elif lf == "lesion_distance":
                    df[lf] = 15.0
                if subject_group != "Sham" and tp in ("2d", "9d"):
                    log.info("%s (%s) @ %s: lesion data may be minimal "
                             "(acute phase)", sid, subject_group, tp)

        df.sort_values(["streamline_id", "point_id"], inplace=True)
        stream_ids = sorted(df["streamline_id"].unique())
        nodes = sorted(df["point_id"].unique())
        if len(nodes) != 100:
            log.warning("%s has %d nodes, expected 100", fp, len(nodes))
            continue

        wide_micro = df.pivot(index="point_id", columns="streamline_id",
                              values=list(micro_feats))
        wide_lesion = df.pivot(index="point_id", columns="streamline_id",
                               values=list(lesion_feats))
        for s_id in stream_ids:
            mat_micro = wide_micro.xs(s_id, axis=1, level=1).reindex(nodes)
            mat_lesion = wide_lesion.xs(s_id, axis=1, level=1).reindex(nodes)
            lesion_vals = mat_lesion.values.astype(np.float32)
            lesion_vals[:, 2] = np.clip(lesion_vals[:, 2], 0, 15) / 15.0
            X_micro_list.append(mat_micro.values.astype(np.float32))
            X_lesion_list.append(lesion_vals)
            subj_stream_ids.append(sid)
            group_stream_labels.append(subject_group)

    if not X_micro_list:
        raise ValueError(f"No data for {tract} @ {tp}")

    X_micro = np.stack(X_micro_list, axis=0)
    X_lesion = np.stack(X_lesion_list, axis=0)
    subj_ids = np.array(subj_stream_ids)
    group_labels = np.array(group_stream_labels)

    s_vals = df["position_along_tract"].unique()
    s = (np.linspace(0, 1, 100) if len(s_vals) != 100
         else np.sort(s_vals.astype(float)))

    log.info("%s@%s: X_micro=%s, X_lesion=%s", tract, tp, X_micro.shape,
             X_lesion.shape)
    return X_micro, X_lesion, subj_ids, group_labels, s


def fit_normalization_stats(X_micro: np.ndarray, X_lesion: np.ndarray,
                            feat_names: Sequence[str]) -> Dict[str, np.ndarray]:
    """Per-feature median/mean/std over finite values (normalization.py:8-40)."""
    X = X_micro.reshape(-1, X_micro.shape[-1])
    finite = np.isfinite(X)
    if finite.all():
        # fast path (typical: upstream tensor builders already impute):
        # columnwise stats without per-feature boolean gathers.  Accumulate
        # in float32 like the slow path's np.nanmean/np.nanstd-on-float32 so
        # a single NaN flipping which path runs cannot shift the stats by an
        # accumulation-dtype ulp (ADVICE r2)
        meds = np.median(X, axis=0).astype(np.float32)
        mus = X.mean(axis=0).astype(np.float32)
        stds = np.maximum(X.std(axis=0), 1e-6).astype(np.float32)
        return {"median": meds, "mean": mus, "std": stds}
    meds = np.zeros(X.shape[1], np.float32)
    mus = np.zeros(X.shape[1], np.float32)
    stds = np.ones(X.shape[1], np.float32)
    for j in range(X.shape[1]):
        xj = X[finite[:, j], j]
        if xj.size:
            meds[j] = np.nanmedian(xj)
            mus[j] = np.nanmean(xj)
            stds[j] = max(float(np.nanstd(xj)), 1e-6)
        else:
            meds[j] = mus[j] = 0.0
            stds[j] = 1.0
    return {"median": meds, "mean": mus, "std": stds}


def apply_normalization(X_micro: np.ndarray, X_lesion: np.ndarray,
                        stats: Dict[str, np.ndarray]
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Median-impute non-finite, z-score, clamp ±1e6 (normalization.py:43-69).

    Pass-efficient: one output allocation and in-place arithmetic (the
    reference chains 4 full-array temporaries; on the 1-core bench host this
    stage is in the timed window)."""
    Xz = np.array(X_micro, np.float32, copy=True)
    med = stats["median"][None, None, :]
    bad = ~np.isfinite(Xz)
    if bad.any():
        Xz[bad] = np.broadcast_to(med, Xz.shape)[bad]
    Xz -= stats["mean"][None, None, :]
    Xz /= stats["std"][None, None, :]
    # post-imputation entries are finite, so the reference's
    # nan_to_num(nan=0, ±1e6) reduces to the ±1e6 clamp
    np.clip(Xz, -1e6, 1e6, out=Xz)
    if np.isfinite(X_lesion).all():
        X_lesion = np.asarray(X_lesion, np.float32)
    else:
        X_lesion = np.nan_to_num(X_lesion, nan=0.0).astype(np.float32)
    return Xz, X_lesion


def normalize_on_device(Xm_i, Xl_i, n_i):
    """Traceable fit+apply normalization for one padded fleet member.

    JAX twin of :func:`fit_normalization_stats` + :func:`apply_normalization`
    (reference: normalization.py:8-69) over the REAL rows (< ``n_i``) of a
    padded ``(n_pad, L, C)`` block: per-feature median/mean/std over finite
    values, median-impute non-finite, z-score, clamp ±1e6.  Runs inside the
    fleet training program (train.batched ``normalize_on_device=True``) so
    the raw tensors upload once and the whole reference data-prep stage
    stays on the TPU.  np.median semantics (mean of the two middle order
    statistics) are reproduced via a masked sort.

    Returns ``(Xz, Xl, stats)`` with ``stats = {"median","mean","std"}``.
    """
    import jax.numpy as jnp

    n_pad, L, C = Xm_i.shape
    X = Xm_i.reshape(-1, C)
    row_real = (jnp.arange(n_pad) < n_i)
    valid = jnp.repeat(row_real, L)[:, None] & jnp.isfinite(X)
    cnt = jnp.maximum(jnp.sum(valid, axis=0), 1)

    Xz0 = jnp.where(valid, X, 0.0)
    mean = jnp.sum(Xz0, axis=0) / cnt
    var = jnp.sum(jnp.where(valid, (X - mean) ** 2, 0.0), axis=0) / cnt
    std = jnp.maximum(jnp.sqrt(var), 1e-6)

    # median over valid entries: invalid -> +inf sorts to the tail
    Xs = jnp.sort(jnp.where(valid, X, jnp.inf), axis=0)
    m1 = jnp.take_along_axis(Xs, ((cnt - 1) // 2)[None, :], axis=0)[0]
    m2 = jnp.take_along_axis(Xs, (cnt // 2)[None, :], axis=0)[0]
    med = 0.5 * (m1 + m2)

    # columns with ZERO finite entries: the reference's else-branch
    # (normalization.py:35-38) and fit_normalization_stats fall back to
    # median=mean=0, std=1 (not the +inf median / 1e-6 floor the masked
    # reductions would produce) so imputed entries z-score to exactly 0
    any_valid = jnp.sum(valid, axis=0) > 0
    med = jnp.where(any_valid, med, 0.0)
    mean = jnp.where(any_valid, mean, 0.0)
    std = jnp.where(any_valid, std, 1.0)

    stats = {"median": med, "mean": mean, "std": std}
    Xz, Xl = apply_normalization_device(Xm_i, Xl_i, stats)
    return Xz, Xl, stats


def apply_normalization_device(Xm_i, Xl_i, stats):
    """Traceable APPLY-only twin of :func:`apply_normalization` with given
    stats (median-impute non-finite, z-score, clamp ±1e6; reference
    normalization.py:43-69).  The one definition shared by the in-program
    fit+apply (:func:`normalize_on_device`) and batch serving
    (pipeline.infer.score_cohort, which applies CHECKPOINTED stats)."""
    import jax.numpy as jnp

    med = stats["median"]
    fin = jnp.isfinite(Xm_i)
    Xc = jnp.where(fin, Xm_i, med[None, None, :])
    Xz = jnp.clip((Xc - stats["mean"][None, None, :])
                  / stats["std"][None, None, :], -1e6, 1e6)
    Xl = jnp.nan_to_num(Xl_i, nan=0.0)
    return Xz, Xl
