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
