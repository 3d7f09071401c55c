"""Pin the adaptive CV-fold cap — the documented deviation from the
reference's unconditional StratifiedKFold(10) (classification.py:131).

train_models_with_cv caps folds at the minority-class count so tiny cohorts
degrade gracefully instead of raising (pipeline/classification.py).  The
golden-value suite (test_analysis_golden.py) only exercises the exact-10-fold
path; this pins the capped branch's actual metrics at a fixed seed, so the
deviation's behavior is under test too (VERDICT r3 #8).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lesionvae_tpu.pipeline.classification import train_models_with_cv


def _tiny_cohort(n_maj=9, n_min=4, n_feat=6, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_maj + n_min, n_feat))
    y = np.array([0] * n_maj + [1] * n_min)
    X[y == 1, :2] += 1.5  # separable-ish signal
    return X, y


def test_fold_cap_engages_and_metrics_are_pinned(caplog):
    import logging

    X, y = _tiny_cohort()
    # the package logger sets propagate=False (utils/logging.py), so attach
    # caplog's handler directly to observe the fold-cap warning
    pkg_logger = logging.getLogger("lesionvae_tpu.classify")
    pkg_logger.addHandler(caplog.handler)
    try:
        results, _scaler = train_models_with_cv(X, y, random_state=42)
    finally:
        pkg_logger.removeHandler(caplog.handler)
    assert any("reducing CV folds to 4" in r.getMessage()
               for r in caplog.records)

    # all three reference models ran through the capped CV
    assert set(results) == {"Random Forest", "SVM", "Elastic Net"}
    for name, res in results.items():
        assert res["confusion_matrix"].sum() == len(y)
        assert 0.0 <= res["auc"] <= 1.0

    # golden pins (sklearn is deterministic at fixed random_state; drift
    # here is a real behavior change in the capped branch)
    golden = {"Random Forest": (1.0, 1.0),
              "SVM": (12 / 13, 0.52778),
              "Elastic Net": (1.0, 1.0)}
    for name, (acc, auc) in golden.items():
        assert results[name]["accuracy"] == pytest.approx(acc, abs=1e-4), name
        assert results[name]["auc"] == pytest.approx(auc, abs=1e-4), name


def test_minimum_two_folds_floor():
    # minority class of 2 → folds cap all the way down to the floor of 2 and
    # the stage completes rather than raising
    X, y = _tiny_cohort(n_maj=6, n_min=2)
    results, _ = train_models_with_cv(X, y, random_state=42)
    assert set(results) == {"Random Forest", "SVM", "Elastic Net"}
    for res in results.values():
        assert np.isfinite(res["accuracy"])
