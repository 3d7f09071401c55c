"""Classification + correlation stage tests on synthetic feature CSVs,
including a hand-rolled-sklearn parity check for the CV metrics."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from lesionvae_tpu.pipeline import classification as clf
from lesionvae_tpu.pipeline import correlation as corr


def _synth_geometry_csv(path: Path, seed=0, n_tbi=10, n_pte=8):
    """Geometry-schema CSV with a separable signal between groups."""
    rng = np.random.default_rng(seed)
    rows = []
    feature_cols = ["n_streamlines", "length_mean", "tortuosity_mean",
                    "curv_mean_avg", "curv_energy_mean", "torsion_mean_avg",
                    "bend_angle_mean_avg", "elongation_ratio_mean",
                    "planarity_ratio_mean", "anisotropy_ratio_mean",
                    "ang_dispersion_mean"]
    for group, n, shift in (("TBI", n_tbi, 0.0), ("PTE", n_pte, 1.5)):
        for i in range(n):
            sid = (2000 if group == "TBI" else 3000) + i
            for tp in ["2d", "9d", "1mo", "5mo"]:
                for tract in ["atr_left", "atr_right"]:
                    row = {"subject_id": sid, "timepoint": tp, "tract": tract,
                           "group": group}
                    for j, col in enumerate(feature_cols):
                        row[col] = rng.normal() + shift * (j % 3 == 0)
                    row["centroid_x_mean"] = rng.normal() + (0.5 if tp != "2d" else 0)
                    row["centroid_y_mean"] = rng.normal()
                    row["centroid_z_mean"] = rng.normal()
                    rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df, feature_cols


def _synth_lesion_csv(path: Path, geometry_df: pd.DataFrame, seed=1):
    rng = np.random.default_rng(seed)
    rows = []
    for (sid, group), _ in geometry_df.groupby(["subject_id", "group"]):
        for tp in ["2d", "9d", "1mo", "5mo"]:
            P = rng.dirichlet(np.ones(7))
            rows.append({
                "subject_id": sid, "timepoint": tp, "group": group,
                **{f"P{l}": P[l] for l in range(7)},
                "original_volume_mm3": rng.uniform(1, 30),
                "lesion_brain_ratio": rng.uniform(0, 0.05),
                "brain_volume_mm3": rng.uniform(400, 600),
            })
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df


@pytest.mark.slow  # 3 models x 10-fold CV x 4 timepoints on one core
def test_classification_stage(tmp_path):
    csv = tmp_path / "geom.csv"
    _synth_geometry_csv(csv)
    out = tmp_path / "out"
    summary = clf.run_classification(csv, out, make_plots=True)
    assert len(summary) == 4 * 3  # 4 timepoints x 3 models
    assert set(summary["model"]) == {"Random Forest", "SVM", "Elastic Net"}
    assert ((summary["auc"] >= 0) & (summary["auc"] <= 1)).all()
    # the synthetic signal is separable → RF should beat chance comfortably
    rf = summary[summary["model"] == "Random Forest"]
    assert rf["auc"].mean() > 0.8
    assert (out / "classification_summary.csv").exists()
    assert (out / "classification_results_9d.png").exists()
    assert (out / "top_predictors_9d.png").exists()
    assert (out / "temporal_trends_tbi_vs_pte.png").exists()
    assert (out / "centroid_displacement_data.csv").exists()
    assert (out / "centroid_displacement_analysis.png").exists()


def test_classification_matches_plain_sklearn(tmp_path):
    """Our stage wraps sklearn; re-derive RF CV predictions by hand and
    compare metrics exactly (same seeds ⇒ same folds ⇒ same numbers)."""
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.impute import SimpleImputer
    from sklearn.metrics import accuracy_score, roc_auc_score
    from sklearn.model_selection import StratifiedKFold, cross_val_predict
    from sklearn.preprocessing import StandardScaler
    from sklearn.utils.class_weight import compute_class_weight

    csv = tmp_path / "geom.csv"
    # >=10 per class so the adaptive fold cap stays at the reference's 10
    df, feature_cols = _synth_geometry_csv(csv, seed=5, n_tbi=12, n_pte=10)
    data = clf.load_and_prepare_data(csv)
    fcols = clf.get_feature_columns(data)
    subj = clf.aggregate_features_per_subject(data, "9d", fcols)
    X, y = subj[fcols].values, subj["group_binary"].values
    results, _ = clf.train_models_with_cv(X, y)

    Xs = StandardScaler().fit_transform(
        SimpleImputer(strategy="mean").fit_transform(X))
    w = compute_class_weight("balanced", classes=np.unique(y), y=y)
    rf = RandomForestClassifier(n_estimators=100, max_depth=5,
                                class_weight={0: w[0], 1: w[1]},
                                random_state=42, n_jobs=-1)
    cv = StratifiedKFold(n_splits=10, shuffle=True, random_state=42)
    y_pred = cross_val_predict(rf, Xs, y, cv=cv, n_jobs=-1)
    proba = cross_val_predict(rf, Xs, y, cv=cv, method="predict_proba",
                              n_jobs=-1)
    assert results["Random Forest"]["accuracy"] == pytest.approx(
        accuracy_score(y, y_pred))
    assert results["Random Forest"]["auc"] == pytest.approx(
        roc_auc_score(y, proba[:, 1]))


def test_centroid_displacement_zero_at_baseline(tmp_path):
    csv = tmp_path / "geom.csv"
    _synth_geometry_csv(csv, seed=2)
    df = clf.load_and_prepare_data(csv)
    disp = clf.analyze_centroid_displacement(df, tmp_path / "disp")
    base = disp[disp["timepoint"] == "2d"]
    np.testing.assert_allclose(base["displacement_mm"], 0.0, atol=1e-12)
    assert {"dx", "dy", "dz"}.issubset(disp.columns)


def test_correlation_stage(tmp_path):
    gcsv = tmp_path / "geom.csv"
    gdf, _ = _synth_geometry_csv(gcsv, seed=3)
    lcsv = tmp_path / "lesion.csv"
    _synth_lesion_csv(lcsv, gdf, seed=3)
    out = tmp_path / "corr"
    df_sig = corr.run_correlation(lcsv, gcsv, out, make_plots=True)
    assert (out / "significant_correlations.csv").exists() or len(df_sig) == 0
    if len(df_sig):
        assert set(df_sig.columns) == {"group", "timepoint", "sh_feature",
                                       "tract_feature", "r", "p", "n"}
        assert (df_sig["p"] < 0.05).all()
        # scipy oracle re-check of one reported correlation
        from scipy.stats import pearsonr
        merged = corr.merge_lesion_tract_data(*corr.load_data(lcsv, gcsv))
        row = df_sig.iloc[0]
        sub = merged[(merged["group"] == row["group"])
                     & (merged["timepoint"] == row["timepoint"])]
        x = sub[row["sh_feature"]].astype(float)
        y = sub[row["tract_feature"]].astype(float)
        ok = ~(x.isna() | y.isna())
        r, p = pearsonr(x[ok], y[ok])
        assert row["r"] == pytest.approx(r)
        assert row["p"] == pytest.approx(p)


def test_correlation_strong_signal_detected(tmp_path):
    """Inject a perfect P2 ↔ length_mean correlation; it must be reported."""
    rng = np.random.default_rng(9)
    rows_l, rows_g = [], []
    for i in range(12):
        sid = 5000 + i
        p2 = rng.uniform(0, 1)
        rows_l.append({"subject_id": sid, "timepoint": "1mo", "group": "TBI",
                       **{f"P{l}": (p2 if l == 2 else 0.1) for l in range(7)},
                       "original_volume_mm3": 1.0, "lesion_brain_ratio": 0.01,
                       "brain_volume_mm3": 500.0})
        rows_g.append({"subject_id": sid, "timepoint": "1mo", "group": "TBI",
                       "tract": "atr_left", "n_streamlines": 10,
                       "length_mean": 2.0 + 3.0 * p2,
                       "tortuosity_mean": rng.normal(),
                       "curv_mean_avg": rng.normal(),
                       "curv_energy_mean": rng.normal(),
                       "torsion_mean_avg": rng.normal(),
                       "bend_angle_mean_avg": rng.normal(),
                       "elongation_ratio_mean": rng.normal(),
                       "planarity_ratio_mean": rng.normal(),
                       "anisotropy_ratio_mean": rng.normal(),
                       "ang_dispersion_mean": rng.normal()})
    lcsv, gcsv = tmp_path / "l.csv", tmp_path / "g.csv"
    pd.DataFrame(rows_l).to_csv(lcsv, index=False)
    pd.DataFrame(rows_g).to_csv(gcsv, index=False)
    df_sig = corr.run_correlation(lcsv, gcsv, tmp_path / "out",
                                  make_plots=False)
    hit = df_sig[(df_sig["sh_feature"] == "P2")
                 & (df_sig["tract_feature"] == "length_mean")]
    assert len(hit) == 1
    assert hit.iloc[0]["r"] == pytest.approx(1.0, abs=1e-9)
