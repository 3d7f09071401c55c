"""Golden-value parity pins for the classification + correlation stages.

BASELINE.md's last parity row ("ROC/AUC and significant-correlation tables
match when fed identical feature CSVs") was previously argued structurally —
same sklearn estimators, same hyperparameters, seed 42
(reference: src/analysis/classification.py:94-208, correlation.py:141-183).
These tests pin the ACTUAL numbers: a frozen synthetic geometry CSV + lesion
CSV (deterministic rng, written fresh each run) flows through the full
stages and every accuracy/AUC/sensitivity/specificity and every significant
(group, timepoint, sh_feature, tract_feature, r, p, n) row must equal the
values recorded below.  sklearn/scipy are deterministic at fixed seeds, so
any drift here is a real behavior change in the stage, not noise.

The fixture cohort uses 18 TBI / 12 PTE so StratifiedKFold keeps the
reference's exact 10 folds (classification.py:131) — the adaptive fold cap
(a documented graceful-degradation deviation) stays un-exercised.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TIMEPOINTS = ["2d", "9d", "1mo", "5mo"]
TRACTS = ["atr_left", "atr_right", "fimbria_left", "fimbria_right"]
GEO_FEATURES = [
    "n_streamlines", "length_mean", "tortuosity_mean", "curv_mean_avg",
    "curv_energy_mean", "torsion_mean_avg", "bend_angle_mean_avg",
    "elongation_ratio_mean", "planarity_ratio_mean", "anisotropy_ratio_mean",
    "ang_dispersion_mean"]


def _make_cohort_csvs(root: Path):
    """Deterministic synthetic geometry + lesion CSVs with group-dependent
    signal (PTE shifts a few features so the classifiers have something to
    find, like the real cohort would)."""
    rng = np.random.default_rng(12345)
    subjects = ([(f"TBI_{i:02d}", "TBI") for i in range(18)]
                + [(f"PTE_{i:02d}", "PTE") for i in range(12)])

    geo_rows = []
    for sid, group in subjects:
        subj_shift = rng.normal(0, 0.3)
        for ti, tp in enumerate(TIMEPOINTS):
            for tract in TRACTS:
                pte = 1.0 if group == "PTE" else 0.0
                base = {
                    "n_streamlines": int(rng.integers(40, 100)),
                    "length_mean": 22 + 0.6 * pte + subj_shift
                    + rng.normal(0, 1.5),
                    "tortuosity_mean": 1.15 + 0.02 * pte * ti / 3
                    + rng.normal(0, 0.04),
                    "curv_mean_avg": 0.30 + 0.015 * pte + rng.normal(0, 0.05),
                    "curv_energy_mean": 1.8 + rng.normal(0, 0.4),
                    "torsion_mean_avg": rng.normal(0, 0.02),
                    "bend_angle_mean_avg": 0.12 + 0.008 * pte
                    + rng.normal(0, 0.02),
                    "elongation_ratio_mean": 8.0 + rng.normal(0, 2.0),
                    "planarity_ratio_mean": 3.0 + rng.normal(0, 0.8),
                    "anisotropy_ratio_mean": 0.8 + rng.normal(0, 0.05),
                    "ang_dispersion_mean": 0.25 + 0.02 * pte
                    + rng.normal(0, 0.05),
                    "centroid_x_mean": rng.normal(0, 2),
                    "centroid_y_mean": rng.normal(0, 2),
                    "centroid_z_mean": ti * (0.3 + 0.3 * pte)
                    + rng.normal(0, 0.5),
                }
                base.update(subject_id=sid, timepoint=tp, tract=tract,
                            group=group)
                geo_rows.append(base)
    # NOTE: no inf values here on purpose — sklearn's input validation
    # raises on inf in BOTH this stage and the reference
    # (classification.py:136-142 feeds SimpleImputer/StandardScaler, which
    # reject inf), so inf-bearing features reaching classification is a
    # crash in either implementation; real cohorts keep PCA denominators
    # above the 1e-12 gate.  The f32/f64 inf-pattern parity of the GEOMETRY
    # stage is pinned separately in test_geometry_inf_stability.py.
    geo = pd.DataFrame(geo_rows)
    geo_csv = root / "geometry.csv"
    geo.to_csv(geo_csv, index=False)

    les_rows = []
    for sid, group in subjects:
        pte = 1.0 if group == "PTE" else 0.0
        vol0 = float(rng.uniform(5, 40) * (1 + pte))
        for ti, tp in enumerate(TIMEPOINTS):
            P = rng.dirichlet(np.ones(7) * (2 + 3 * pte))
            brain = float(rng.uniform(420, 520))
            vol = vol0 * (1 + 0.2 * ti)
            les_rows.append({
                "subject_id": sid, "timepoint": tp,
                "original_volume_mm3": vol, "brain_volume_mm3": brain,
                "lesion_brain_ratio": vol / brain,
                **{f"P{l}": P[l] for l in range(7)},
                "group": group})
    les = pd.DataFrame(les_rows)
    les_csv = root / "lesion.csv"
    les.to_csv(les_csv, index=False)
    return geo_csv, les_csv


@pytest.fixture(scope="module")
def cohort_csvs(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    return _make_cohort_csvs(root)


# ---------------------------------------------------------------------------
# pinned values — computed once from the frozen fixture (seed 12345) and the
# stages as shipped; regenerate by running this module with
# LESIONVAE_PRINT_GOLDEN=1 and pasting the output
# ---------------------------------------------------------------------------

CLASSIFICATION_GOLDEN = {
    # (timepoint, model): (accuracy, auc, sensitivity, specificity)
    ("2d", "Random Forest"): (0.666667, 0.694444, 0.500000, 0.777778),
    ("2d", "SVM"): (0.666667, 0.673611, 0.666667, 0.666667),
    ("2d", "Elastic Net"): (0.666667, 0.745370, 0.416667, 0.833333),
    ("9d", "Random Forest"): (0.733333, 0.724537, 0.583333, 0.833333),
    ("9d", "SVM"): (0.733333, 0.805556, 0.583333, 0.833333),
    ("9d", "Elastic Net"): (0.700000, 0.740741, 0.583333, 0.777778),
    ("1mo", "Random Forest"): (0.600000, 0.548611, 0.416667, 0.722222),
    ("1mo", "SVM"): (0.666667, 0.620370, 0.666667, 0.666667),
    ("1mo", "Elastic Net"): (0.733333, 0.763889, 0.583333, 0.833333),
    ("5mo", "Random Forest"): (0.800000, 0.875000, 0.833333, 0.777778),
    ("5mo", "SVM"): (0.766667, 0.884259, 0.666667, 0.833333),
    ("5mo", "Elastic Net"): (0.733333, 0.828704, 0.750000, 0.722222),
}

CORRELATION_GOLDEN = [
    # (group, timepoint, sh_feature, tract_feature, r, p, n)
    ("TBI", "9d", "P4", "curv_mean_avg", -0.482776, 0.042425, 18),
    ("TBI", "9d", "P5", "torsion_mean_avg", -0.472518, 0.047686, 18),
    ("TBI", "9d", "lesion_volume", "n_streamlines", 0.578386, 0.011920, 18),
    ("TBI", "9d", "lesion_brain_ratio", "n_streamlines", 0.605209, 0.007784, 18),
    ("PTE", "9d", "P3", "ang_dispersion_mean", 0.576974, 0.049515, 12),
    ("PTE", "9d", "lesion_volume", "elongation_ratio_mean", 0.742204, 0.005706, 12),
    ("PTE", "9d", "lesion_volume", "planarity_ratio_mean", 0.842015, 0.000591, 12),
    ("PTE", "9d", "lesion_brain_ratio", "elongation_ratio_mean", 0.753084, 0.004692, 12),
    ("PTE", "9d", "lesion_brain_ratio", "planarity_ratio_mean", 0.847021, 0.000507, 12),
    ("TBI", "1mo", "P0", "n_streamlines", -0.535869, 0.021895, 18),
    ("TBI", "1mo", "P0", "bend_angle_mean_avg", -0.504971, 0.032563, 18),
    ("TBI", "1mo", "P2", "elongation_ratio_mean", -0.532595, 0.022874, 18),
    ("PTE", "1mo", "P0", "bend_angle_mean_avg", 0.591218, 0.042909, 12),
    ("PTE", "1mo", "P1", "n_streamlines", -0.693786, 0.012328, 12),
    ("PTE", "1mo", "P1", "tortuosity_mean", -0.586105, 0.045204, 12),
    ("PTE", "1mo", "P3", "planarity_ratio_mean", -0.674444, 0.016144, 12),
    ("PTE", "1mo", "P3", "anisotropy_ratio_mean", 0.807143, 0.001505, 12),
    ("PTE", "1mo", "lesion_volume", "curv_mean_avg", -0.632804, 0.027212, 12),
    ("PTE", "1mo", "lesion_brain_ratio", "curv_mean_avg", -0.652319, 0.021502, 12),
    ("TBI", "5mo", "P0", "length_mean", -0.468953, 0.049626, 18),
    ("TBI", "5mo", "P0", "tortuosity_mean", -0.647434, 0.003675, 18),
    ("TBI", "5mo", "P2", "tortuosity_mean", 0.470458, 0.048799, 18),
    ("TBI", "5mo", "P2", "planarity_ratio_mean", 0.478352, 0.044636, 18),
    ("TBI", "5mo", "P3", "ang_dispersion_mean", 0.516421, 0.028223, 18),
    ("TBI", "5mo", "lesion_volume", "tortuosity_mean", 0.598812, 0.008645, 18),
    ("TBI", "5mo", "lesion_brain_ratio", "tortuosity_mean", 0.570430, 0.013436, 18),
    ("PTE", "5mo", "P1", "curv_mean_avg", -0.599310, 0.039449, 12),
    ("PTE", "5mo", "P1", "planarity_ratio_mean", -0.618157, 0.032164, 12),
    ("PTE", "5mo", "P3", "elongation_ratio_mean", 0.631201, 0.027725, 12),
    ("PTE", "5mo", "P4", "ang_dispersion_mean", -0.691734, 0.012697, 12),
    ("PTE", "5mo", "P5", "anisotropy_ratio_mean", 0.610478, 0.035004, 12),
    ("PTE", "5mo", "lesion_volume", "n_streamlines", -0.663896, 0.018558, 12),
    ("PTE", "5mo", "lesion_brain_ratio", "n_streamlines", -0.670473, 0.017024, 12),
]


def _print_golden(summary, df_sig):
    print("\nCLASSIFICATION_GOLDEN = {")
    for _, r in summary.iterrows():
        print(f'    ("{r["timepoint"]}", "{r["model"]}"): '
              f'({r["accuracy"]:.6f}, {r["auc"]:.6f}, '
              f'{r["sensitivity"]:.6f}, {r["specificity"]:.6f}),')
    print("}")
    print("\nCORRELATION_GOLDEN = [")
    for _, r in df_sig.iterrows():
        print(f'    ("{r["group"]}", "{r["timepoint"]}", '
              f'"{r["sh_feature"]}", "{r["tract_feature"]}", '
              f'{r["r"]:.6f}, {r["p"]:.6f}, {int(r["n"])}),')
    print("]")


def test_classification_golden_values(cohort_csvs, tmp_path):
    from lesionvae_tpu.pipeline.classification import run_classification

    geo_csv, _ = cohort_csvs
    summary = run_classification(geo_csv, tmp_path / "clf", make_plots=False)

    import os
    if os.environ.get("LESIONVAE_PRINT_GOLDEN"):
        _print_golden(summary, pd.DataFrame())

    assert len(summary) == 12  # 4 timepoints x 3 models
    for _, r in summary.iterrows():
        key = (r["timepoint"], r["model"])
        exp = CLASSIFICATION_GOLDEN[key]
        got = (r["accuracy"], r["auc"], r["sensitivity"], r["specificity"])
        np.testing.assert_allclose(got, exp, atol=5e-7, err_msg=str(key))
    # artifacts of the stage exist (summary CSV + displacement CSV)
    assert (tmp_path / "clf" / "classification_summary.csv").exists()
    assert (tmp_path / "clf" / "centroid_displacement_data.csv").exists()


def test_correlation_golden_values(cohort_csvs, tmp_path):
    from lesionvae_tpu.pipeline.correlation import run_correlation

    geo_csv, les_csv = cohort_csvs
    df_sig = run_correlation(les_csv, geo_csv, tmp_path / "corr",
                             make_plots=False)

    import os
    if os.environ.get("LESIONVAE_PRINT_GOLDEN"):
        _print_golden(pd.DataFrame(columns=["timepoint", "model", "accuracy",
                                            "auc", "sensitivity",
                                            "specificity"]), df_sig)

    got = [(r["group"], r["timepoint"], r["sh_feature"], r["tract_feature"],
            round(float(r["r"]), 6), round(float(r["p"]), 6), int(r["n"]))
           for _, r in df_sig.iterrows()]
    exp = [(g, tp, sh, tf, round(r, 6), round(p, 6), n)
           for g, tp, sh, tf, r, p, n in CORRELATION_GOLDEN]
    assert got == exp
