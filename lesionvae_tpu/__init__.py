"""lesionvae_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
lesion-condition-vae neuroimaging pipeline.

Public API preserved from the reference (see SURVEY.md §2/§7):
- ``compute_streamline_metrics(vtk_path, max_streamlines)`` → (df_sl, df_bundle)
- ``analyze_single_lesion(subject_id, timepoint, data_dir, output_dir, ...)``
- ``run_vae_analysis(...)`` (promised by the reference README:103-111 but never
  shipped; implemented here as the composition of the five VAE-stage steps)
"""

from .core.config import AnalysisParams, Config, ModelParams, load_config

__all__ = [
    "AnalysisParams", "Config", "ModelParams", "load_config",
    "compute_streamline_metrics", "analyze_single_lesion", "run_vae_analysis",
]

__version__ = "0.1.0"


# the reference ships empty __init__.py files so its own README imports fail
# (SURVEY.md §2 discrepancy #2); here every documented symbol is exported
_LAZY = {
    "compute_streamline_metrics": ("pipeline.geometry_run", None),
    "analyze_single_lesion": ("pipeline.lesion_run", None),
    "run_vae_analysis": ("pipeline.vae_run", None),
    "train_lesion_vae": ("train.trainer", None),
    "compute_normative_statistics": ("train.normative", None),
    "compute_zscore_residuals": ("train.normative", None),
    "build_tensor_with_lesion_context": ("train.data", None),
    "fit_normalization_stats": ("train.data", None),
    "apply_normalization": ("train.data", None),
    "LesionConditionedVAE": ("models.lesion_vae", None),
    "elbo": ("models.elbo", None),
    "beta_schedule": ("models.elbo", None),
    # cohort-scale additions beyond the reference's surface
    "run_vae_cohort": ("pipeline.vae_run", None),
    "launch_many_vaes": ("train.batched", None),
    "launch_geometry": ("pipeline.geometry_run", None),
    "launch_lesion_analysis": ("pipeline.lesion_run", None),
    "score_subjects": ("pipeline.infer", None),
    "score_cohort": ("pipeline.infer", None),
    "load_normative": ("pipeline.infer", None),
}

__all__ += list(_LAZY)


def __getattr__(name):  # lazy: keep `import lesionvae_tpu` light
    if name in _LAZY:
        import importlib
        module = importlib.import_module(f".{_LAZY[name][0]}", __name__)
        return getattr(module, name)
    raise AttributeError(name)
