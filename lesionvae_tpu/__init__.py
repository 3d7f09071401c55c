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


def __getattr__(name):  # lazy: keep `import lesionvae_tpu` light
    if name == "compute_streamline_metrics":
        from .pipeline.geometry_run import compute_streamline_metrics
        return compute_streamline_metrics
    if name == "analyze_single_lesion":
        from .pipeline.lesion_run import analyze_single_lesion
        return analyze_single_lesion
    if name == "run_vae_analysis":
        from .pipeline.vae_run import run_vae_analysis
        return run_vae_analysis
    raise AttributeError(name)
