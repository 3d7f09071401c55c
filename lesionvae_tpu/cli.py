"""Single CLI entry point — replaces the reference's four sys.path-shim
scripts (scripts/run_tract_geometry.py etc., reference L4 of SURVEY.md §1):

    python -m lesionvae_tpu geometry   [--data-dir D] [--output-dir O] ...
    python -m lesionvae_tpu lesion     [--strict] ...
    python -m lesionvae_tpu vae        --tract atr_left ...
    python -m lesionvae_tpu classify   [--data CSV] ...
    python -m lesionvae_tpu correlate  ...
    python -m lesionvae_tpu all        (geometry → lesion → classify → correlate)
    python -m lesionvae_tpu synth      (generate a synthetic cohort)

Unlike the reference (no argparse anywhere, paths hardcoded), every stage
takes explicit flags with config-file defaults.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

from .core.config import load_config
from .utils import profiling
from .utils.logging import get_logger

log = get_logger("cli")

# Honor JAX_PLATFORMS through the config API: plugin backends (e.g. the
# remote axon TPU attachment) override the plain env var during discovery,
# so `JAX_PLATFORMS=cpu python -m lesionvae_tpu ...` would silently attach
# the TPU without this (tests/conftest.py applies the same fix for pytest).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", default=None, help="tract_config.json path")
    p.add_argument("--base-path", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--trace", nargs="?", const="/tmp/lesionvae_trace",
                   default=None, metavar="DIR",
                   help="write a jax.profiler trace of the stage to DIR "
                        "(view with TensorBoard/XProf)")


def _resolve(args):
    config = load_config(args.config)
    base = Path(args.base_path or config.base_path)
    data_dir = Path(args.data_dir) if args.data_dir else base / "data"
    out_root = Path(args.output_dir) if args.output_dir else base / "results"
    return config, base, data_dir, out_root


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lesionvae_tpu")
    sub = parser.add_subparsers(dest="stage", required=True)

    p = sub.add_parser("geometry", help="tract geometry metrics")
    _add_common(p)
    p.add_argument("--max-streamlines", type=int, default=100)
    p.add_argument("--upload", choices=["f32", "u16d"], default="f32",
                   help="point upload codec: u16d ships u16 delta codes "
                        "(0.55x bytes; torsion recomputed exactly on the "
                        "host; ops.geo_codec, parity-pinned)")

    p = sub.add_parser("lesion", help="lesion SH + heme analysis")
    _add_common(p)
    p.add_argument("--strict", action="store_true",
                   help="strict variant (skip missing lesions, extra figures)")
    p.add_argument("--max-l", type=int, default=6)
    p.add_argument("--num-samples", type=int, default=2000)

    p = sub.add_parser("vae", help="VAE training + z-score analysis")
    _add_common(p)
    p.add_argument("--tract", required=True)
    p.add_argument("--latent-dim", type=int, default=10)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--no-plots", action="store_true")

    p = sub.add_parser("vae-cohort",
                       help="train the whole (tract x timepoint) VAE fleet "
                            "concurrently")
    _add_common(p)
    p.add_argument("--tracts", nargs="*", default=None,
                   help="default: config geometry tracts")
    p.add_argument("--latent-dim", type=int, default=10)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--store", choices=["f32", "bf16"], default="f32",
                   help="weight/Adam-moment STORAGE dtype: bf16 halves the "
                        "optimizer HBM streams via stochastic rounding "
                        "(train.lowmem; 1.33x per step, parity-pinned)")
    p.add_argument("--quantize-upload", action="store_true",
                   help="upload raw tensors as uint16 fixed-point codes "
                        "(halves H2D bytes; train.quantize, parity-pinned)")
    p.add_argument("--upload-chunks", default="1",
                   help="member-axis launch chunks: each chunk's H2D "
                        "pipelines under the previous chunk's execution "
                        "('auto' = largest divisor of the fleet size <= 8; "
                        "train.batched, parity-pinned)")
    p.add_argument("--save-z", action="store_true",
                   help="also fetch + store the full per-streamline z-score "
                        "block per member (large D2H; default keeps z on "
                        "device and stores per-subject summaries)")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="fleet compute dtype (bf16 = mixed precision, "
                        "~1.5x faster, curve within 10%% of f32)")
    p.add_argument("--save-checkpoints", action="store_true",
                   help="checkpoint every member (orbax) incl. its "
                        "normalization stats — serving bundles for the "
                        "score subcommand")

    p = sub.add_parser("classify", help="TBI-vs-PTE classification")
    _add_common(p)
    p.add_argument("--geometry-csv", default=None)

    p = sub.add_parser("correlate", help="lesion-tract correlation")
    _add_common(p)
    p.add_argument("--geometry-csv", default=None)
    p.add_argument("--lesion-csv", default=None)

    p = sub.add_parser("all", help="full pipeline")
    _add_common(p)
    p.add_argument("--max-streamlines", type=int, default=100)
    p.add_argument("--num-samples", type=int, default=2000)
    p.add_argument("--with-vae", action="store_true",
                   help="also train the (tract x timepoint) VAE fleet "
                        "(run_vae_cohort) as part of the pipeline")
    p.add_argument("--epochs", type=int, default=40,
                   help="VAE epochs when --with-vae is set")

    p = sub.add_parser("score",
                       help="serving: z-score subjects against a "
                            "checkpointed normative model (no retraining)")
    _add_common(p)
    p.add_argument("--checkpoint", required=True,
                   help="directory written by train.checkpoint.save_vae "
                        "(e.g. vae_cohort/checkpoints/<tract>_<tp>)")
    p.add_argument("--normative", required=True,
                   help="zscores_*.npz holding norm_mean/norm_std")
    p.add_argument("--tract", required=True)
    p.add_argument("--timepoint", required=True)
    p.add_argument("--subjects", nargs="*", default=None,
                   help="default: all config subjects")

    p = sub.add_parser("score-cohort",
                       help="serving: z-score subjects against EVERY "
                            "checkpointed (tract x timepoint) member in one "
                            "vmapped device program")
    _add_common(p)
    p.add_argument("--cohort-dir", default=None,
                   help="run_vae_cohort output dir with checkpoints/ "
                        "(default: <output>/vae_cohort)")
    p.add_argument("--subjects", nargs="*", default=None,
                   help="default: all config subjects")

    p = sub.add_parser("synth", help="generate a synthetic cohort")
    _add_common(p)
    p.add_argument("--n-streamlines", type=int, default=30)
    p.add_argument("--volume", type=int, default=32)

    args = parser.parse_args(argv)
    config, base, data_dir, out_root = _resolve(args)
    t0 = time.perf_counter()
    # optional jax.profiler trace around the whole stage (--trace [DIR]);
    # stopped in the finally below so the partial trace lands on disk and
    # the profiler state is clean even when a stage raises
    _tracer = None
    if args.trace:
        from .utils import profiling as _prof
        _tracer = _prof.trace(args.trace)
        _tracer.__enter__()

    try:
        if args.stage == "geometry":
            from .pipeline.geometry_run import run_geometry
            run_geometry(config, data_dir,
                         out_root / "comprehensive_tract_geometry",
                         max_streamlines=args.max_streamlines,
                         upload=args.upload)

        elif args.stage == "lesion":
            from .pipeline.lesion_run import (run_lesion_analysis,
                                              run_lesion_shape_descriptors)
            if args.strict:
                run_lesion_shape_descriptors(
                    config, data_dir, out_root / "lesion_sh_descriptors_cleaned",
                    max_l=args.max_l, num_samples=args.num_samples, seed=args.seed)
            else:
                run_lesion_analysis(
                    config, data_dir, out_root / "lesion_sh_heme_comprehensive",
                    max_l=args.max_l, num_samples=args.num_samples, seed=args.seed)

        elif args.stage == "vae":
            from .pipeline.vae_run import run_vae_analysis
            run_vae_analysis(args.tract, latent_dim=args.latent_dim,
                             epochs=args.epochs, batch_size=args.batch_size,
                             lr=args.lr, config=config, base_path=base,
                             output_dir=out_root / "vae_analysis" / args.tract,
                             seed=args.seed, make_plots=not args.no_plots)

        elif args.stage == "vae-cohort":
            import jax.numpy as jnp

            from .pipeline.vae_run import run_vae_cohort
            tracts = args.tracts or list(config.geometry_tracts)
            run_vae_cohort(tracts, latent_dim=args.latent_dim, epochs=args.epochs,
                           batch_size=args.batch_size, lr=args.lr, config=config,
                           base_path=base, output_dir=out_root / "vae_cohort",
                           seed=args.seed, save_z=args.save_z,
                           compute_dtype=(jnp.bfloat16 if args.dtype == "bf16"
                                          else None),
                           store_dtype=(jnp.bfloat16 if args.store == "bf16"
                                        else None),
                           quantize_upload=args.quantize_upload,
                           upload_chunks=(args.upload_chunks
                                          if args.upload_chunks == "auto"
                                          else int(args.upload_chunks)),
                           save_checkpoints=args.save_checkpoints)

        elif args.stage == "classify":
            from .pipeline.classification import run_classification
            csv = (Path(args.geometry_csv) if args.geometry_csv else
                   out_root / "comprehensive_tract_geometry"
                   / "comprehensive_tract_geometry_metrics.csv")
            run_classification(csv, out_root / "tbi_pte_classification")

        elif args.stage == "correlate":
            from .pipeline.correlation import run_correlation
            gcsv = (Path(args.geometry_csv) if args.geometry_csv else
                    out_root / "comprehensive_tract_geometry"
                    / "comprehensive_tract_geometry_metrics.csv")
            lcsv = (Path(args.lesion_csv) if args.lesion_csv else
                    out_root / "lesion_sh_heme_comprehensive"
                    / "lesion_sh_heme_comprehensive.csv")
            run_correlation(lcsv, gcsv, out_root / "lesion_tract_correlations")

        elif args.stage == "all":
            from .pipeline.classification import run_classification
            from .pipeline.correlation import run_correlation
            from .pipeline.geometry_run import run_geometry
            from .pipeline.lesion_run import run_lesion_analysis
            geo_dir = out_root / "comprehensive_tract_geometry"
            run_geometry(config, data_dir, geo_dir,
                         max_streamlines=args.max_streamlines)
            les_dir = out_root / "lesion_sh_heme_comprehensive"
            run_lesion_analysis(config, data_dir, les_dir,
                                num_samples=args.num_samples, seed=args.seed)
            if args.with_vae:
                from .pipeline.vae_run import run_vae_cohort
                run_vae_cohort(list(config.geometry_tracts), epochs=args.epochs,
                               config=config, base_path=base,
                               output_dir=out_root / "vae_cohort", seed=args.seed)
            run_classification(geo_dir / "comprehensive_tract_geometry_metrics.csv",
                               out_root / "tbi_pte_classification")
            run_correlation(les_dir / "lesion_sh_heme_comprehensive.csv",
                            geo_dir / "comprehensive_tract_geometry_metrics.csv",
                            out_root / "lesion_tract_correlations")

        elif args.stage == "score":
            from .pipeline.infer import load_normative, score_subjects
            norm = load_normative(args.normative)
            subjects = args.subjects or [
                s for subs in config.subjects_by_group().values() for s in subs]
            summary = score_subjects(args.checkpoint, norm["mean"], norm["std"],
                                     base, args.tract, args.timepoint, subjects,
                                     config=config, seed=args.seed)
            out = out_root / "serving"
            out.mkdir(parents=True, exist_ok=True)
            csv = out / f"scores_{args.tract}_{args.timepoint}.csv"
            summary.to_csv(csv, index=False)
            log.info("wrote %d subject scores -> %s", len(summary), csv)

        elif args.stage == "score-cohort":
            from .pipeline.infer import score_cohort
            cohort_dir = (Path(args.cohort_dir) if args.cohort_dir
                          else out_root / "vae_cohort")
            subjects = args.subjects or [
                s for subs in config.subjects_by_group().values()
                for s in subs]
            out = score_cohort(cohort_dir, base, subjects, config=config,
                               seed=args.seed,
                               output_dir=out_root / "serving")
            csv = out_root / "serving" / "cohort_scores.csv"
            if len(out):
                log.info("wrote %d member-subject scores -> %s", len(out),
                         csv)
            else:
                log.warning("no members scored; empty %s written", csv)

        elif args.stage == "synth":
            from .io.synth import generate_cohort
            generate_cohort(base, config, seed=args.seed,
                            n_streamlines=args.n_streamlines,
                            volume_shape=(args.volume,) * 3)

    finally:
        # stop the profiler trace on BOTH paths (ADVICE r2): jax
        # flushes the partial trace on stop_trace, and a later CLI
        # invocation in the same process can start a fresh trace
        if _tracer is not None:
            _tracer.__exit__(*sys.exc_info())
    log.info("stage %s done in %.2fs", args.stage, time.perf_counter() - t0)

    # per-stage wall-clock table (utils/profiling records every pipeline
    # stage; SURVEY.md §5.1 — timing is first-class because the headline
    # metric is full-cohort wall-clock)
    rep = profiling.report()
    if rep:
        width = max(len(k) for k in rep)
        print("\n== stage wall-clock ==")
        for name, dt in rep.items():
            print(f"  {name:<{width}}  {dt:8.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
