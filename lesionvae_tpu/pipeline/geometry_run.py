"""Tract-geometry pipeline: cohort driver + preserved public API.

Replaces the reference's per-item Python loop
(src/geometry/comprehensive_tract_geometry_analysis.py:134-220, the ~2.4k-item
COHORT LOOP of SURVEY.md §3.1) with a batched design: all bundles are read on
the host, packed into a handful of padded ``(S, P, 3)`` buckets, and each
bucket is ONE jitted device call.  Output CSV schemas match the reference
byte-for-byte in column names and order:
- ``comprehensive_tract_geometry_metrics.csv``
  (comprehensive_tract_geometry_analysis.py:317-319)
- ``summary_statistics_by_group_timepoint.csv`` (:264-266)
- ``summary_statistics_by_tract_group.csv`` (:292-294)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core.config import Config, load_config
from ..io.vtk import read_streamlines
from ..ops.geometry import (METRIC_NAMES, bundle_summary, eigen_metrics_f64,
                            streamline_metrics_stacked, unstack_metrics)
from ..ops.padding import pad_streamlines
from ..utils.logging import get_logger
from ..utils.profiling import stage

log = get_logger("geometry")

_BUCKET_MIN = 32     # smallest padded point-count bucket
_CHUNK_S = 32768     # fixed batch-axis size per device call

# Shape discipline: remote-attached TPUs pay ~seconds of executable
# load/compile per DISTINCT program shape and per process, so the cohort path
# runs every chunk at exactly (_CHUNK_S, P_bucket) — padding waste is ~free on
# the VPU compared to another program load.


def _bucket_P(n: int) -> int:
    """Padded point-count bucket: multiples of 16 up to 128 (halves the
    ~37% pad waste of pure power-of-2 buckets on typical ~40-60-point
    streamlines — the padded points are H2D bytes on a tens-of-MB/s link),
    powers of two beyond (bounded program count for long-streamline data).
    """
    if n <= _BUCKET_MIN:
        return _BUCKET_MIN
    if n <= 128:
        return -(-n // 16) * 16
    b = 128
    while b < n:
        b *= 2
    return b


def _warm_helix(P: int) -> np.ndarray:
    """(P, 3) helix for warm_compile launches: nonzero arc length (rows stay
    ``valid``), full-rank covariance with well-separated eigenvalues (the
    f32 eigen certificate passes, so the host f64 refine loop stays empty —
    the property that makes a garbage-data warmup SAFE to run at cohort
    scale)."""
    t = np.linspace(0, 4 * np.pi, P, dtype=np.float32)
    return np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)


def metrics_dataframe(streamlines: Sequence[np.ndarray],
                      dtype=jnp.float32) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Per-streamline + bundle-summary DataFrames for one bundle."""
    if not streamlines:
        return (pd.DataFrame(columns=list(METRIC_NAMES)),
                pd.DataFrame([bundle_summary(
                    {"valid": np.zeros(0, bool),
                     **{k: np.zeros(0) for k in METRIC_NAMES}})]))
    pts, lens = pad_streamlines(streamlines,
                                max_points=_bucket_P(max(len(s) for s in streamlines)))
    stacked = streamline_metrics_stacked(jnp.asarray(pts), jnp.asarray(lens),
                                         dtype=dtype)
    out = unstack_metrics(np.asarray(stacked))
    valid = out["valid"]
    # exact f64 verdict for rows whose f32 eigen certificate failed (the
    # reference's 1e-12 inf gate, tract_geom_proc.py:126-136)
    refine = np.nonzero(valid & ~out["eigen_ok"])[0]
    if len(refine):
        for k in ("elongation_ratio", "planarity_ratio", "anisotropy_ratio"):
            out[k] = np.array(out[k])   # device fetches are read-only views
        eigen_metrics_f64(streamlines, out["elongation_ratio"],
                          out["planarity_ratio"], out["anisotropy_ratio"],
                          refine)
    df_sl = pd.DataFrame({k: out[k][valid].astype(np.float64)
                          for k in METRIC_NAMES})
    df_bundle = pd.DataFrame([bundle_summary(out)])
    return df_sl, df_bundle


def compute_streamline_metrics(vtk_path: str | Path,
                               max_streamlines: Optional[int] = None,
                               dtype=jnp.float32
                               ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Preserved public API (reference: tract_geom_proc.py:153-212).

    Returns ``(df_sl, df_bundle)`` with the reference's exact column schema.
    """
    sls = read_streamlines(vtk_path, max_streamlines=max_streamlines)
    return metrics_dataframe(sls, dtype=dtype)


# ----------------------------------------------------------------------------
# Batched cohort execution
# ----------------------------------------------------------------------------
def launch_bundle_metrics(bundles: List[List[np.ndarray]],
                          dtype=jnp.float32, mesh=None,
                          upload: str = "f32", warm_compile: bool = False):
    """Enqueue the fused per-bucket device dispatches for many bundles and
    return a zero-argument ``finish()`` callable producing the bundle
    summaries.

    Streamlines from every bundle are pooled, bucketed by padded point count
    (powers of two >= 32), and each bucket runs as one ``streamline_metrics``
    call.  The jit calls return device futures, so callers can interleave
    other host work (e.g. the VAE tensor build) between launch and finish —
    on the remote-attached chip this hides the geometry device time entirely.

    ``upload``: ``"f32"`` ships the padded point blocks as-is; ``"u16d"``
    ships u16 delta codes (0.55x the bytes — the stage is wire-bound on the
    remote attachment) decoded inside the device program, with torsion
    recomputed host-side in reference-exact f64 from the original points
    (ops.geo_codec — tau cannot absorb the decode noise; every other
    metric's decoded shift is p99 <= 3e-4, pinned in tests/test_geo_codec
    .py).

    ``mesh``: optional jax.sharding.Mesh — each chunk's streamline axis is
    sharded over the ``data`` axis (the cohort's scaling axis, SURVEY.md §5.7);
    the kernel is embarrassingly parallel so XLA needs no collectives.

    ``warm_compile``: compile-and-load warmup mode — every chunk's point
    block is replaced by one tiny host helix BROADCAST ON DEVICE to the
    exact production aval, so the programs compile/load/execute while
    shipping ~KB instead of ~70-140 MB over the H2D link (the bench
    cold-start cost).  Real ``lens`` keep the masking honest; the helix has
    full-rank covariance so the f64 eigen-refine path stays empty.  Results
    are garbage; callers discard them.
    """
    if upload not in ("f32", "u16d"):
        raise ValueError(f"unknown geometry upload codec: {upload!r}")
    data_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PSpec
        data_sh = NamedSharding(mesh, PSpec("data"))
    from ..ops.geometry import (BUNDLE_SUMMARY, STACKED_NAMES,
                                streamline_metrics_stacked_u16)
    if upload == "u16d":
        from ..ops.geo_codec import encode_u16_delta, torsion_f64

    # (bundle_idx, streamline) pool per P-bucket
    buckets: Dict[int, List[Tuple[int, np.ndarray]]] = {}
    for bi, bundle in enumerate(bundles):
        for sl in bundle:
            buckets.setdefault(_bucket_P(len(sl)), []).append((bi, sl))

    # two-phase dispatch: enqueue EVERY chunk's device program first (jit
    # calls return futures), then fetch — chunk K+1's host padding and H2D
    # overlap chunk K's device execution instead of a blocking
    # upload→compute→fetch round-trip per chunk (worth ~2x on the
    # high-latency remote attachment)
    pending = []                         # (device stacked, S, bundle ids)
    fill = {}                            # P -> [real points, padded points]
    for P, items in sorted(buckets.items()):
        for c0 in range(0, len(items), _CHUNK_S):
            chunk = items[c0:c0 + _CHUNK_S]
            sls = [sl for _, sl in chunk]
            S = len(sls)
            # full chunks run at exactly _CHUNK_S; the FINAL partial chunk
            # pads to the next power of two instead of the full chunk shape
            # (measured on the bench cohort: a 4k-row tail padded to 32768
            # rows cost 29% S-axis waste in the P64 bucket — uploading pad
            # rows over a tens-of-MB/s link; pow2 tails cut total pad waste
            # 33% -> ~21% / 169.9 -> ~145 MB for at most one extra program
            # shape per P bucket)
            S_pad = _CHUNK_S if len(items) - c0 > _CHUNK_S else max(
                _BUCKET_MIN, 1 << (S - 1).bit_length())
            S_pad = min(S_pad, _CHUNK_S)
            f = fill.setdefault(P, [0, 0])
            f[0] += sum(len(sl) for sl in sls)
            f[1] += S_pad * P
            pts, lens = pad_streamlines(sls + [sls[-1]] * (S_pad - S),
                                        max_points=P)
            d_lens = jnp.asarray(lens)
            if data_sh is not None:
                d_lens = jax.device_put(d_lens, data_sh)
            if warm_compile:
                helix = _warm_helix(P)
                if upload == "u16d":
                    c_h, p0_h, lo_h, sc_h = encode_u16_delta(
                        helix[None], np.array([P], np.int32))
                    dev = [jnp.broadcast_to(jnp.asarray(c_h[0]),
                                            (S_pad, P - 1, 3)),
                           jnp.broadcast_to(jnp.asarray(p0_h[0]),
                                            (S_pad, 3)),
                           jnp.broadcast_to(jnp.asarray(lo_h[0]),
                                            (S_pad, 3)),
                           jnp.broadcast_to(jnp.asarray(sc_h[0]),
                                            (S_pad, 3))]
                    stacked = streamline_metrics_stacked_u16(*dev, d_lens,
                                                             dtype=dtype)
                    host_tau = np.zeros(S)
                else:
                    d_pts = jnp.broadcast_to(jnp.asarray(helix),
                                             (S_pad, P, 3))
                    stacked = streamline_metrics_stacked(d_pts, d_lens,
                                                         dtype=dtype)
                    host_tau = None
            elif upload == "u16d":
                codes, p0, lo, sc = encode_u16_delta(pts, lens)
                dev = [jnp.asarray(x) for x in (codes, p0, lo, sc)]
                if data_sh is not None:
                    dev = [jax.device_put(x, data_sh) for x in dev]
                stacked = streamline_metrics_stacked_u16(*dev, d_lens,
                                                         dtype=dtype)
                # reference-exact host torsion for the REAL rows (f64 from
                # the original points; ~0.3 s/cohort native) — overwrites
                # the decode-noisy device column at finish()
                host_tau = torsion_f64(pts[:S], lens[:S])
            else:
                d_pts = jnp.asarray(pts)
                if data_sh is not None:
                    d_pts = jax.device_put(d_pts, data_sh)
                stacked = streamline_metrics_stacked(d_pts, d_lens,
                                                     dtype=dtype)
                host_tau = None
            pending.append((stacked, S,
                            np.fromiter((bi for bi, _ in chunk),
                                        np.int64, count=S), sls, host_tau))

    # bucket fill-factor observability (pad points are H2D bytes on a
    # tens-of-MB/s link): aggregate + per-bucket waste, so _bucket_P tuning
    # is driven by measurements, not guesses (VERDICT r3 #10)
    if fill:
        real = sum(f[0] for f in fill.values())
        padded = sum(f[1] for f in fill.values())
        per = ", ".join(f"P{P}:{100 * (1 - f[0] / f[1]):.0f}%"
                        for P, f in sorted(fill.items()))
        bytes_per_pt = 6 if upload == "u16d" else 12  # u16 codes vs f32
        log.info("geometry pad waste: %.0f%% of %.1f MB uploaded%s "
                 "(per-bucket: %s)", 100 * (1 - real / padded),
                 padded * bytes_per_pt / 1e6,
                 " [u16-delta]" if upload == "u16d" else "", per)

    # D2H drain split from host compute: the stacked results are small
    # (~19 floats x S streamlines ~= 18 MB for the bench cohort, ~1.5 s at
    # the probed link), while the host tail (f64 refine, groupby, CSV) is
    # CPU time.  Exposing drain() lets the caller pull the D2H bytes off
    # the link FIRST, enqueue the fleet's large H2D behind them, and run
    # the host tail while that upload streams (bench order 'overlap').
    _drained: List[List[np.ndarray]] = []

    def drain() -> None:
        if not _drained:
            _drained.append([np.asarray(stacked)[:, :S].T
                             for stacked, S, _, _, _ in pending])

    def finish() -> List[Dict[str, float]]:
        drain()
        vals_parts = _drained[0]
        bids_parts = [bids for _, _, bids, _, _ in pending]

        V = np.concatenate(vals_parts)                 # (S_total, 19)
        bids = np.concatenate(bids_parts)
        valid = V[:, STACKED_NAMES.index("valid")] > 0.5

        if upload == "u16d":
            # torsion is the one metric the u16-delta decode noise breaks
            # (see launch docstring); replace the device column with the
            # reference-exact host f64 values computed at launch
            V = np.ascontiguousarray(V)
            V[:, STACKED_NAMES.index("torsion_mean")] = np.concatenate(
                [tau for _, _, _, _, tau in pending]).astype(V.dtype)

        # f64 refinement of eigen-ratio metrics where the f32 certificate
        # failed (exact reference inf-gate semantics; see ops.geometry)
        eigen_ok = V[:, STACKED_NAMES.index("eigen_ok")] > 0.5
        refine = np.nonzero(valid & ~eigen_ok)[0]
        if len(refine):
            all_sls = [sl for _, _, _, sls, _ in pending for sl in sls]
            cols = [STACKED_NAMES.index(c) for c in
                    ("elongation_ratio", "planarity_ratio",
                     "anisotropy_ratio")]
            # column slices are views — updated in place
            eigen_metrics_f64(all_sls, V[:, cols[0]], V[:, cols[1]],
                              V[:, cols[2]], refine)
            log.info("refined %d/%d eigen-ambiguous streamlines in f64",
                     len(refine), len(V))

        # vectorized bundle summaries: pandas groupby mean == np.nanmean per
        # bundle (skips NaN, propagates inf — _safe_mean semantics,
        # tract_geom_proc.py:192-210)
        metric_cols = [STACKED_NAMES.index(src) for _, src in BUNDLE_SUMMARY]
        df = pd.DataFrame(V[valid][:, metric_cols].astype(np.float64),
                          columns=[col for col, _ in BUNDLE_SUMMARY])
        df["__b"] = bids[valid]
        with np.errstate(invalid="ignore"):
            means = df.groupby("__b").mean()
        counts = np.bincount(bids[valid], minlength=len(bundles))

        summaries = []
        for bi in range(len(bundles)):
            out: Dict[str, float] = {"n_streamlines": int(counts[bi])}
            if bi in means.index:
                row = means.loc[bi]
                for col, _ in BUNDLE_SUMMARY:
                    out[col] = float(row[col])
            else:
                for col, _ in BUNDLE_SUMMARY:
                    out[col] = float("nan")
            summaries.append(out)
        return summaries

    finish.drain = drain
    return finish


def batched_bundle_metrics(bundles: List[List[np.ndarray]],
                           dtype=jnp.float32,
                           mesh=None) -> List[Dict[str, float]]:
    """Synchronous wrapper over :func:`launch_bundle_metrics`."""
    return launch_bundle_metrics(bundles, dtype=dtype, mesh=mesh)()


# ----------------------------------------------------------------------------
# Cohort driver
# ----------------------------------------------------------------------------
def bundle_path(data_dir: Path, subject_id: str, timepoint: str,
                tract: str) -> Optional[Path]:
    """Bundle file location, preferring .vtk.gz then .vtk (reference:
    comprehensive_tract_geometry_analysis.py:86-93)."""
    p = data_dir / subject_id / timepoint / "bundles" / f"{tract}_curves.vtk.gz"
    if p.exists():
        return p
    p = p.with_suffix("")  # drop .gz
    return p if p.exists() else None


def decompress_vtk_if_needed(path: Path) -> Path:
    """Inflate ``*.vtk.gz`` to a sibling ``*.vtk`` and KEEP it, reusing a
    fresh one on later runs — the reference's exact steady-state behavior
    (comprehensive_tract_geometry_analysis.py:54-76 decompresses next to the
    archive and skips when the inflated file is newer).  gzip inflate is
    ~60% of the cold cohort read on a 1-core host; warm runs skip it.

    Best-effort: on any failure (e.g. read-only data dir) the original path
    is returned and the reader inflates in memory as before."""
    if path.suffix != ".gz":
        return path
    out = path.with_suffix("")
    try:
        if out.exists() and out.stat().st_mtime >= path.stat().st_mtime:
            return out
        import gzip as _gzip
        tmp = out.with_name(out.name + ".tmp")
        tmp.write_bytes(_gzip.decompress(path.read_bytes()))
        tmp.replace(out)  # atomic: readers never see a partial file
        return out
    except Exception:
        return path


def launch_all_tracts(config: Config, data_dir: Path,
                      max_streamlines: Optional[int] = 100,
                      dtype=jnp.float32, upload: str = "f32",
                      warm_compile: bool = False):
    """Read the cohort and ENQUEUE its device dispatches; returns a
    zero-argument ``finish()`` producing the cohort metrics DataFrame.

    Cohort geometry metrics (reference: :134-220), batched.  Missing files
    are warned and skipped — the skip-and-continue fault tolerance contract
    is load-bearing downstream (SURVEY.md §5.3).
    """
    subjects_by_group = config.subjects_by_group()
    timepoints = list(config.timepoints)
    tracts = list(config.geometry_tracts)

    tasks: List[Tuple[Dict[str, str], Path]] = []
    for group, subjects in subjects_by_group.items():
        for subject_id in sorted(subjects):
            for timepoint in timepoints:
                for tract in tracts:
                    path = bundle_path(data_dir, subject_id, timepoint, tract)
                    if path is None:
                        log.warning("tract file not found: %s/%s/%s",
                                    subject_id, timepoint, tract)
                        continue
                    tasks.append((dict(subject_id=subject_id,
                                       timepoint=timepoint, tract=tract,
                                       group=group), path))

    def _read(path: Path):
        try:
            return read_streamlines(decompress_vtk_if_needed(path),
                                    max_streamlines=max_streamlines)
        except Exception as e:  # corrupt file → skip, don't abort
            log.error("failed to read %s: %s", path, e)
            return None

    meta: List[Dict[str, str]] = []
    bundles: List[List[np.ndarray]] = []
    with stage("geometry.read"):
        # gzip inflate and the native parser both release the GIL, so a
        # thread pool overlaps decompression with parsing on multi-core
        # hosts; on a 1-core host threads only add contention (measured:
        # 14 s threaded vs 6-8 s sequential on the bench host) so stay
        # sequential there
        from concurrent.futures import ThreadPoolExecutor
        n_cpu = os.cpu_count() or 1
        workers = min(8, 2 * n_cpu) if n_cpu > 1 else 1
        if workers > 1 and len(tasks) > 8:
            with ThreadPoolExecutor(workers) as ex:
                results = list(ex.map(_read, [p for _, p in tasks]))
        else:
            results = [_read(p) for _, p in tasks]
        for (m, path), sls in zip(tasks, results):
            if sls is None:
                continue
            if not sls:
                log.warning("no streamlines in %s", path)
                continue
            bundles.append(sls)
            meta.append(m)
    log.info("read %d bundles", len(bundles))

    if not bundles:
        empty = lambda: pd.DataFrame()  # noqa: E731
        empty.drain = lambda: None
        return empty

    with stage("geometry.launch"):
        finish_metrics = launch_bundle_metrics(bundles, dtype=dtype,
                                               upload=upload,
                                               warm_compile=warm_compile)

    def finish() -> pd.DataFrame:
        with stage("geometry.compute"):
            summaries = finish_metrics()
        log.info("computed %d bundle summaries", len(summaries))

        rows = []
        for summ, m in zip(summaries, meta):
            if summ["n_streamlines"] == 0:
                log.warning("no valid streamlines for %s", m)
                continue
            row = dict(summ)
            # metadata columns go last, as in the reference (:112-115)
            row.update(m)
            rows.append(row)
        return pd.DataFrame(rows)

    finish.drain = finish_metrics.drain
    return finish


def process_all_tracts(config: Config, data_dir: Path,
                       max_streamlines: Optional[int] = 100,
                       dtype=jnp.float32) -> pd.DataFrame:
    """Synchronous cohort driver (reference main loop :134-220)."""
    return launch_all_tracts(config, data_dir,
                             max_streamlines=max_streamlines, dtype=dtype)()


def generate_summary_statistics(results_df: pd.DataFrame, output_dir: Path
                                ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Group/timepoint and tract/group summary CSVs (reference: :223-296)."""
    key_metrics = ["length_mean", "tortuosity_mean", "curv_mean_avg",
                   "elongation_ratio_mean", "planarity_ratio_mean"]

    summary_stats = []
    for group in sorted(results_df["group"].unique()):
        for tp in sorted(results_df["timepoint"].unique()):
            subset = results_df[(results_df["group"] == group)
                                & (results_df["timepoint"] == tp)]
            if len(subset) == 0:
                continue
            row = {"group": group, "timepoint": tp, "n_records": len(subset),
                   "n_subjects": subset["subject_id"].nunique(),
                   "n_tracts": subset["tract"].nunique()}
            for metric in key_metrics:
                if metric in subset.columns:
                    row[f"{metric}_mean"] = subset[metric].mean()
                    row[f"{metric}_std"] = subset[metric].std()
            summary_stats.append(row)
    summary_df = pd.DataFrame(summary_stats)
    output_dir.mkdir(parents=True, exist_ok=True)
    summary_df.to_csv(output_dir / "summary_statistics_by_group_timepoint.csv",
                      index=False)

    tract_summary = []
    for tract in sorted(results_df["tract"].unique()):
        for group in sorted(results_df["group"].unique()):
            subset = results_df[(results_df["tract"] == tract)
                                & (results_df["group"] == group)]
            if len(subset) == 0:
                continue
            tract_summary.append({
                "tract": tract, "group": group, "n_records": len(subset),
                "length_mean": subset["length_mean"].mean(),
                "length_std": subset["length_mean"].std(),
                "tortuosity_mean": subset["tortuosity_mean"].mean(),
                "tortuosity_std": subset["tortuosity_mean"].std(),
                "curv_mean": subset["curv_mean_avg"].mean(),
                "curv_std": subset["curv_mean_avg"].std(),
            })
    tract_summary_df = pd.DataFrame(tract_summary)
    tract_summary_df.to_csv(output_dir / "summary_statistics_by_tract_group.csv",
                            index=False)
    return summary_df, tract_summary_df


def launch_geometry(config: Optional[Config] = None,
                    data_dir: str | Path | None = None,
                    output_dir: str | Path | None = None,
                    max_streamlines: Optional[int] = 100,
                    dtype=jnp.float32, upload: str = "f32",
                    warm_compile: bool = False):
    """Async geometry stage: read the cohort + enqueue all device work NOW;
    the returned ``finish()`` fetches results and writes the three CSVs.

    Lets callers overlap other host work (VAE tensor build, fleet launch)
    with the geometry device execution — on the remote-attached bench chip
    this hides the stage's device time entirely."""
    config = config or load_config()
    base = Path(config.base_path)
    data_dir = Path(data_dir) if data_dir else base / "data"
    output_dir = (Path(output_dir) if output_dir
                  else base / "results" / "comprehensive_tract_geometry")
    output_dir.mkdir(parents=True, exist_ok=True)

    finish_tracts = launch_all_tracts(config, data_dir,
                                      max_streamlines=max_streamlines,
                                      dtype=dtype, upload=upload,
                                      warm_compile=warm_compile)

    def finish() -> pd.DataFrame:
        results_df = finish_tracts()
        if len(results_df) == 0:
            log.error("no tracts successfully processed")
            return results_df
        with stage("geometry.write"):
            results_df.to_csv(
                output_dir / "comprehensive_tract_geometry_metrics.csv",
                index=False)
            generate_summary_statistics(results_df, output_dir)
        log.info("geometry stage complete: %d records -> %s",
                 len(results_df), output_dir)
        return results_df

    finish.drain = finish_tracts.drain
    return finish


def run_geometry(config: Optional[Config] = None,
                 data_dir: str | Path | None = None,
                 output_dir: str | Path | None = None,
                 max_streamlines: Optional[int] = 100,
                 dtype=jnp.float32, upload: str = "f32") -> pd.DataFrame:
    """End-to-end geometry stage (reference main():299-329)."""
    with stage("geometry"):
        return launch_geometry(config, data_dir=data_dir,
                               output_dir=output_dir,
                               max_streamlines=max_streamlines,
                               dtype=dtype, upload=upload)()
