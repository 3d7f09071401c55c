#!/usr/bin/env python
"""Full-cohort benchmark: geometry + SH + VAE training on one TPU chip.

Workload (reference scale, BASELINE.md):
- geometry: 37 subjects x 4 timepoints x 16 tracts, 100 streamlines/bundle
- lesion SH: 26 TBI/PTE subjects x 4 timepoints, 2000 sphere samples, L=6
- VAE: 64 (tract x timepoint) VAEs trained CONCURRENTLY (vmap), 40 epochs,
  batch 64, on (n_streamlines, 100, 13)+(.,100,3) tensors

Prints ONE JSON line:
  {"metric": "full_cohort_wallclock", "value": <s>, "unit": "s",
   "vs_baseline": <60/value>}
vs_baseline > 1 means faster than the driver-set 60 s single-chip target
(the reference publishes no numbers of its own — BASELINE.md).

Synthetic-cohort generation is untimed setup (deterministic; cached in /tmp).
The JAX persistent compilation cache amortizes XLA compiles across runs.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))  # repo-root imports

import numpy as np

import jax

from lesionvae_tpu.utils.cache import configure_cache

# one shared cache policy (utils/cache.configure_cache): repo-local live dir
# (a /tmp dir is wiped on host reboot — observed turning a hits-84 steady
# state into hits-0 / 171 s cold start), pre-seeded from the COMMITTED
# cache_seed/tpu so even a fresh checkout's first process starts
# compile-warm (round 4's driver run started cold: 84 misses, 123 s), with
# the 0.05 s persist threshold (~60 pipeline programs compile in <0.5 s and
# the old threshold recompiled them every process).  Respects an outer
# config; JAX_CACHE_DIR / BENCH_CACHE_MIN_COMPILE_S override.
configure_cache("tpu")
# the axon TPU plugin ignores the JAX_PLATFORMS env var during discovery
# (same quirk the CLI and tests/conftest.py work around): re-apply it through
# the config API so JAX_PLATFORMS=cpu really benches on CPU — otherwise a
# wedged tunnel attachment hangs backend init for minutes
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

SCALE = os.environ.get("BENCH_SCALE", "full")  # full | small
BASELINE_TARGET_S = 60.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def setup_cohort(root: Path):
    from lesionvae_tpu.core.config import load_config
    from lesionvae_tpu.io.synth import generate_cohort, tiny_config

    if SCALE == "small":
        cfg = tiny_config(n_per_group=2)
        n_sl, vol = 20, (24, 24, 24)
    else:
        cfg = load_config()
        n_sl, vol = 100, (48, 48, 48)

    stamp = root / f"cohort_{SCALE}.done"
    if not stamp.exists():
        log(f"[setup] generating synthetic cohort ({SCALE}) under {root} ...")
        t0 = time.perf_counter()
        generate_cohort(root, cfg, seed=0, n_streamlines=n_sl,
                        volume_shape=vol, with_profiles=True)
        stamp.write_text("ok")
        log(f"[setup] cohort generated in {time.perf_counter() - t0:.1f}s")
    return cfg


def _profile_parsers(micro, lesion):
    """Resolve the fastest available profile-CSV parser chain.

    Returns ``(use_native, pacsv, conv)`` consumed by _parse_profile_file:
    native C parser ~450 MB/s, pyarrow ~180, pandas fallback slowest
    (all three produce identical tensors — tests/test_bench_fast_path.py).
    """
    from lesionvae_tpu.io import profiles_native
    use_native = profiles_native.available()

    try:
        import pyarrow as pa
        from pyarrow import csv as pacsv
        # parse only the needed 17 of 20 columns, numerics directly as
        # float32 (pyarrow defaults to float64 + a cast later)
        conv = pacsv.ConvertOptions(
            include_columns=["tract_id"] + micro + lesion,
            include_missing_columns=True,
            column_types={c: pa.float32() for c in micro + lesion})
    except ImportError:
        pacsv = conv = None
    return use_native, pacsv, conv


def _parse_profile_file(fp, micro, lesion, use_native, pacsv, conv):
    """One profile CSV -> (M, Lm, run_bounds): float32 column matrices for
    the micro/lesion features plus the tract-contiguous row runs.  Missing
    lesion columns (Sham subjects) impute the reference constants
    (data_loader.py:79-88); Lm[:, 2] is the clipped lesion_distance
    (data_loader.py:117)."""
    from lesionvae_tpu.io import profiles_native

    if use_native:
        vals, starts, names, present = \
            profiles_native.read_profile_columns(fp, micro + lesion)
        M = vals[:, :len(micro)]
        Lm = vals[:, len(micro):]
        for j, c in enumerate(lesion):
            if not present[len(micro) + j]:
                Lm[:, j] = 15.0 if c == "lesion_distance" else 0.0
        run_bounds = list(zip(
            starts, np.append(starts[1:], len(vals)), names))
    elif pacsv is not None:
        tbl = pacsv.read_csv(fp, convert_options=conv)
        cols = {c: tbl.column(c) for c in tbl.column_names}
        tract_codes = np.asarray(cols["tract_id"].dictionary_encode()
                                 .combine_chunks().indices)
        tract_names = (cols["tract_id"].dictionary_encode()
                       .combine_chunks().dictionary.to_pylist())
        M = np.empty((len(tract_codes), len(micro)), np.float32)
        for j, c in enumerate(micro):
            M[:, j] = np.asarray(cols[c], np.float32)
        Lm = np.empty((len(tract_codes), len(lesion)), np.float32)
        for j, c in enumerate(lesion):
            col = cols.get(c)
            # include_missing_columns yields all-null columns for
            # features absent from the file (Sham subjects)
            if col is not None and col.null_count < len(col):
                Lm[:, j] = np.asarray(col, np.float32)
            else:
                Lm[:, j] = 15.0 if c == "lesion_distance" else 0.0
    else:
        import pandas as pd
        df = pd.read_csv(fp)
        for lf in lesion:
            if lf not in df.columns:
                df[lf] = 15.0 if lf == "lesion_distance" else 0.0
        codes, uniq = pd.factorize(df["tract_id"])
        tract_codes, tract_names = codes, list(uniq)
        M = df[micro].to_numpy(np.float32)
        Lm = df[lesion].to_numpy(np.float32)
    if not use_native:
        change = np.flatnonzero(np.diff(tract_codes)) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(tract_codes)]])
        run_bounds = [(s, e, tract_names[tract_codes[s]])
                      for s, e in zip(starts, ends)]
    Lm[:, 2] = np.clip(Lm[:, 2], 0, 15) / 15.0
    return M, Lm, run_bounds


def _profile_file(root, sid, tp):
    return (root / "results" / sid / f"timepoint_analysis_{sid}_{tp}"
            / f"comprehensive_tract_data_{sid}_{tp}.csv")


def _subject_index(cfg):
    """Dense subject id -> index map, in groups -> subject order (the same
    order both pipeline modes assign, so on-device aggregation segments
    agree)."""
    subj_of = {}
    for g, sids in cfg.subjects_by_group().items():
        for sid in sids:
            subj_of.setdefault(sid, len(subj_of))
    return subj_of


def _accumulate_runs(tensors, tracts, M, Lm, run_bounds, is_sham, si, tp):
    for s, e, tract in run_bounds:
        if tract not in tracts:
            continue
        n_sl = (e - s) // 100
        if n_sl == 0:
            continue
        xm_l, xl_l, sham_l, subj_l = tensors[(tract, tp)]
        xm_l.append(M[s:s + n_sl * 100].reshape(n_sl, 100, -1))
        xl_l.append(Lm[s:s + n_sl * 100].reshape(n_sl, 100, -1))
        sham_l.append(np.full(n_sl, is_sham, bool))
        subj_l.append(np.full(n_sl, si, np.int32))


def _stack_members(tensors):
    return [(key, np.concatenate(xm), np.concatenate(xl),
             np.concatenate(sh), np.concatenate(su))
            for key, (xm, xl, sh, su) in tensors.items() if xm]


def fast_profile_tensors(root: Path, cfg):
    """Read each per-subject profile CSV once; slice tensors per tract.

    Equivalent to build_tensor_with_lesion_context for complete, sorted
    synthetic CSVs, but one read per (subject, timepoint) instead of one
    pivot per (tract, subject, timepoint).  Returns
    ``([(key, X_micro, X_lesion, sham_rows, subj_rows), ...], n_subj)``."""
    micro = list(cfg.microstructure_features)
    lesion = list(cfg.lesion_features)
    tracts = list(cfg.geometry_tracts)
    parsers = _profile_parsers(micro, lesion)

    subj_of = _subject_index(cfg)
    tensors = {(t, tp): ([], [], [], []) for t in tracts
               for tp in cfg.timepoints}
    for g, sids in cfg.subjects_by_group().items():
        for sid in sids:
            for tp in cfg.timepoints:
                fp = _profile_file(root, sid, tp)
                if not fp.exists():
                    continue
                M, Lm, runs = _parse_profile_file(fp, micro, lesion, *parsers)
                _accumulate_runs(tensors, tracts, M, Lm, runs,
                                 g == "Sham", subj_of[sid], tp)
    return _stack_members(tensors), len(subj_of)


def stream_profile_blocks(root: Path, cfg):
    """Timepoint-major variant of fast_profile_tensors: yields
    ``(tp, members)`` as soon as ALL subjects' files for that timepoint are
    parsed, so the caller can launch that block's fleet members while later
    timepoints are still being read (bench streaming pipeline — the host
    CSV parse and the fleet H2D upload share the wall-clock instead of
    serializing).  Member tuples and subject indices match
    fast_profile_tensors exactly; only the grouping differs."""
    micro = list(cfg.microstructure_features)
    lesion = list(cfg.lesion_features)
    tracts = list(cfg.geometry_tracts)
    parsers = _profile_parsers(micro, lesion)
    subj_of = _subject_index(cfg)

    for tp in cfg.timepoints:
        tensors = {(t, tp): ([], [], [], []) for t in tracts}
        for g, sids in cfg.subjects_by_group().items():
            for sid in sids:
                fp = _profile_file(root, sid, tp)
                if not fp.exists():
                    continue
                M, Lm, runs = _parse_profile_file(fp, micro, lesion, *parsers)
                _accumulate_runs(tensors, tracts, M, Lm, runs,
                                 g == "Sham", subj_of[sid], tp)
        yield tp, _stack_members(tensors)



def warmup_backend():
    """Untimed: the remote TPU backend pays a large, highly variable
    (10-300 s) one-time cost on a process's FIRST executed program; trigger it
    before the timed window.  This is connection/backing-service warmup, not
    workload compute.

    Watchdog: a WEDGED axon attachment was observed to hang backend init for
    >20 minutes (round 4) — a bench that hangs forever leaves the round with
    no artifact at all.  If the first program hasn't completed within
    BENCH_BACKEND_TIMEOUT_S (default 600 s — well past the healthy-init tail)
    the watchdog prints a diagnostic and hard-exits 3, which the driver can
    record.  A blocked C call can't be interrupted, hence os._exit from a
    timer thread rather than an exception."""
    import threading
    timeout = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", "600"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(timeout):
            # The attachment wedges for 10-60+ min several times a day
            # (observed r4/r5) and usually returns within a few minutes —
            # a bounded self-re-exec gives a single driver invocation a
            # second (and third) chance at producing a JSON artifact
            # instead of guaranteeing rc=3.  A fresh PROCESS is required:
            # a blocked PJRT init can't be retried in-process.
            retries = int(os.environ.get("BENCH_WEDGE_RETRIES", "2"))
            if retries > 0:
                wait = float(os.environ.get("BENCH_WEDGE_WAIT_S", "240"))
                log(f"[bench] backend init blocked {timeout:.0f}s (wedged "
                    f"attachment) — re-exec in {wait:.0f}s "
                    f"({retries} retries left)")
                if done.wait(wait):
                    # The wedge cleared DURING the retry wait and the main
                    # thread is mid-run — re-exec'ing now would kill a
                    # healthy run (observed live: warmup returned at 790 s,
                    # 30 s before the blind re-exec fired).  Stand down.
                    log("[bench] backend recovered during the re-exec wait "
                        "— watchdog standing down")
                    return
                env = dict(os.environ,
                           BENCH_WEDGE_RETRIES=str(retries - 1))
                try:
                    os.execve(sys.executable,
                              [sys.executable] + sys.argv, env)
                except OSError as e:
                    log(f"[bench] re-exec failed: {e!r}")
            log(f"[bench] FATAL: backend init/first program still blocked "
                f"after {timeout:.0f}s — the device attachment is wedged; "
                f"no timed run is possible")
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax.numpy as jnp
    wedge_sim = float(os.environ.get("BENCH_TEST_WEDGE_S", "0"))
    if wedge_sim:  # test hook: simulate a wedged attachment deterministically
        time.sleep(wedge_sim)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: jnp.tanh(x @ x))(jnp.ones((512, 512),
                                                           jnp.float32)))
    done.set()
    attach_s = time.perf_counter() - t0
    log(f"[setup] backend warmup in {attach_s:.1f}s")
    return probe_link() + (attach_s,)


def probe_link(mb: int = 32):
    """Measure the attachment's H2D/D2H bandwidth with one ``mb``-MB
    round-trip.  The link speed (7-40 MB/s observed across sessions) sets
    the floor for the ~600 MB (f32) / ~400 MB (u16 fleet upload) a full run
    ships, so the reading contextualizes every wall-clock in this log."""
    import jax.numpy as jnp
    x = np.random.default_rng(0).random((mb * 1024 * 1024 // 4,)
                                        ).astype(np.float32)
    t0 = time.perf_counter()
    d = jax.device_put(x)
    d.block_until_ready()
    h2d = mb / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(d)
    d2h = mb / (time.perf_counter() - t0)
    log(f"[setup] link probe: H2D {h2d:.1f} MB/s, D2H {d2h:.1f} MB/s "
        f"({mb} MB round-trip)")
    return h2d, d2h


def _arm_deadline():
    """Whole-run insurance against a MID-run tunnel wedge: the backend
    watchdog (warmup_backend) only covers the first program.  If the bench
    hasn't finished within BENCH_TOTAL_DEADLINE_S (default 2700 s — far above
    the slowest legitimate run observed, 264 s cold start + repeats), print a
    diagnostic and hard-exit 4 so the driver records a failure, not a hang."""
    import threading
    deadline = float(os.environ.get("BENCH_TOTAL_DEADLINE_S", "2700"))

    def _watchdog():
        time.sleep(deadline)
        log(f"[bench] FATAL: run exceeded {deadline:.0f}s total deadline — "
            f"device attachment likely wedged mid-run")
        os._exit(4)

    threading.Thread(target=_watchdog, daemon=True).start()


def main():
    from lesionvae_tpu.utils.cache import CacheCounter

    _arm_deadline()
    root = Path(os.environ.get("BENCH_ROOT", "/tmp/lesionvae_bench"))
    root.mkdir(parents=True, exist_ok=True)
    cache_counter = CacheCounter()  # before any compile
    cfg = setup_cohort(root)
    link = warmup_backend()
    log(f"[bench] devices: {jax.devices()}")

    # u16 upload auto-policy: quantizing the fleet upload halves its bytes
    # (393 -> 197 MB) for a 0.3 s (idle) - 3.4 s (tunnel-contended) host
    # pass.  The r3 threshold (f32 above 30 MB/s) came from fleet_first-era
    # runs where the quantize sat inside the timed enqueue window; under
    # the round-4 'overlap' order a matched-weather A/B at a 31.9 MB/s link
    # (benchmarks/upload_ab_probe.py, both knobs alternated IN ONE process)
    # measured u16 winning BOTH cycles: 32.4 vs 38.4 s and 35.9 vs 74.3 s.
    # Break-even is ~196 MB / 3.4 s ~= 58 MB/s even at the worst observed
    # quantize cost, so 'auto' picks u16 for any link below 60 MB/s (every
    # link ever probed on this attachment: 7-41 MB/s).
    if _fleet_knobs()["upload"] == "auto":
        choice = "u16" if link[0] < 60.0 else "f32"
        os.environ["BENCH_FLEET_UPLOAD"] = choice
        log(f"[setup] fleet upload auto-policy: {choice} "
            f"(H2D {link[0]:.1f} MB/s)")

    # geometry upload auto-policy: the u16 delta codec ships 70.8 MB instead
    # of 141.6 (ops.geo_codec) for a ~0.5-2.5 s host pass (native encode
    # 0.24-0.29 s idle + f64 torsion, contention-scaled).  Unlike the fleet
    # knob this is NOT a win at every link: the matched-weather A/B
    # (benchmarks/geo_upload_ab_probe.py, ~25-35 MB/s window) measured a
    # wash on bests (19.76 vs 19.86 s) with u16d behind in all 3 cycles —
    # at fast links the stream pipeline already hides the geometry upload
    # and the encode just adds 1-core host work.  The codec only pays when
    # the wire is the binding constraint: below 20 MB/s the 70.8 MB saved
    # is >= 3.5 s against the worst-case host cost.
    if _fleet_knobs()["geo"] == "auto":
        gchoice = "u16d" if link[0] < 20.0 else "f32"
        os.environ["BENCH_GEO_UPLOAD"] = gchoice
        log(f"[setup] geometry upload auto-policy: {gchoice} "
            f"(H2D {link[0]:.1f} MB/s)")

    cold_start = None
    warm_mode = os.environ.get("BENCH_WARM_MODE", "compile")
    if os.environ.get("BENCH_WARMUP_PASS", "1") == "1":
        # Untimed warmup pass: compiles/loads every program once so the timed
        # pass measures steady-state pipeline throughput (XLA executables are
        # reusable across runs in production; first-compile is a one-time
        # cost, and on this remote attachment a highly variable one).  Its
        # wall-clock IS the cold-start number, reported alongside.
        # Default mode "compile": the big H2D blocks are replaced by tiny
        # patterns tiled/broadcast ON DEVICE at the exact production avals
        # (launch_bundle_metrics/launch_many_vaes warm_compile) — every
        # program still compiles, loads, and executes once, but the warmup
        # ships ~KB instead of ~340 MB over the 7-40 MB/s link, which was
        # most of the r3/r4 cold_start_s.  BENCH_WARM_MODE=full restores
        # the full-data warmup (the pre-round-4 cold-start definition).
        log(f"[setup] warmup pass (untimed cold start, mode={warm_mode}) ...")
        t0 = time.perf_counter()
        _run_pipeline(root, cfg, warm=True,
                      warm_compile=(warm_mode == "compile"))
        cold_start = time.perf_counter() - t0
        log(f"[setup] cold-start pass done in {cold_start:.1f}s")

    # the remote attachment's throughput (and the shared host's CPU) swings
    # 2-5x between runs; report the best of N repeats as the steady-state
    # wall-clock
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # BENCH_ORDER=ab (VERDICT r3 #4): alternate the fleet-enqueue/geometry-
    # fetch interleave across repeats IN ONE PROCESS, so both orders face the
    # same link weather — the only fair way to A/B on an attachment whose
    # throughput swings 2-5x between processes.
    ab = os.environ.get("BENCH_ORDER", "fleet_first") == "ab"
    _AB_ORDERS = ["overlap", "geo_first", "fleet_first"]
    orders = (_AB_ORDERS * repeats)[:max(repeats, len(_AB_ORDERS))] \
        if ab else [None] * repeats
    runs = []
    for o in orders:
        if o is not None:
            os.environ["BENCH_ORDER"] = o
        runs.append(_run_pipeline(root, cfg, warm=False, emit=False) + (o,))
    # weather-adaptive extension: the attachment's throughput swings 2-5x
    # BETWEEN repeats, not just between processes (observed 32/46/40 s for
    # identical work in one process).  When the spread says the window was
    # noisy, buy up to BENCH_REPEATS_EXTRA more samples so the recorded
    # best reflects the pipeline, not one bad gust.  Skipped in ab mode
    # (extra unpaired runs would bias the order comparison).
    extra_reps = int(os.environ.get("BENCH_REPEATS_EXTRA", "2"))
    while (not ab and extra_reps > 0 and len(runs) >= 2
           and (max(r[0] for r in runs) - min(r[0] for r in runs))
           > 0.4 * min(r[0] for r in runs)):
        extra_reps -= 1
        log(f"[bench] noisy window (spread {max(r[0] for r in runs):.1f}/"
            f"{min(r[0] for r in runs):.1f}s) -> extra repeat")
        runs.append(_run_pipeline(root, cfg, warm=False, emit=False)
                    + (None,))
    ab_fields = {}
    if ab:
        os.environ["BENCH_ORDER"] = "ab"
        for o in _AB_ORDERS:
            sel = [r[0] for r in runs if r[4] == o]
            log(f"[bench] order={o}: {[round(v, 1) for v in sel]} "
                f"-> best {min(sel):.2f}s")
            ab_fields[f"order_{o}_s"] = round(min(sel), 3)
    best_total, best_steps, exclusions, best_dt, _ = min(runs,
                                                         key=lambda r: r[0])
    log(f"[bench] repeats: {[round(r[0], 1) for r in runs]} "
        f"-> best {best_total:.2f}s")
    # device_time_s belongs to the SAME run as value/vae_steps_per_s (one
    # coherent row); the min across repeats is reported separately as the
    # weather-independent regression signal
    extra = {"vae_steps_per_s": round(best_steps, 1),
             "repeats_s": [round(r[0], 2) for r in runs],
             "device_time_s": round(best_dt, 2),
             "device_time_min_s": round(min(r[3] for r in runs), 2),
             "link_h2d_mb_s": round(link[0], 1),
             "link_d2h_mb_s": round(link[1], 1),
             # attach weather: healthy 10-300 s, wedged 600+ (watchdog
             # re-exec territory) — contextualizes cold_start_s, which
             # deliberately EXCLUDES this one-time connection cost
             "backend_attach_s": round(link[2], 1),
             "cache_hits": cache_counter.hits,
             "cache_misses": cache_counter.misses,
             **ab_fields}
    if cold_start is not None:
        extra["cold_start_s"] = round(cold_start, 1)
        extra["warmup_mode"] = warm_mode  # "compile" ships ~KB, "full" all

    # Approximation-free reference pass (VERDICT r3 #6): one extra timed run
    # with every precision knob OFF (f32 compute/storage/upload) so the cost
    # of the bf16/u16 knobs stays auditable from the JSON alone.  Same
    # process, same weather window as the best-of-N above.
    if os.environ.get("BENCH_F32_PASS", "1") == "1":
        saved = {k: os.environ.get(k) for k in
                 ("BENCH_FLEET_DTYPE", "BENCH_FLEET_STORE",
                  "BENCH_FLEET_UPLOAD", "BENCH_GEO_UPLOAD")}
        os.environ.update({"BENCH_FLEET_DTYPE": "f32",
                           "BENCH_FLEET_STORE": "f32",
                           "BENCH_FLEET_UPLOAD": "f32",
                           "BENCH_GEO_UPLOAD": "f32"})
        log("[bench] full-precision pass (all knobs f32) ...")
        _run_pipeline(root, cfg, warm=True,  # untimed: compiles f32 programs
                      warm_compile=(warm_mode == "compile"))
        f32_total, *_ = _run_pipeline(root, cfg, warm=False, emit=False)
        extra["full_precision_value_s"] = round(f32_total, 3)
        log(f"[bench] full-precision wall-clock {f32_total:.2f}s "
            f"(vs {best_total:.2f}s with approximations)")
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else \
                os.environ.__setitem__(k, v)

    # True on-device execution time (VERDICT r3 #3): one extra untimed pass
    # under jax.profiler.trace; the xplane device planes record per-module
    # exec durations — a weather-independent regression signal, unlike
    # device_time_s (host wait-windows that move with the link).
    if os.environ.get("BENCH_DEVICE_PROFILE", "1") == "1":
        import tempfile

        from lesionvae_tpu.utils.device_trace import (device_exec_by_module,
                                                      stage_breakdown)
        trace_dir = tempfile.mkdtemp(prefix="bench_devtrace_")
        log("[bench] profiled pass (untimed, for device_exec_s) ...")
        from lesionvae_tpu.train import batched as _batched
        _batched.reset_fleet_ledger()  # scope the traffic model to this pass
        try:
            with jax.profiler.trace(trace_dir):
                _run_pipeline(root, cfg, warm=True)
            per_module = device_exec_by_module(trace_dir)
        except Exception as e:  # profiling must never kill the bench
            log(f"[bench] device profiling unavailable: {e!r}")
            per_module = {}
        if not per_module:
            # verified: CPU traces carry only /host planes, so the field is
            # absent (not zero) on non-TPU runs — say so instead of silence
            log("[bench] device profiling: no device planes in trace "
                "(CPU backend or empty trace); device_exec_s omitted")
        else:
            breakdown = stage_breakdown(per_module)
            log(f"[bench] device exec by stage: {breakdown}")
            top = sorted(per_module.items(), key=lambda kv: -kv[1])[:8]
            log("[bench] device exec by module: "
                + ", ".join(f"{k}={v:.2f}s" for k, v in top))
            extra["device_exec_s"] = breakdown.pop("total")
            extra["device_exec"] = breakdown
            # HBM traffic model (VERDICT r4 #3): turn the xplane-measured
            # fleet device-exec seconds into achieved bytes/s + MFU vs the
            # v5e peaks (819 GB/s, 197 bf16 TFLOP/s) using the static
            # per-step byte/FLOP counts (utils/cost_model.py — param tree
            # via eval_shape, activation boundaries per the model walk).
            try:
                import jax.numpy as jnp

                from lesionvae_tpu.utils.cost_model import \
                    bench_traffic_fields
                knobs = _fleet_knobs()
                dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}
                extra.update(bench_traffic_fields(
                    _batched.FLEET_LAUNCH_LEDGER,
                    epochs=40 if SCALE == "full" else 5, batch_size=64,
                    store_dtype=dt[knobs["store"]],
                    compute_dtype=dt[knobs["dtype"]],
                    fleet_device_s=breakdown.get("fleet", 0.0)))
                if "fleet_hbm_gbps" in extra:
                    log(f"[bench] fleet traffic model: "
                        f"{extra['fleet_traffic_gb']} GB moved in "
                        f"{breakdown.get('fleet', 0.0):.2f}s device -> "
                        f"{extra['fleet_hbm_gbps']} GB/s achieved "
                        f"({extra['fleet_hbm_frac_peak']:.0%} of v5e peak), "
                        f"MFU {extra['fleet_mfu']:.1%}")
            except Exception as e:  # the model must never kill the bench
                log(f"[bench] fleet traffic model unavailable: {e!r}")
    print(json.dumps(_result_json(best_total, exclusions, extra)))


def _run_pipeline(root, cfg, warm: bool, emit: bool = False,
                  warm_compile: bool = False):
    # default per the matched-weather A/B (benchmarks/pipe_ab_probe.py):
    # stream won every cycle — 16.9/19.5, 18.3/19.2, 21.8/24.9 s at a
    # 19.6 MB/s link (and 3/3 cycles of an earlier, noisier session).
    # BENCH_PIPE=batch restores the parse-everything-then-launch pipeline.
    if os.environ.get("BENCH_PIPE", "stream") == "stream":
        return _run_pipeline_stream(root, cfg, warm, emit,
                                    warm_compile=warm_compile)

    from lesionvae_tpu.pipeline.geometry_run import launch_geometry
    from lesionvae_tpu.pipeline.lesion_run import run_lesion_analysis
    from lesionvae_tpu.train.batched import launch_many_vaes, pad_datasets

    out_dir = root / "bench_results"
    epochs = 40 if SCALE == "full" else 5
    exclusions = []
    t_start = time.perf_counter()

    # ---- stage 1: geometry read + device launch ---------------------------
    # The cohort read is host-bound; the enqueued device programs then
    # execute while the host builds the VAE tensors (stage 2) — the
    # geometry device time is fully hidden behind host work.
    t0 = time.perf_counter()
    geo_finish = launch_geometry(cfg, data_dir=root / "data",
                                 output_dir=out_dir / "geometry",
                                 max_streamlines=100,
                                 upload=_geo_upload(),
                                 warm_compile=warm_compile)
    t_geo_launch = time.perf_counter() - t0
    log(f"[bench] geometry read+launch in {t_geo_launch:.2f}s")

    # ---- stage 2: VAE tensors — CSV → tensors → normalization → padding.
    # TIMED (reference stage data_loader.py:27-148).  An opt-in derived-data
    # cache exists for fast iteration (BENCH_TENSOR_CACHE=1) and is reported
    # as an exclusion in the emitted JSON when used. --------------------------
    t0 = time.perf_counter()
    cache = root / f"tensor_cache_raw_{SCALE}"  # RAW blocks (norm on device)
    use_cache = os.environ.get("BENCH_TENSOR_CACHE", "0") == "1"
    if use_cache and (cache / "subj_T.npy").exists():
        # raw .npy + mmap: zip-archived npz decompression costs up to 30s on
        # this single-core host; mmap defers the read into the H2D copy
        Xm = np.load(cache / "Xm.npy", mmap_mode="r")
        Xl = np.load(cache / "Xl.npy", mmap_mode="r")
        n_real = np.load(cache / "n_real.npy")
        sham_T = np.load(cache / "sham_T.npy")
        subj_T = np.load(cache / "subj_T.npy")
        n_subj = int(subj_T.max())  # pad segment == n_subj
        exclusions.append("tensor_build_cached")
        log(f"[bench] loaded {len(n_real)} cached VAE datasets")
    else:
        tensor_list, n_subj = fast_profile_tensors(root, cfg)
        # RAW blocks: fit+apply normalization runs INSIDE the fleet program
        # (train.data.normalize_on_device) — the reference stage
        # normalization.py:8-69 on the TPU instead of ~2 s of 1-core host
        Xm, Xl, n_real = pad_datasets(
            [(xm, xl) for _, xm, xl, _, _ in tensor_list], batch_size=64)
        sham_T = np.zeros(Xm.shape[:2], np.float32)
        subj_T = np.full(Xm.shape[:2], n_subj, np.int32)  # pad seg = n_subj
        for i, (_, _, _, sham_rows, subj_rows) in enumerate(tensor_list):
            sham_T[i, :len(sham_rows)] = sham_rows
            subj_T[i, :len(subj_rows)] = subj_rows
        if use_cache:
            cache.mkdir(parents=True, exist_ok=True)
            np.save(cache / "Xm.npy", Xm)
            np.save(cache / "Xl.npy", Xl)
            np.save(cache / "n_real.npy", n_real)
            np.save(cache / "sham_T.npy", sham_T)
            np.save(cache / "subj_T.npy", subj_T)
    t_build = time.perf_counter() - t0
    T = len(n_real)
    log(f"[bench] {T} VAE datasets ready in {t_build:.2f}s "
        f"(CSV->tensors->norm->pad{' [cached]' if exclusions else ''})")

    # ---- stage 3: lesion SH + heme (small device programs — run BEFORE the
    # fleet so they don't queue behind its 10 s program) --------------------
    t0 = time.perf_counter()
    les_df = run_lesion_analysis(cfg, data_dir=root / "data",
                                 output_dir=out_dir / "lesion",
                                 max_l=6, num_samples=2000, seed=0)
    t_sh = time.perf_counter() - t0
    log(f"[bench] lesion SH: {len(les_df)} records in {t_sh:.2f}s")

    # ---- stage 4: launch the VAE fleet (device, queues after geometry) ----
    # bf16 compute (f32 params/BatchNorm stats/loss — the standard TPU
    # mixed-precision recipe): 9.8 s vs 14.1 s f32 for the 40-epoch fleet
    # program.  Earlier rounds measured bf16 LOSING in-scan; that was the
    # strided-slice avg_pool gather forcing layout round-trips, fixed in
    # models/layers.py.  tests/test_mixed_precision.py pins the bf16 curve
    # to the f32 curve within 10%.
    import jax.numpy as jnp
    knobs = _fleet_knobs()
    fleet_dtype = {"f32": None, "bf16": jnp.bfloat16}[knobs["dtype"]]
    # bf16 STORAGE with stochastic rounding (train.lowmem): the step is
    # HBM-bound on f32 weight+moment streams; bf16 storage measured
    # 17.0 -> 12.9 ms/fleet-step (1.33x) with the curve pinned to f32 in
    # tests/test_lowmem.py.  BENCH_FLEET_STORE=f32 restores full precision.
    store_dtype = {"f32": None, "bf16": jnp.bfloat16}[knobs["store"]]
    # uint16 fixed-point upload (train.quantize): the raw fleet tensors are
    # ~400 MB of the ~600 MB that must cross the 7-40 MB/s link per run —
    # u16 codes halve that at ~1.5e-5 relative range precision (z-scores
    # shift ~1e-4; parity pinned in tests/test_quantize_upload.py).
    # BENCH_FLEET_UPLOAD=f32 restores the full-precision upload.
    quant = knobs["upload"] == "u16"

    # Stage order knob (VERDICT r3 #4): 'overlap' (default) drains the
    # geometry D2H (small), enqueues the fleet's large H2D behind it, and
    # runs geometry's host tail (f64 refine, groupby, CSV) while the upload
    # streams; 'geo_first' finishes geometry entirely before the fleet;
    # 'fleet_first' enqueues the fleet before touching geometry.  Decided by
    # matched-weather A/Bs (BENCH_ORDER=ab, round 4): geo_first 27.6 s vs
    # fleet_first 32.1 s at a 16 MB/s link (the geometry fetch queued behind
    # the fleet upload), then overlap 41.3 s vs geo_first 46.4 s in the same
    # cycle of a slower day — the host tail hides under the upload.
    order = os.environ.get("BENCH_ORDER", "overlap")

    # member-chunked launch (train.batched upload_chunks): the attachment
    # streams H2D while programs execute (benchmarks/h2d_exec_overlap_probe
    # .py), so chunk N+1's upload + host quantize hides under chunk N's
    # exec — the fleet's ~7.5 s device exec comes off the critical path.
    # Results are member-identical to the single launch (one compile, keys
    # sliced, per-member quantization ranges; tests/test_upload_chunks.py).
    # Default "auto" (largest divisor of T <= 8): the matched-weather A/B
    # (benchmarks/chunks_ab_probe.py, 34 MB/s link) measured bench wall
    # 31.96 / 24.16 / 19.83 s for chunks 1 / 4 / 8 — fleet-collect drops
    # 16.1 -> 5.9 s.  BENCH_FLEET_CHUNKS=<int> overrides.
    chunks = _fleet_knobs()["chunks"]
    chunks = chunks if chunks == "auto" else int(chunks)

    def _launch_fleet():
        t0 = time.perf_counter()
        handle = launch_many_vaes(
            Xm, Xl, n_real, latent_dim=10, epochs=epochs, batch_size=64,
            seed=42, compute_dtype=fleet_dtype, store_dtype=store_dtype,
            summary_spec=(sham_T, subj_T, n_subj + 1, 42),
            normalize_on_device=True, quantize_upload=quant,
            upload_chunks=chunks, warm_compile=warm_compile)
        log(f"[bench] fleet enqueued in {time.perf_counter() - t0:.2f}s")
        return handle

    def _finish_geometry():
        t0 = time.perf_counter()
        geo_df = geo_finish()
        dt = time.perf_counter() - t0
        log(f"[bench] geometry: {len(geo_df)} bundles in "
            f"{t_geo_launch + dt:.2f}s total")
        return geo_df, dt

    # ---- stages 4+5: fleet launch / geometry finish, order per knob -------
    if order == "overlap":
        # drain geometry's SMALL D2H (stacked metrics, ~18 MB) first, put
        # the fleet's large H2D behind it on the link, then run geometry's
        # host tail (f64 refine, groupby, CSV writes, ~2-3 s of 1-core CPU)
        # WHILE the upload streams — the tail is pure host work the link
        # doesn't need.
        t0 = time.perf_counter()
        geo_finish.drain()
        t_drain = time.perf_counter() - t0
        t_fleet_launch = time.perf_counter()
        handle = _launch_fleet()
        geo_df, t_geo_finish = _finish_geometry()
        t_geo_finish += t_drain
    elif order == "geo_first":
        geo_df, t_geo_finish = _finish_geometry()
        t_fleet_launch = time.perf_counter()
        handle = _launch_fleet()
    else:
        t_fleet_launch = time.perf_counter()
        handle = _launch_fleet()
        geo_df, t_geo_finish = _finish_geometry()
    t_geo = t_geo_launch + t_geo_finish

    # ---- stage 6: collect the fleet + fused normative summary -------------
    # Training, sham statistics, and the on-device z-score reduction ran as
    # ONE device program (launch_many_vaes summary_spec); only history +
    # per-subject profiles + magnitudes cross the D2H link (<10 MB — the
    # full z block would be ~1.2 GB at tens of MB/s).  The history fetch
    # reads hist_T directly: handle.fetch() would slice 64 per-member param
    # pytrees (~3k tiny device ops on the remote link, ~2 s) that the bench
    # never consumes. -------------------------------------------------------
    t0 = time.perf_counter()
    hist = np.asarray(handle.hist_T)
    assert hist.shape[0] == len(n_real) and hist.shape[1] == epochs
    t_fetch = time.perf_counter() - t0
    _m, _s, mag_T, prof_T, _cnt = [np.asarray(x) for x in handle.summary_T]
    assert (prof_T.shape[0] == T and mag_T.shape[0] == T
            and np.isfinite(mag_T).all())
    t_vae = time.perf_counter() - t0
    log(f"[bench]   fleet fetch {t_fetch:.2f}s | normative x{T} "
        f"{t_vae - t_fetch:.2f}s")
    steps = epochs * (Xm.shape[1] // 64) * T
    fleet_wall = time.perf_counter() - t_fleet_launch  # launch → collected
    log(f"[bench] VAE fleet: {T} VAEs x {epochs} epochs "
        f"({steps} steps) collected in {t_vae:.2f}s; "
        f"aggregate {steps / fleet_wall:.0f} steps/s over the launch→collect "
        f"window (BASELINE.md 'VAE steps/sec')")

    total = time.perf_counter() - t_start
    tag = "warmup" if warm else "TOTAL"
    log(f"[bench] {tag} {total:.2f}s  (build {t_build:.1f} | geo {t_geo:.1f} "
        f"| sh {t_sh:.1f} | fleet-collect {t_vae:.1f}; "
        f"target {BASELINE_TARGET_S}s)")

    # device-time secondary metric (VERDICT r2 #8): the sum of the windows
    # spent waiting on device programs + their D2H fetches — the stages NOT
    # on the host CPU.  The shared host's CPU weather swings the wall-clock
    # 2-5x between runs; this number moves only with device/link behavior,
    # so a code regression in the compute path stays visible through host
    # weather (and vice versa).
    device_time = t_geo_finish + t_vae + t_sh
    log(f"[bench] {tag} device-side time {device_time:.2f}s "
        f"(geo-finish {t_geo_finish:.1f} + fleet {t_vae:.1f} + sh {t_sh:.1f})")

    if emit:
        print(json.dumps(_result_json(total, exclusions)))
    return total, steps / fleet_wall, exclusions, device_time


def _run_pipeline_stream(root, cfg, warm: bool, emit: bool = False,
                         warm_compile: bool = False):
    """Streaming pipeline (BENCH_PIPE=stream): the host CSV parse and the
    fleet H2D upload share the wall-clock instead of serializing.

    The batch pipeline parses ALL profile CSVs (~7-9 s of 1-core host work)
    before the first fleet byte reaches the link; here each timepoint's 16
    members launch as soon as that timepoint's files are parsed, so block
    N+1's parse runs while block N's u16 upload streams (the attachment
    overlaps H2D with execution — benchmarks/h2d_exec_overlap_probe.py).
    Stage order:
      1. geometry read + device launch (its H2D leads the link queue)
      2. per timepoint: parse -> pad -> launch (upload_chunks subdivides
         within a block); geometry's small D2H drains after block 1
      3. geometry host tail (f64 refine, groupby, CSV) under the last
         blocks' uploads
      4. lesion SH: its host part (NIfTI reads) also runs under the
         uploads, and its tiny device programs queue behind the fleet
         blocks — the wait merges with the fleet-collect wait that
         follows anyway.  (Running SH FIRST was measured to cost 3.3-3.6 s
         vs the batch pipeline's 0.9 s: its small programs stalled behind
         the still-streaming 141 MB geometry upload.)
      5. collect every block
    Per-member training is key-identical to ONE logical fleet: every member
    takes its key from the canonical tract-major (tract x timepoint) grid
    via member_keys, so results do not depend on block boundaries
    (tests/test_upload_chunks.py pins the split-launch contract).
    """
    import jax
    import jax.numpy as jnp

    from lesionvae_tpu.pipeline.geometry_run import launch_geometry
    from lesionvae_tpu.pipeline.lesion_run import launch_lesion_analysis
    from lesionvae_tpu.train.batched import launch_many_vaes, pad_datasets

    out_dir = root / "bench_results"
    epochs = 40 if SCALE == "full" else 5
    exclusions = []
    t_start = time.perf_counter()

    t0 = time.perf_counter()
    geo_finish = launch_geometry(cfg, data_dir=root / "data",
                                 output_dir=out_dir / "geometry",
                                 max_streamlines=100,
                                 upload=_geo_upload(),
                                 warm_compile=warm_compile)
    t_geo_launch = time.perf_counter() - t0
    log(f"[bench] geometry read+launch in {t_geo_launch:.2f}s")

    knobs = _fleet_knobs()
    fleet_dtype = {"f32": None, "bf16": jnp.bfloat16}[knobs["dtype"]]
    store_dtype = {"f32": None, "bf16": jnp.bfloat16}[knobs["store"]]
    quant = knobs["upload"] == "u16"
    chunks = knobs["chunks"]
    chunks = chunks if chunks == "auto" else int(chunks)

    tracts = list(cfg.geometry_tracts)
    tps = list(cfg.timepoints)
    # canonical per-member keys: one grid split regardless of blocking
    grid_keys = np.asarray(jax.random.split(jax.random.PRNGKey(42),
                                            len(tracts) * len(tps)))
    subj_of = _subject_index(cfg)
    n_subj = len(subj_of)

    t_stream0 = time.perf_counter()
    blocks = []  # (tp, handle, n_real_b, T_b)
    n_pad0 = 0
    t_drain = 0.0
    for bi, (tp, members) in enumerate(stream_profile_blocks(root, cfg)):
        if not members:
            continue
        Xm_b, Xl_b, n_real_b = pad_datasets(
            [(xm, xl) for _, xm, xl, _, _ in members], batch_size=64,
            min_rows=n_pad0)
        if n_pad0 == 0:
            n_pad0 = Xm_b.shape[1]
        elif Xm_b.shape[1] != n_pad0:
            log(f"[bench] stream: block {tp} rows {Xm_b.shape[1]} != "
                f"{n_pad0} (extra program shape)")
        sham_b = np.zeros(Xm_b.shape[:2], np.float32)
        subj_b = np.full(Xm_b.shape[:2], n_subj, np.int32)  # pad segment
        for i, (_, _, _, sham_rows, subj_rows) in enumerate(members):
            sham_b[i, :len(sham_rows)] = sham_rows
            subj_b[i, :len(subj_rows)] = subj_rows
        tpi = tps.index(tp)
        keys_b = np.stack([grid_keys[tracts.index(k[0]) * len(tps) + tpi]
                           for k, *_ in members])
        T_b = len(members)
        bchunks = chunks if chunks == "auto" else max(
            g for g in range(1, chunks + 1) if T_b % g == 0)
        handle = launch_many_vaes(
            Xm_b, Xl_b, n_real_b, latent_dim=10, epochs=epochs,
            batch_size=64, seed=42, compute_dtype=fleet_dtype,
            store_dtype=store_dtype,
            summary_spec=(sham_b, subj_b, n_subj + 1, 42),
            normalize_on_device=True, quantize_upload=quant,
            upload_chunks=bchunks, member_keys=keys_b,
            warm_compile=warm_compile)
        blocks.append((tp, handle, n_real_b, T_b))
        log(f"[bench] stream: block {tp} ({T_b} members) launched at "
            f"+{time.perf_counter() - t_stream0:.2f}s")
        if bi == 0:
            # geometry's ~18 MB D2H: its programs led the link queue, so
            # the results are ready right after its upload tail — fetch
            # them now, before the remaining blocks' H2D monopolizes the
            # link (measured in the batch A/B: a fetch queued behind the
            # full fleet upload cost ~4.5 s)
            t0 = time.perf_counter()
            geo_finish.drain()
            t_drain = time.perf_counter() - t0
    t_build = time.perf_counter() - t_stream0  # parse+launch, interleaved

    # geometry host tail (f64 refine, groupby, CSV writes) — pure host work
    # that runs while the last blocks' uploads stream / programs execute
    t0 = time.perf_counter()
    geo_df = geo_finish()
    t_geo_finish = time.perf_counter() - t0 + t_drain
    t_geo = t_geo_launch + t_geo_finish
    log(f"[bench] geometry: {len(geo_df)} bundles in {t_geo:.2f}s total")

    # lesion SH: host prepare + device ENQUEUE only — the tiny SH program's
    # blocking fetch was measured 0.07-9.9 s for identical work depending
    # on the fleet traffic queued ahead of it; moving the fetch after the
    # fleet collect (below) takes that queue wait off the critical path
    t0 = time.perf_counter()
    les_finish = launch_lesion_analysis(cfg, data_dir=root / "data",
                                        output_dir=out_dir / "lesion",
                                        max_l=6, num_samples=2000, seed=0)
    t_sh = time.perf_counter() - t0
    log(f"[bench] lesion SH: prepared + enqueued in {t_sh:.2f}s")

    # collect every block (oldest first — FIFO matches execution order)
    t0 = time.perf_counter()
    T = sum(b[3] for b in blocks)
    hists, mags = [], []
    for tp, handle, n_real_b, T_b in blocks:
        hist_b = np.asarray(handle.hist_T)
        assert hist_b.shape[0] == T_b and hist_b.shape[1] == epochs
        hists.append(hist_b)
        _m, _s, mag_b, prof_b, _cnt = [np.asarray(x)
                                       for x in handle.summary_T]
        assert prof_b.shape[0] == T_b and np.isfinite(mag_b).all()
        mags.append(mag_b)
    hist = np.concatenate(hists)
    t_vae = time.perf_counter() - t0
    log(f"[bench]   fleet collect (all {len(blocks)} blocks) {t_vae:.2f}s")

    # SH fetch: its program ran during the fleet waits above, so this is
    # one small D2H + the host fill/CSV tail
    t0 = time.perf_counter()
    les_df = les_finish()
    t_sh += time.perf_counter() - t0
    log(f"[bench] lesion SH: {len(les_df)} records in {t_sh:.2f}s total")

    steps = epochs * (n_pad0 // 64) * T
    fleet_wall = time.perf_counter() - t_stream0
    log(f"[bench] VAE fleet: {T} VAEs x {epochs} epochs "
        f"({steps} steps) collected in {t_vae:.2f}s; "
        f"aggregate {steps / fleet_wall:.0f} steps/s over the "
        f"launch→collect window (BASELINE.md 'VAE steps/sec')")

    total = time.perf_counter() - t_start
    tag = "warmup" if warm else "TOTAL"
    log(f"[bench] {tag} {total:.2f}s  (build+launch {t_build:.1f} | geo "
        f"{t_geo:.1f} | sh {t_sh:.1f} | fleet-collect {t_vae:.1f}; "
        f"target {BASELINE_TARGET_S}s) [stream]")
    device_time = t_geo_finish + t_vae + t_sh
    log(f"[bench] {tag} device-side time {device_time:.2f}s "
        f"(geo-finish {t_geo_finish:.1f} + fleet {t_vae:.1f} + sh {t_sh:.1f})")

    if emit:
        print(json.dumps(_result_json(total, exclusions)))
    return total, steps / fleet_wall, exclusions, device_time


def _fleet_knobs():
    """The fleet precision knobs behind ONE accessor: behavior
    (_run_pipeline) and the honesty report (_approximations) read the same
    defaults, so the two cannot drift.  Each call re-reads os.environ —
    intentional, because main()'s auto-policy resolves "auto" by mutating
    BENCH_FLEET_UPLOAD before the pipeline runs."""
    return {"dtype": os.environ.get("BENCH_FLEET_DTYPE", "bf16"),
            "store": os.environ.get("BENCH_FLEET_STORE", "bf16"),
            "upload": os.environ.get("BENCH_FLEET_UPLOAD", "auto"),
            "chunks": os.environ.get("BENCH_FLEET_CHUNKS", "auto"),
            "geo": os.environ.get("BENCH_GEO_UPLOAD", "auto")}


def _geo_upload():
    """The geometry upload codec for _run_pipeline: main()'s link-keyed
    auto-policy resolves "auto" by mutating BENCH_GEO_UPLOAD; probes that
    call _run_pipeline directly get the measured-safe default (f32)."""
    geo = _fleet_knobs()["geo"]
    return "f32" if geo == "auto" else geo


def _approximations():
    """Precision knobs active in this run (each opt-out-able by env; each
    pinned by a distributional-parity test) — reported for honesty."""
    knobs = _fleet_knobs()
    out = []
    if knobs["dtype"] == "bf16":
        out.append("fleet_compute_bf16")      # tests/test_mixed_precision.py
    if knobs["store"] == "bf16":
        out.append("fleet_store_bf16_sr")     # tests/test_lowmem.py
    if knobs["upload"] == "u16":
        out.append("fleet_upload_u16")        # tests/test_quantize_upload.py
    if knobs["geo"] == "u16d":
        out.append("geometry_upload_u16_delta")  # tests/test_geo_codec.py
    return out


def _result_json(total, exclusions, extra=None):
    out = {
        "metric": "full_cohort_wallclock",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_TARGET_S / total, 3),
    }
    approx = _approximations()
    if approx:
        out["approximations"] = approx
    # not approximations (member math is chunk/block-independent) — recorded
    # so the pipelining config behind the number is auditable from the JSON
    out["fleet_chunks"] = _fleet_knobs()["chunks"]
    out["pipeline"] = os.environ.get("BENCH_PIPE", "stream")
    if exclusions:
        out["exclusions"] = exclusions
    if extra:
        out.update(extra)
    return out


if __name__ == "__main__":
    main()
