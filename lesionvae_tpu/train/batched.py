"""Cohort-batched VAE training: many (tract x timepoint) VAEs as ONE vmapped
XLA program.

The reference trains one VAE per invocation (vae_model.py:140-222); the cohort
has 16 tracts x 4 timepoints of them.  On TPU the whole fleet trains
concurrently: datasets are padded to a common (T, n_pad, L, C) block, and the
entire 40-epoch training program is vmapped over the leading axis — the MXU
sees batched matmuls T times wider instead of T sequential tiny programs.

Deviation from the single-VAE trainer (documented, distributional-parity
safe): per-epoch shuffling permutes all padded rows, so masked pad rows are
scattered through batches rather than collected in one tail batch; BatchNorm
statistics and the ELBO remain mask-exact, only batch composition differs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.lesion_vae import LesionConditionedVAE
from ..models.elbo import elbo
from ..utils.logging import get_logger
from .trainer import TrainedVAE, make_optimizer

log = get_logger("batched")

#: launch ledger — one (program, arg-aval tuple) entry per fleet-program
#: dispatch since the last reset.  The bench's HBM traffic model
#: (utils/cost_model.py) folds XLA cost_analysis over these to turn the
#: xplane-measured fleet device-exec seconds into achieved bytes/s and MFU
#: vs the chip's peaks.  Appending a ShapeDtypeStruct tree costs ~us per
#: dispatch; reset_fleet_ledger() bounds growth for long-lived processes.
FLEET_LAUNCH_LEDGER: list = []


def reset_fleet_ledger() -> None:
    FLEET_LAUNCH_LEDGER.clear()


import functools


@functools.lru_cache(maxsize=8)
def _fleet_program(n_pad: int, seq_len: int, micro_ch: int, lesion_ch: int,
                   latent_dim: int, epochs: int, batch_size: int, lr: float,
                   weight_decay: float, grad_clip: float,
                   compute_dtype=None, summary_n_seg: int = 0,
                   summary_seed: int = 0, normalize: bool = False,
                   store_dtype=None, dequant: bool = False,
                   flat_opt: bool = False, mesh=None):
    """Build (once per static config) the jitted vmapped training program.

    ``mesh``: optional jax.sharding.Mesh (hashable, so it participates in
    the lru_cache key).  When given, the vmapped member program is wrapped
    in ``shard_map`` over the mesh's ``data`` axis — members are independent
    models, so every op stays member-local and the partitioned program has
    ZERO collectives by construction.  Letting GSPMD partition the same
    program instead was measured (8-device CPU mesh) to insert 228
    all-gathers — it replicates the epoch permutation + batch gathers on
    every device, costing ~8x the single-device execution time and, on real
    multi-chip hardware, ICI traffic the workload doesn't need.

    ``summary_n_seg > 0`` appends the on-device normative summary
    (train.normative.member_summary) to each member AFTER its training scan
    — train + sham statistics + z-score reduction become ONE device program,
    saving a separate program dispatch (~2-3 s on the remote attachment).

    ``normalize`` prepends the reference's normalization stage
    (train.data.normalize_on_device): members receive RAW tensors and the
    program fits median/mean/std over real rows, imputes, z-scores and
    clamps on device — the host never touches the data after the CSV parse.
    The normalized blocks and per-member stats become extra outputs.

    Re-tracing this program costs tens of seconds of client time; caching the
    jitted callable makes repeated launches retrace-free."""
    n_batches = max(1, n_pad // batch_size)

    module = LesionConditionedVAE(seq_len=seq_len, micro_ch=micro_ch,
                                  lesion_ch=lesion_ch, latent=latent_dim,
                                  compute_dtype=compute_dtype)
    if flat_opt and store_dtype is None:
        # mirror launch_many_vaes' validation: direct _fleet_program callers
        # (benchmarks) must not silently measure the wrong variant
        raise ValueError("flat_opt requires store_dtype")
    if store_dtype is not None:
        # bf16-STORAGE fast path (train.lowmem): the step is HBM-bound on
        # f32 weight + Adam-moment streams (measured — see lowmem docstring);
        # weight leaves and their moments store in bf16 with stochastic
        # rounding, optimizer math stays f32.  ``flat_opt`` runs the
        # optimizer on the two flat buffers of flatten_partition — measured
        # 6x SLOWER on v5e (per-step tiled-layout relayouts; see the
        # flatten_partition docstring), kept opt-in for re-measurement
        from .lowmem import FlatLowmemOptimizer, LowmemOptimizer
        tx = (FlatLowmemOptimizer if flat_opt
              else LowmemOptimizer)(lr, weight_decay, grad_clip)
    else:
        tx = make_optimizer(lr, weight_decay, grad_clip)

    betas = jnp.asarray([
        0.1 + 1.9 * (ep / (epochs - 1)) if epochs > 1 else 1.0
        for ep in range(epochs)], jnp.float32)

    def init_one(key):
        k1, k2 = jax.random.split(key)
        variables = module.init(
            {"params": k1}, jnp.zeros((2, seq_len, micro_ch), jnp.float32),
            jnp.zeros((2, seq_len, lesion_ch), jnp.float32), k2,
            jnp.ones(2, jnp.float32), True)
        return variables["params"], variables["batch_stats"]

    def loss_fn(p, stats, xb_m, xb_l, mask, rng, beta):
        (xh, mu, logv), new_vars = module.apply(
            {"params": p, "batch_stats": stats}, xb_m, xb_l, rng, mask, True,
            mutable=["batch_stats"])
        # loss always in float32 (mixed-precision recipe)
        xh = jnp.nan_to_num(xh.astype(jnp.float32), nan=0.0)
        mu = jnp.nan_to_num(mu.astype(jnp.float32), nan=0.0)
        logv = jnp.nan_to_num(logv.astype(jnp.float32), nan=0.0)
        loss, recon, kld = elbo(xh, xb_m, mu, logv, beta=beta, mask=mask)
        return loss, (recon, kld, new_vars["batch_stats"])

    def train_one(Xm_i, Xl_i, n_i, key, sham_i=None, subj_i=None,
                  qparams=None):
        if dequant:
            # uint16 fixed-point upload (train.quantize): decode the raw
            # blocks on device; sentinels restore NaN/inf for the
            # normalization's median-imputation
            from .quantize import dequantize_u16
            lo_m, sc_m, lo_l, sc_l = qparams
            Xm_i = dequantize_u16(Xm_i, lo_m, sc_m)
            Xl_i = dequantize_u16(Xl_i, lo_l, sc_l)
        if normalize:
            from .data import normalize_on_device
            Xm_i, Xl_i, norm_stats = normalize_on_device(Xm_i, Xl_i, n_i)
        params, batch_stats = init_one(key)
        if store_dtype is not None:
            from .lowmem import cast_params_storage
            params = cast_params_storage(params, store_dtype)
            salt = jax.random.bits(jax.random.fold_in(key, 7), (), jnp.uint32)
            if flat_opt:
                from .lowmem import flatten_partition
                fw, fo, unflat = flatten_partition(params)
                pp = (fw, fo)
                to_model = lambda t: unflat(*t)          # noqa: E731
            else:
                pp, to_model = params, (lambda t: t)     # noqa: E731
            opt_state = tx.init(pp, salt=salt)
        else:
            pp, to_model = params, (lambda t: t)         # noqa: E731
            opt_state = tx.init(params)

        # the scan carry holds ``pp`` (the param tree, or the flat buffer
        # pair); gradients come out in the SAME representation because the
        # loss unflattens inside
        def loss_pp(pp_, stats, xb_m, xb_l, mask, rng, beta):
            return loss_fn(to_model(pp_), stats, xb_m, xb_l, mask, rng, beta)

        grad_pp = jax.value_and_grad(loss_pp, has_aux=True)

        def epoch_step(carry, inputs):
            ep_key, beta = inputs
            k_perm, k_eps = jax.random.split(ep_key)
            # permute INDICES only; each batch gathers its rows directly —
            # one data pass per epoch instead of materializing a shuffled
            # copy.  (An epoch-level materialized shuffle measured EQUAL,
            # 16.5 vs 16.4 ms/fleet-step bf16 — the step is compute-bound,
            # not gather-bound, so keep the lower-footprint form.)
            perm = jax.random.permutation(k_perm, n_pad)
            mask_ep = (perm < n_i).astype(jnp.float32)
            rngs = jax.random.split(k_eps, n_batches)

            def batch_step(carry, inputs):
                pp, stats, opt_state = carry
                b, rng = inputs
                start = b * batch_size
                idx = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
                xb_m = jnp.take(Xm_i, idx, axis=0)
                xb_l = jnp.take(Xl_i, idx, axis=0)
                mask = jax.lax.dynamic_slice_in_dim(mask_ep, start, batch_size)
                (loss, (recon, kld, new_stats)), grads = grad_pp(
                    pp, stats, xb_m, xb_l, mask, rng, beta)
                finite = jnp.isfinite(loss)
                if store_dtype is not None:
                    cand, new_opt = tx.step(grads, opt_state, pp)
                else:
                    updates, new_opt = tx.update(grads, opt_state, pp)
                    cand = jax.tree.map(lambda a, u: a + u, pp, updates)
                new_pp = jax.tree.map(
                    lambda a, c: jnp.where(finite, c, a), pp, cand)
                new_opt_state = jax.tree.map(
                    lambda a, c: jnp.where(finite, c, a), opt_state, new_opt)
                nv = jnp.sum(mask)
                w = jnp.where(finite, 1.0, 0.0)
                return ((new_pp, new_stats, new_opt_state),
                        w * jnp.stack([loss * nv, recon * nv, kld * nv, nv]))

            carry, stats = jax.lax.scan(
                batch_step, carry, (jnp.arange(n_batches), rngs))
            sums = jnp.sum(stats, axis=0)
            avg = jnp.where(sums[3] > 0, sums[:3] / sums[3], jnp.nan)
            return carry, jnp.concatenate([avg, beta[None]])

        k_run = jax.random.fold_in(key, 1)
        ep_keys = jax.random.split(k_run, epochs)
        (pp, batch_stats, _), hist = jax.lax.scan(
            epoch_step, (pp, batch_stats, opt_state), (ep_keys, betas))
        params = to_model(pp)
        out = (params, batch_stats, hist)
        if summary_n_seg > 0:
            from .normative import member_summary
            summ = member_summary(
                module, params, batch_stats, Xm_i, Xl_i, sham_i, subj_i,
                summary_n_seg, jax.random.PRNGKey(summary_seed),
                jax.random.PRNGKey(summary_seed + 1))
            out = out + (summ,)
        if normalize:
            out = out + (Xm_i, Xl_i, norm_stats)
        return out

    # wrappers fix the positional arity per static flag combination so
    # jax.vmap maps every argument over the member axis
    if summary_n_seg > 0 and dequant:
        fn = lambda Xm, Xl, n, k, sh, su, *q: train_one(  # noqa: E731
            Xm, Xl, n, k, sh, su, qparams=q)
    elif summary_n_seg > 0:
        fn = lambda Xm, Xl, n, k, sh, su: train_one(     # noqa: E731
            Xm, Xl, n, k, sh, su)
    elif dequant:
        fn = lambda Xm, Xl, n, k, *q: train_one(         # noqa: E731
            Xm, Xl, n, k, qparams=q)
    else:
        fn = train_one
    # stable program name so profiler traces attribute device time to the
    # fleet stage (utils/device_trace.py stage rules)
    fn.__name__ = "fleet_train"
    mapped = jax.vmap(fn)
    if mesh is not None:
        import functools as _ft

        from jax.sharding import PartitionSpec as _PSpec
        try:
            from jax import shard_map as _sm
            _smap = _ft.partial(_sm, check_vma=False)
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map as _sm
            _smap = _ft.partial(_sm, check_rep=False)
        mapped = _smap(mapped, mesh=mesh, in_specs=_PSpec("data"),
                       out_specs=_PSpec("data"))
        try:
            mapped.__name__ = "fleet_train"
        except AttributeError:
            pass
    return jax.jit(mapped), module, n_batches


class FleetHandle:
    """Handle to an in-flight fleet training launch.

    Calling it (or ``.fetch()``) blocks on the device futures and returns
    ``(list of TrainedVAE, (T, epochs, 4) history array)``.  The stacked
    ``params_T`` / ``stats_T`` device pytrees stay accessible so fleet-wide
    consumers (``train.normative.normative_zscores_fleet``) can run vmapped
    programs without re-stacking per-member slices.
    """

    def __init__(self, module, params_T, stats_T, hist_T, epochs, n_batches,
                 Xm_j=None, Xl_j=None, summary_T=None):
        self.module = module
        self.params_T = params_T
        self.stats_T = stats_T
        self.hist_T = hist_T
        # device-resident training tensors: downstream fleet programs
        # (normative z-scores) reuse them instead of re-uploading the numpy
        # blocks — a 2nd H2D of the cohort costs ~12 s on the remote link
        self.Xm_j = Xm_j
        self.Xl_j = Xl_j
        # fused normative summary futures (mean_T, std_T, mag_T, prof_T,
        # counts_T) when the launch requested one (summary_spec)
        self.summary_T = summary_T
        # per-member data-normalization stats when normalize_on_device
        self.norm_stats_T = None
        self._epochs = epochs
        self._n_batches = n_batches

    def fetch(self):
        hist = np.asarray(self.hist_T)
        T = hist.shape[0]
        models = []
        for i in range(T):
            p_i = jax.tree.map(lambda a, i=i: a[i], self.params_T)
            s_i = jax.tree.map(lambda a, i=i: a[i], self.stats_T)
            models.append(TrainedVAE(self.module, p_i, s_i))
        log.info("trained %d VAEs concurrently (%d epochs, %d batches/epoch)",
                 T, self._epochs, self._n_batches)
        return models, hist

    __call__ = fetch


def launch_many_vaes(Xm: np.ndarray, Xl: np.ndarray, n_real: np.ndarray,
                     latent_dim: int = 10, epochs: int = 40,
                     batch_size: int = 64, lr: float = 2e-4,
                     weight_decay: float = 1e-3, grad_clip: float = 2.0,
                     seed: int = 42, compute_dtype=None,
                     summary_spec=None,
                     normalize_on_device: bool = False,
                     mesh=None, store_dtype=None,
                     quantize_upload: bool = False,
                     flat_opt: bool = False,
                     upload_chunks: "int | str" = 1,
                     member_keys=None,
                     warm_compile: bool = False) -> FleetHandle:
    """Enqueue training of T VAEs concurrently; returns a FleetHandle.

    Args:
      Xm: (T, n_pad, L, Cm) padded microstructure tensors (pad rows zero).
      Xl: (T, n_pad, L, Cl) lesion tensors.
      n_real: (T,) real row counts per VAE.
      summary_spec: optional ``(sham_T, subj_idx_T, n_seg, norm_seed)`` —
        fuses the on-device normative summary into the SAME program
        (train.normative.member_summary); results appear as
        ``handle.summary_T``.
      normalize_on_device: treat Xm/Xl as RAW tensors and run the
        reference's fit+apply normalization inside the program
        (train.data.normalize_on_device).  ``handle.Xm_j``/``Xl_j`` then
        hold the device-resident NORMALIZED blocks and
        ``handle.norm_stats_T`` the per-member {median, mean, std}.
      store_dtype: optional (e.g. jnp.bfloat16) — store conv/dense weight
        leaves AND their Adam moments in this dtype with f32 optimizer math
        (train.lowmem).  The fleet step is HBM-bound on those streams
        (measured: the fused Adam pass alone is 9.3 of 16.6 ms/fleet-step
        in f32); bf16 storage halves them.  Opt-in; distributional parity
        vs the f32 trainer pinned in tests/test_lowmem.py.
      upload_chunks: split the launch into this many member-axis chunks,
        each its own H2D + program dispatch (single-chip only).  The axon
        attachment streams H2D bytes WHILE a program executes (measured:
        benchmarks/h2d_exec_overlap_probe.py — a 134 MB transfer completed
        in wire time during a 1 s burn, not wire+exec), so chunk N+1's
        upload (and its host-side quantize) hides under chunk N's
        execution: the fleet's device exec (~7.5 s on v5e) comes off the
        critical path.  All chunks share ONE compiled program (equal
        shapes); per-member results are bitwise independent of chunking
        (keys are split once then sliced; quantization ranges are
        per-member), pinned by tests/test_upload_chunks.py.  ``"auto"``
        picks the largest divisor of T that is <= 8 (1 when a mesh is
        given) — 8 chunks measured best on the matched-weather A/B
        (benchmarks/chunks_ab_probe.py: 31.96 / 24.16 / 19.83 s bench wall
        for 1 / 4 / 8 chunks at a 34 MB/s link).
      member_keys: optional (T, 2) uint32 PRNG keys, one per member,
        overriding the default ``split(PRNGKey(seed), T)`` derivation.
        Lets a caller launch one logical fleet as several separate
        launches (e.g. one per timepoint block, as each block's tensors
        finish building) with per-member training bit-identical to the
        single launch: pass the canonical fleet's key slice for each
        block (bench.py streaming pipeline).
      warm_compile: compile-and-load warmup mode — the big Xm/Xl blocks are
        replaced by a tiny host pattern TILED ON DEVICE to the exact same
        aval (shape/dtype), so the program compiles, loads, and executes
        once while shipping ~KB instead of the full block over the H2D
        link (the bench cold-start cost on the 7-40 MB/s attachment).
        Results are garbage by construction; callers discard the handle
        after fetching it.  Single-chip only.
      mesh: optional jax.sharding.Mesh — shard the MEMBER axis T over the
        mesh's ``data`` axis ("fleet parallelism": each device trains its
        own slice of independent VAEs, zero collectives, scaling the cohort
        linearly with chips; T must divide the data-axis size).  This is
        the cohort's natural multi-chip axis.  Implementation is shard_map,
        NOT GSPMD: letting the partitioner infer shardings for this program
        was measured to insert 228 all-gathers (replicated epoch
        permutation + batch gathers on every device) — see _fleet_program
        (SURVEY.md §5.7/§5.8).
    """
    T, n_pad, seq_len, micro_ch = Xm.shape
    lesion_ch = Xl.shape[3]
    assert (n_pad // batch_size) * batch_size == n_pad, \
        "pad the row axis to a multiple of batch_size"
    if quantize_upload and not normalize_on_device:
        raise ValueError("quantize_upload requires normalize_on_device "
                         "(the decoded raw values feed the on-device "
                         "normalization; see train.quantize)")
    if flat_opt and store_dtype is None:
        raise ValueError("flat_opt is part of the lowmem fast path; set "
                         "store_dtype (e.g. jnp.bfloat16) to enable it")
    n_seg = norm_seed = 0
    if summary_spec is not None:
        sham_T, subj_idx_T, n_seg, norm_seed = summary_spec
    if mesh is not None and T % mesh.shape["data"] != 0:
        raise ValueError(f"fleet size {T} not divisible by the mesh's "
                         f"data axis ({mesh.shape['data']})")
    program, module, n_batches = _fleet_program(
        n_pad, seq_len, micro_ch, lesion_ch, latent_dim, epochs, batch_size,
        lr, weight_decay, grad_clip, compute_dtype, int(n_seg),
        int(norm_seed), bool(normalize_on_device), store_dtype,
        bool(quantize_upload), bool(flat_opt), mesh=mesh)

    if upload_chunks == "auto":
        upload_chunks = 1 if mesh is not None else max(
            k for k in range(1, 9) if T % k == 0)
    if not isinstance(upload_chunks, int) or upload_chunks < 1:
        raise ValueError("upload_chunks must be >= 1 or 'auto'")
    if upload_chunks > 1:
        if mesh is not None:
            raise ValueError(
                "upload_chunks is a single-chip link-pipelining knob; a "
                "mesh fleet already splits the member axis across devices")
        if T % upload_chunks != 0:
            raise ValueError(f"fleet size {T} not divisible by "
                             f"upload_chunks ({upload_chunks})")

    if member_keys is not None:
        keys = np.asarray(member_keys)
        if keys.shape[0] != T:
            raise ValueError(f"member_keys has {keys.shape[0]} rows for a "
                             f"{T}-member fleet")
    else:
        keys = jax.random.split(jax.random.PRNGKey(seed), T)
    member_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PSpec
        member_sh = NamedSharding(mesh, PSpec("data"))

    def _put(x):
        return x if member_sh is None else jax.device_put(x, member_sh)

    _q_log = [0.0, 0.0, 0.0]  # MB quantized, seconds, MB on the wire

    def _launch_chunk(sl):
        """Stage one member-axis slice and enqueue its program (async: the
        jit call returns device futures, so with upload_chunks > 1 chunk
        N+1's host quantize + H2D streams while chunk N executes — the
        attachment overlaps transfers with execution, measured in
        benchmarks/h2d_exec_overlap_probe.py)."""
        qargs = ()
        if warm_compile:
            # same avals as the real upload, ~KB on the wire: one
            # batch_size-row host pattern, tiled on device across the row
            # and member axes.  Rows vary (normalization std > 0) so the
            # program executes on sane values; codes decode into [-1, 1].
            Tc_ = len(n_real[sl])
            reps = n_pad // batch_size
            rng_ = np.random.default_rng(0)
            if quantize_upload:
                pm = rng_.integers(0, 65536, (batch_size, seq_len, micro_ch)
                                   ).astype(np.uint16)
                pl = rng_.integers(0, 65536, (batch_size, seq_len, lesion_ch)
                                   ).astype(np.uint16)
                qargs = (jnp.full((Tc_, 1, 1, micro_ch), -1.0, jnp.float32),
                         jnp.full((Tc_, 1, 1, micro_ch), 2.0 / 65535.0,
                                  jnp.float32),
                         jnp.full((Tc_, 1, 1, lesion_ch), -1.0, jnp.float32),
                         jnp.full((Tc_, 1, 1, lesion_ch), 2.0 / 65535.0,
                                  jnp.float32))
                qargs = tuple(_put(q) for q in qargs)
            else:
                pm = rng_.standard_normal((batch_size, seq_len, micro_ch)
                                          ).astype(np.float32)
                pl = rng_.standard_normal((batch_size, seq_len, lesion_ch)
                                          ).astype(np.float32)
            Xm_j = _put(jnp.tile(jnp.asarray(pm)[None], (Tc_, reps, 1, 1)))
            Xl_j = _put(jnp.tile(jnp.asarray(pl)[None], (Tc_, reps, 1, 1)))
        elif quantize_upload:
            # uint16 fixed-point codes: HALF the f32 bytes on the H2D link
            # (the bench bottleneck, 7-40 MB/s measured); decoded on device
            # with per-(member, feature) affine params (train.quantize —
            # ranges are per-member, so per-chunk encoding is bit-identical
            # to whole-fleet encoding)
            import time as _time
            from .quantize import quantize_u16
            _t0 = _time.perf_counter()
            cm, lo_m, sc_m = quantize_u16(Xm[sl])
            cl, lo_l, sc_l = quantize_u16(Xl[sl])
            _q_log[1] += _time.perf_counter() - _t0
            _q_log[0] += (Xm[sl].nbytes + Xl[sl].nbytes) / 1e6
            _q_log[2] += (cm.nbytes + cl.nbytes) / 1e6
            Xm_j = _put(jnp.asarray(cm))
            Xl_j = _put(jnp.asarray(cl))
            qargs = tuple(_put(jnp.asarray(q))
                          for q in (lo_m, sc_m, lo_l, sc_l))
        elif normalize_on_device:
            # keep non-finite values: the in-program normalization must see
            # them to median-impute exactly like the reference
            # (normalization.py:54) (dataset stays f32: bf16 row-gathers
            # lower very poorly on TPU, measured 2x slower; the model casts
            # after the batch gather)
            Xm_j = _put(jnp.asarray(Xm[sl], jnp.float32))
            Xl_j = _put(jnp.asarray(Xl[sl], jnp.float32))
        else:
            Xm_j = _put(jnp.nan_to_num(jnp.asarray(Xm[sl], jnp.float32),
                                       nan=0.0))
            Xl_j = _put(jnp.nan_to_num(jnp.asarray(Xl[sl], jnp.float32),
                                       nan=0.0))
        n_j = _put(jnp.asarray(n_real[sl], jnp.int32))
        k_j = _put(keys[sl])
        if summary_spec is not None:
            sham_j = _put(jnp.asarray(sham_T[sl], jnp.float32))
            subj_j = _put(jnp.asarray(subj_idx_T[sl], jnp.int32))
            args = (Xm_j, Xl_j, n_j, k_j, sham_j, subj_j) + qargs
        else:
            args = (Xm_j, Xl_j, n_j, k_j) + qargs
        FLEET_LAUNCH_LEDGER.append((program, tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)))
        return program(*args), (Xm_j, Xl_j)

    if upload_chunks == 1:
        out, (Xm_j, Xl_j) = _launch_chunk(slice(None))
    else:
        Tc = T // upload_chunks
        pairs = [_launch_chunk(slice(j * Tc, (j + 1) * Tc))
                 for j in range(upload_chunks)]
        # every output leaf is member-leading; one device-side concat
        # re-stacks the fleet (HBM copy, ~ms — the chunks' programs have
        # already been enqueued by the loop above)
        out = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                           *[p[0] for p in pairs])
        # normalize_on_device replaces these with the programs' normalized
        # outputs below; otherwise re-stack the uploaded blocks so
        # handle.Xm_j/Xl_j keep their device-resident-dataset contract
        if normalize_on_device:
            Xm_j = Xl_j = None
        else:
            Xm_j, Xl_j = (jnp.concatenate([p[1][i] for p in pairs], axis=0)
                          for i in range(2))
    if quantize_upload and not warm_compile:
        log.info("u16 upload: quantized %.0f MB in %.2fs (-> %.0f MB on "
                 "the wire%s)", _q_log[0], _q_log[1], _q_log[2],
                 ", %d chunks" % upload_chunks if upload_chunks > 1 else "")
    params_T, stats_T, hist_T = out[:3]
    summ = out[3] if summary_spec is not None else None
    norm_stats_T = None
    if normalize_on_device:
        Xm_j, Xl_j, norm_stats_T = out[-3:]
    handle = FleetHandle(module, params_T, stats_T, hist_T, epochs,
                         n_batches, Xm_j=Xm_j, Xl_j=Xl_j, summary_T=summ)
    handle.norm_stats_T = norm_stats_T
    return handle


def train_many_vaes(Xm, Xl, n_real, **kwargs):
    """Synchronous wrapper over launch_many_vaes."""
    return launch_many_vaes(Xm, Xl, n_real, **kwargs)()


def pad_datasets(tensors, batch_size: int = 64, min_rows: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stack a list of (Xm_i, Xl_i) pairs into common-shape padded blocks.

    ``min_rows``: pad the row axis to at least this many rows — callers
    splitting one logical fleet into several launches (bench.py streaming
    pipeline) pass the first block's row count so every block shares the
    one compiled program shape."""
    n_max = max(max(x.shape[0] for x, _ in tensors), min_rows)
    n_pad = -(-n_max // batch_size) * batch_size
    L, Cm = tensors[0][0].shape[1:]
    Cl = tensors[0][1].shape[2]
    T = len(tensors)
    Xm = np.zeros((T, n_pad, L, Cm), np.float32)
    Xl = np.zeros((T, n_pad, L, Cl), np.float32)
    n_real = np.zeros(T, np.int32)
    for i, (xm, xl) in enumerate(tensors):
        n = xm.shape[0]
        Xm[i, :n] = xm
        Xl[i, :n] = xl
        n_real[i] = n
    return Xm, Xl, n_real
