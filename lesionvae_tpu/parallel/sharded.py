"""Multi-chip sharded execution paths.

Strategy (TPU-first, SURVEY.md §5.7-5.8):
- geometry / SH: embarrassingly data-parallel — shard the streamline/lesion
  axis with NamedSharding and let jit compile one SPMD program; no manual
  collectives needed.
- VAE training: data-parallel batches (grad psums inserted by XLA) with
  optional tensor-parallel sharding of the three large Dense kernels over the
  ``model`` axis (fc_mu/fc_logv: combined_dim x latent; fc_dec:
  (latent+lesion_out) x micro_out — the only >1 MFLOP matmuls in the model).

The driver's ``dryrun_multichip`` entry exercises the FULL training step over
a fake CPU mesh (SURVEY.md §4: xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.elbo import elbo
from ..models.lesion_vae import LesionConditionedVAE
from ..ops.geometry import streamline_metrics
from ..train.trainer import make_optimizer


def sharded_streamline_metrics(points: np.ndarray, lengths: np.ndarray,
                               mesh: Mesh):
    """Geometry metrics with the streamline axis sharded over ``data``."""
    sh = NamedSharding(mesh, P("data"))
    pts = jax.device_put(jnp.asarray(points), sh)
    lens = jax.device_put(jnp.asarray(lengths), sh)
    return streamline_metrics(pts, lens)


def param_shardings(params, mesh: Mesh):
    """NamedShardings for the VAE param tree: big Dense kernels sharded over
    ``model`` (column-parallel), everything else replicated."""
    tp_kernels = {"fc_mu", "fc_logv", "fc_dec"}

    def spec_for(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if any(n in tp_kernels for n in names):
            if names[-1] == "kernel":
                return P(None, "model")      # shard output features
            if names[-1] == "bias":
                return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def build_sharded_train_step(module: LesionConditionedVAE, tx,
                             mesh: Mesh, batch_size: int):
    """One full DP(+TP) training step jitted over the mesh.

    Inputs: params/opt_state sharded per ``param_shardings`` (TP) or
    replicated; the batch sharded over ``data``.  XLA inserts the gradient
    all-reduce and the TP collectives.
    """
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch_stats, xm, xl, mask, rng, beta):
        (xh, mu, logv), new_vars = module.apply(
            {"params": params, "batch_stats": batch_stats}, xm, xl, rng,
            mask, True, mutable=["batch_stats"])
        xh = jnp.nan_to_num(xh, nan=0.0)
        mu = jnp.nan_to_num(mu, nan=0.0)
        logv = jnp.nan_to_num(logv, nan=0.0)
        loss, recon, kld = elbo(xh, xm, mu, logv, beta=beta, mask=mask)
        return loss, (recon, kld, new_vars["batch_stats"])

    def step(params, batch_stats, opt_state, xm, xl, mask, rng, beta):
        (loss, (recon, kld, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, xm, xl, mask, rng,
                                   beta)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss, recon, kld

    return jax.jit(
        step,
        in_shardings=(None, None, None, data_sh, data_sh, data_sh, repl, repl),
    )


def build_shardmap_train_step(module_kwargs: dict, tx, mesh: Mesh):
    """Explicit shard_map data-parallel training step with manual collectives.

    Unlike build_sharded_train_step (GSPMD: XLA infers the collectives), this
    spells them out: BatchNorm statistics are psum-synced inside the model
    (MaskedBatchNorm.axis_name), the masked ELBO is computed from psum-ed
    sums so every shard sees the global loss, and gradients are psum-reduced
    before the optimizer.  Bit-comparable to the single-device step (same
    reductions, same eps) — verified in tests/test_parallel.py.
    """
    import functools as _ft
    try:
        from jax import shard_map
        shard_map = _ft.partial(shard_map, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        shard_map = _ft.partial(shard_map, check_rep=False)

    module = LesionConditionedVAE(axis_name="data", **module_kwargs)

    def loss_fn(params, batch_stats, xm, xl, mask, eps, beta):
        (xh, mu, logv), new_vars = module.apply(
            {"params": params, "batch_stats": batch_stats}, xm, xl, None,
            mask, True, eps=eps, mutable=["batch_stats"])
        xh = jnp.nan_to_num(xh.astype(jnp.float32), nan=0.0)
        mu = jnp.nan_to_num(mu.astype(jnp.float32), nan=0.0)
        logv = jnp.nan_to_num(logv.astype(jnp.float32), nan=0.0)
        m = mask.astype(jnp.float32)
        # global masked means via explicit psums
        per_elem = xm[0].size
        sse = jax.lax.psum(jnp.sum(((xh - xm) ** 2) * m[:, None, None]),
                           "data")
        n_x = jax.lax.psum(jnp.sum(m) * per_elem, "data")
        recon = sse / jnp.maximum(n_x, 1.0)
        kl_sum = jax.lax.psum(
            jnp.sum((1 + logv - mu ** 2 - jnp.exp(logv)) * m[:, None]), "data")
        n_z = jax.lax.psum(jnp.sum(m) * mu.shape[1], "data")
        kld = -0.5 * kl_sum / jnp.maximum(n_z, 1.0)
        return recon + beta * kld, (recon, kld, new_vars["batch_stats"])

    def step(params, batch_stats, opt_state, xm, xl, mask, eps, beta):
        (loss, (recon, kld, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, xm, xl, mask, eps,
                                   beta)
        grads = jax.lax.psum(grads, "data")
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss, recon, kld

    P_ = P  # alias for readability
    sharded_step = shard_map(
        step, mesh=mesh,
        in_specs=(P_(), P_(), P_(), P_("data"), P_("data"), P_("data"),
                  P_("data"), P_()),
        out_specs=(P_(), P_(), P_(), P_(), P_(), P_()))
    return jax.jit(sharded_step), module


def dryrun_shardmap_step(n_devices: int, seq_len: int = 16, micro_ch: int = 4,
                         lesion_ch: int = 2, latent: int = 4,
                         batch: int = 32) -> Tuple[float, float]:
    """One explicit shard_map DP step on an ``n_devices`` mesh with manual
    collectives, plus the identical single-device step for comparison.

    Returns (sharded_loss, single_device_loss) — they must agree (same
    reductions, same pre-drawn eps; tests/test_shardmap.py proves parity on
    params and BN stats too).  Driver-facing: __graft_entry__.dryrun_multichip
    runs this alongside the GSPMD path.
    """
    from .mesh import make_mesh

    kw = dict(seq_len=seq_len, micro_ch=micro_ch, lesion_ch=lesion_ch,
              latent=latent)
    module = LesionConditionedVAE(**kw)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xm = jax.random.normal(k1, (batch, seq_len, micro_ch), jnp.float32)
    xl = jax.random.normal(k2, (batch, seq_len, lesion_ch), jnp.float32)
    eps = jax.random.normal(k4, (batch, latent), jnp.float32)
    mask = jnp.ones(batch, jnp.float32).at[-3:].set(0.0)  # padded tail rows
    variables = module.init({"params": k3}, xm[:2], xl[:2], k3,
                            jnp.ones(2, jnp.float32), True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = make_optimizer(2e-4, 1e-3, 2.0)
    opt_state = tx.init(params)
    beta = jnp.asarray(0.7, jnp.float32)

    mesh = make_mesh(n_devices)  # pure DP over the data axis
    step, _ = build_shardmap_train_step(kw, tx, mesh)
    new_p, _, _, loss_sm, _, _ = step(params, batch_stats, opt_state,
                                      xm, xl, mask, eps, beta)
    delta = float(jnp.linalg.norm(
        new_p["fc_dec"]["dense"]["kernel"]
        - params["fc_dec"]["dense"]["kernel"]))
    assert delta > 0, "shard_map step did not update parameters"

    def loss_fn(p, stats):
        (xh, mu, logv), _ = module.apply(
            {"params": p, "batch_stats": stats}, xm, xl, None, mask, True,
            eps=eps, mutable=["batch_stats"])
        loss, _, _ = elbo(jnp.nan_to_num(xh, nan=0.0), xm,
                          jnp.nan_to_num(mu, nan=0.0),
                          jnp.nan_to_num(logv, nan=0.0), beta=beta, mask=mask)
        return loss

    loss_single = jax.jit(loss_fn)(params, batch_stats)
    return float(loss_sm), float(loss_single)


def dryrun_flagship(n_devices: int, steps: int = 10, epochs: int = 2,
                    seed: int = 0, batch_per_device: int = 4,
                    fleet_rows: int = 40,
                    fleet_members: int | None = None,
                    verbose: bool = False) -> dict:
    """Flagship-shape, multi-step multi-chip validation (VERDICT r2 #5).

    Runs the REAL model dims (seq 100 / 13 micro ch / 3 lesion ch / latent
    10 — reference vae_model.py:20) rather than the toy shapes of the fast
    dryruns:

    1. ``steps`` sequential DP training steps via GSPMD (sharded jit, XLA
       infers the gradient all-reduce) and the SAME ``steps`` via explicit
       shard_map with manual psum collectives, from identical init and
       identical pre-drawn reparameterization noise — final params must
       agree (the two formulations differ only in reduction order).
    2. A member-sharded fleet run: T = ``fleet_members`` (default
       2·n_devices) flagship members x ``epochs`` epochs through the fused
       normalize→train→summarize program (train.batched) over the mesh's
       data axis.

    Loss parity is asserted EXACTLY on the early steps (same math under both
    collective schemes) and only boundedly at the end: reduction-order FP
    noise amplifies ~2x/step through Adam's normalized updates (measured),
    which is an optimizer property, not a sharding defect.

    ``verbose``: print a timed line after each phase (GSPMD steps,
    shard_map steps, fleet) — the driver dryrun runs this under a hard
    wall-clock budget, and streamed phase lines preserve partial evidence
    when the budget SIGKILLs the run mid-compile.

    Returns a summary dict (also asserted internally)."""
    import time as _time

    from ..train.batched import launch_many_vaes, pad_datasets
    from .mesh import make_mesh

    t_start = _time.perf_counter()

    def _phase(msg):
        if verbose:
            print(f"FLAGSHIP phase: {msg} (t+{_time.perf_counter() - t_start:.0f}s)",
                  flush=True)

    kw = dict(seq_len=100, micro_ch=13, lesion_ch=3, latent=10)
    batch = batch_per_device * n_devices
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xm = jax.random.normal(k1, (batch, kw["seq_len"], kw["micro_ch"]),
                           jnp.float32)
    xl = jax.random.normal(k2, (batch, kw["seq_len"], kw["lesion_ch"]),
                           jnp.float32)
    mask = jnp.ones(batch, jnp.float32).at[-3:].set(0.0)
    eps_all = jax.random.normal(k4, (steps, batch, kw["latent"]), jnp.float32)
    betas = jnp.linspace(0.1, 2.0, steps)

    module = LesionConditionedVAE(**kw)
    variables = module.init({"params": k3}, xm[:2], xl[:2], k3,
                            jnp.ones(2, jnp.float32), True)
    tx = make_optimizer(2e-4, 1e-3, 2.0)

    mesh = make_mesh(n_devices)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    # --- path 1a: GSPMD DP, pre-drawn eps (so both paths share noise) ------
    def gspmd_loss(params, stats, xm, xl, mask, eps, beta):
        (xh, mu, logv), nv = module.apply(
            {"params": params, "batch_stats": stats}, xm, xl, None, mask,
            True, eps=eps, mutable=["batch_stats"])
        loss, recon, kld = elbo(jnp.nan_to_num(xh, nan=0.0), xm,
                                jnp.nan_to_num(mu, nan=0.0),
                                jnp.nan_to_num(logv, nan=0.0), beta=beta,
                                mask=mask)
        return loss, (recon, kld, nv["batch_stats"])

    def gspmd_step(params, stats, opt_state, xm, xl, mask, eps, beta):
        (loss, (_r, _k, new_stats)), grads = jax.value_and_grad(
            gspmd_loss, has_aux=True)(params, stats, xm, xl, mask, eps, beta)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    gspmd = jax.jit(gspmd_step, in_shardings=(
        None, None, None, data_sh, data_sh, data_sh, data_sh, repl))

    p_g, s_g = variables["params"], variables["batch_stats"]
    o_g = tx.init(p_g)
    xm_d = jax.device_put(xm, data_sh)
    xl_d = jax.device_put(xl, data_sh)
    mask_d = jax.device_put(mask, data_sh)
    losses_g = []
    for i in range(steps):
        p_g, s_g, o_g, loss_g = gspmd(
            p_g, s_g, o_g, xm_d, xl_d, mask_d,
            jax.device_put(eps_all[i], data_sh), betas[i])
        losses_g.append(float(loss_g))
    _phase(f"GSPMD dp={n_devices}: {steps} steps done, "
           f"loss={losses_g[-1]:.4f}")

    # --- path 1b: explicit shard_map with manual collectives ---------------
    sm_step, _ = build_shardmap_train_step(kw, tx, mesh)
    p_s, s_s = variables["params"], variables["batch_stats"]
    o_s = tx.init(p_s)
    losses_s = []
    for i in range(steps):
        p_s, s_s, o_s, loss_s, _, _ = sm_step(
            p_s, s_s, o_s, xm, xl, mask, eps_all[i], betas[i])
        losses_s.append(float(loss_s))
    _phase(f"shard_map dp={n_devices}: {steps} steps done, "
           f"loss={losses_s[-1]:.4f}")

    # Same math, different reduction order: the paths are bit-comparable for
    # the first several steps, then FP noise amplifies ~2x/step through
    # Adam's normalized updates (measured; inherent to the optimizer, not
    # the sharding).  Assert EXACT early parity + bounded late drift.
    early = [abs(a - b) / max(abs(b), 1e-12)
             for a, b in zip(losses_g[:4], losses_s[:4])]
    assert max(early) < 1e-5, (
        f"flagship GSPMD vs shard_map diverge at early steps: {early} "
        f"(same-math violation, not FP drift)")
    rel = abs(losses_g[-1] - losses_s[-1]) / max(abs(losses_s[-1]), 1e-12)
    assert rel < 5e-2, (
        f"flagship GSPMD loss {losses_g[-1]} vs shard_map {losses_s[-1]} "
        f"after {steps} steps (rel {rel:.2e} exceeds drift bound)")
    max_dp = 0.0
    for (path_a, a), (_pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_g)[0],
            jax.tree_util.tree_flatten_with_path(p_s)[0]):
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-8
        assert np.isfinite(d) and d / scale < 0.5, (
            f"flagship param divergence {d:.3e} (scale {scale:.3e}) at "
            f"{path_a} after {steps} steps")
        max_dp = max(max_dp, d / scale)

    # --- path 2: member-sharded fleet at flagship dims ---------------------
    T = fleet_members if fleet_members is not None else 2 * n_devices
    assert T % n_devices == 0, "fleet members must tile the device mesh"
    rng = np.random.default_rng(seed)
    tensors = [(rng.normal(size=(fleet_rows, 100, 13)).astype(np.float32),
                rng.uniform(size=(fleet_rows, 100, 3)).astype(np.float32))
               for _ in range(T)]
    Xm_T, Xl_T, n_real = pad_datasets(tensors, batch_size=64)
    sham_T = np.zeros((T, Xm_T.shape[1]), np.float32)
    sham_T[:, :fleet_rows // 2] = 1.0
    subj_T = np.full((T, Xm_T.shape[1]), 5, np.int32)
    h = launch_many_vaes(Xm_T, Xl_T, n_real, latent_dim=10, epochs=epochs,
                         batch_size=64, seed=seed + 1,
                         summary_spec=(sham_T, subj_T, 6, 7),
                         normalize_on_device=True,
                         mesh=make_mesh(n_devices, model_parallel=1))
    hist = np.asarray(h.hist_T)
    assert hist.shape == (T, epochs, 4) and np.isfinite(hist).all(), (
        f"flagship fleet history bad: shape {hist.shape}")
    mag_T = np.asarray(h.summary_T[2])
    assert mag_T.shape[0] == T and np.isfinite(mag_T).all()
    _phase(f"fleet x{T}: {epochs} epochs done, "
           f"mean_loss={float(hist[:, -1, 0].mean()):.4f}")

    return {"dims": kw, "steps": steps, "batch": batch,
            "gspmd_loss": losses_g[-1], "shardmap_loss": losses_s[-1],
            "early_step_rel": max(early),
            "max_param_rel_div": max_dp, "fleet_members": T,
            "fleet_epochs": epochs,
            "fleet_mean_loss": float(hist[:, -1, 0].mean())}


def dryrun_train_step(n_devices: int, model_parallel: int = 2,
                      seq_len: int = 16, micro_ch: int = 4, lesion_ch: int = 2,
                      latent: int = 4, batch: int = 16) -> Tuple[float, float]:
    """Build an ``n_devices`` mesh, jit the full DP+TP training step on tiny
    shapes, run one step, and return (loss, grad-updated param delta norm).

    This is the driver-facing multi-chip validation (__graft_entry__.py)."""
    from .mesh import make_mesh

    mp = model_parallel if n_devices % model_parallel == 0 else 1
    mesh = make_mesh(n_devices, model_parallel=mp)

    module = LesionConditionedVAE(seq_len=seq_len, micro_ch=micro_ch,
                                  lesion_ch=lesion_ch, latent=latent)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    xm = jax.random.normal(k1, (batch, seq_len, micro_ch), jnp.float32)
    xl = jax.random.normal(k2, (batch, seq_len, lesion_ch), jnp.float32)
    mask = jnp.ones(batch, jnp.float32)

    variables = module.init({"params": k3}, xm[:2], xl[:2], k3,
                            jnp.ones(2, jnp.float32), True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = make_optimizer(2e-4, 1e-3, 2.0)
    opt_state = tx.init(params)

    p_sh = param_shardings(params, mesh)
    params = jax.device_put(params, p_sh)
    data_sh = NamedSharding(mesh, P("data"))
    xm = jax.device_put(xm, data_sh)
    xl = jax.device_put(xl, data_sh)
    mask = jax.device_put(mask, data_sh)

    step = build_sharded_train_step(module, tx, mesh, batch)
    old_fc = params["fc_dec"]["dense"]["kernel"]
    new_params, new_stats, new_opt, loss, recon, kld = step(
        params, batch_stats, opt_state, xm, xl, mask, k3,
        jnp.asarray(0.1, jnp.float32))
    delta = float(jnp.linalg.norm(
        new_params["fc_dec"]["dense"]["kernel"] - old_fc))
    loss = float(loss)
    assert np.isfinite(loss), "sharded step produced non-finite loss"
    assert delta > 0, "sharded step did not update parameters"
    return loss, delta
