#!/usr/bin/env python
"""Honest decomposition of the fleet step + candidate-lever measurements.

The fleet trace (benchmarks/profile_fleet.py) shows the step is HBM-bound:
fc_dec holds 2.47M of each member's ~2.8M params, so fwd/bwd weight reads +
Adam p/m/v read-modify-write dominate (conv/matmul ≈ 2% of device time).
This harness measures, all inside lax.scan with CARRY-dependent params (so
XLA cannot hoist weight-dependent transforms out of the loop — the flaw in
the earlier fleet_step.py lower bounds):

  adamonly    pure fused clip→decay→Adam on the full T-member tree
              (the optimizer's HBM floor)
  fwdcarry    forward+loss with params perturbed per step
  fwdbwdcarry forward+backward with params perturbed per step
  full        the production step (gather+fwd+bwd+adam+select)
  full:N      same with scan unroll=N
  moments16   full step with Adam mu/nu stored in bf16 (halves 4 of the
              ~10 optimizer HBM streams; candidate opt-in lever)

usage: python benchmarks/fleet_ablate.py [mode ...]
env: FLEET_T, FLEET_NPAD, FLEET_L, FLEET_DTYPE as fleet_step.py.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lesionvae_tpu.utils.cache import configure_cache
configure_cache("tpu")  # shared repo-local cache (advisor r4: /tmp dir drifted)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from benchmarks.fleet_step import (BATCH, N_PAD, T, make_loss, setup)
from lesionvae_tpu.train.trainer import make_optimizer


def log(msg):
    print(msg, file=sys.stderr, flush=True)


N_STEPS = int(os.environ.get("FLEET_STEPS", "30"))


def _time_scan(run, args, n_rep=3):
    out = run(*args)
    np.asarray(out)  # compile + the only reliable completion barrier
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = run(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n_rep / N_STEPS


def bench_adamonly(module, tx, params, opt_state):
    def one(p, o, g0):
        def body(carry, _):
            p, o, g = carry
            updates, o2 = tx.update(g, o, p)
            p2 = jax.tree.map(lambda a, u: a + u, p, updates)
            g2 = jax.tree.map(lambda a: a * 0.999, g)  # keep g live
            return (p2, o2, g2), 0.0
        (p, o, g), _ = jax.lax.scan(body, (p, o, g0), None, length=N_STEPS)
        return jax.tree.reduce(lambda a, x: a + jnp.sum(x), p, 0.0)

    g0 = jax.tree.map(lambda a: a * 1e-3, params)
    run = jax.jit(jax.vmap(one))
    dt = _time_scan(run, (params, opt_state, g0))
    log(f"[adamonly] {dt * 1e3:.2f} ms/fleet-step (optimizer HBM floor)")


def bench_carry(module, tx, Xm, Xl, params, stats, opt_state, what):
    loss_fn = make_loss(module)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one(Xm_i, Xl_i, p, s, key):
        def body(carry, rng):
            p, s = carry
            perm = jax.random.permutation(rng, N_PAD)
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, BATCH)
            xb_m = jnp.take(Xm_i, idx, axis=0)
            xb_l = jnp.take(Xl_i, idx, axis=0)
            mask = jnp.ones(BATCH, jnp.float32)
            if what == "fwdcarry":
                loss, (_r, _k, new_s) = loss_fn(p, s, xb_m, xb_l, mask, rng,
                                                1.0)
            else:
                (loss, (_r, _k, new_s)), grads = grad_fn(
                    p, s, xb_m, xb_l, mask, rng, 1.0)
                loss = loss + jax.tree.reduce(
                    lambda a, g: a + jnp.sum(g) * 1e-20, grads, 0.0)
            # tiny loss-dependent perturbation: params change every step, so
            # nothing weight-dependent can hoist out of the scan
            p2 = jax.tree.map(lambda a: a * (1.0 + 1e-12 * loss), p)
            return (p2, new_s), loss

        rngs = jax.random.split(key, N_STEPS)
        (p, s), losses = jax.lax.scan(body, (p, s), rngs)
        return jnp.sum(losses)

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(3), T)
    dt = _time_scan(run, (Xm, Xl, params, stats, keys))
    log(f"[{what}] {dt * 1e3:.2f} ms/fleet-step")


def bench_full(module, tx, Xm, Xl, params, stats, opt_state, unroll=1,
               tx_override=None, tag="full", remat=None):
    tx = tx_override or tx
    loss_fn = make_loss(module)
    # remat lever: the traffic model (utils/cost_model.py) attributes
    # 1.59 GB/fleet-step to fwd->bwd activation residuals; at MFU 9.5% the
    # recompute FLOPs are free, so checkpointing the loss trades saved
    # residual HBM streams for MXU/VPU work.  Exact math — the same ops are
    # re-executed with the same rng, no new approximation knob.
    if remat == "full":
        loss_fn = jax.checkpoint(loss_fn)
    elif remat == "dots":
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.dots_saveable)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    opt_state = jax.jit(jax.vmap(tx.init))(params)

    def one(Xm_i, Xl_i, p, s, o, key):
        def body(carry, rng):
            p, s, o = carry
            perm = jax.random.permutation(rng, N_PAD)
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, BATCH)
            xb_m = jnp.take(Xm_i, idx, axis=0)
            xb_l = jnp.take(Xl_i, idx, axis=0)
            mask = jnp.ones(BATCH, jnp.float32)
            (loss, (_r, _k, new_s)), grads = grad_fn(
                p, s, xb_m, xb_l, mask, rng, 1.0)
            updates, new_o = tx.update(grads, o, p)
            cand = jax.tree.map(lambda a, u: a + u, p, updates)
            finite = jnp.isfinite(loss)
            new_p = jax.tree.map(lambda a, c: jnp.where(finite, c, a), p,
                                 cand)
            new_o2 = jax.tree.map(lambda a, c: jnp.where(finite, c, a), o,
                                  new_o)
            return (new_p, new_s, new_o2), loss

        rngs = jax.random.split(key, N_STEPS)
        (p, s, o), losses = jax.lax.scan(body, (p, s, o), rngs,
                                         unroll=unroll)
        return jnp.sum(losses)

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(5), T)
    dt = _time_scan(run, (Xm, Xl, params, stats, opt_state, keys))
    log(f"[{tag} u{unroll}] {dt * 1e3:.2f} ms/fleet-step "
        f"({T * N_STEPS / (dt * N_STEPS):.0f} member-steps/s)")


def make_optimizer_m16(lr, weight_decay, grad_clip):
    """Fused optimizer with bf16 moment storage (mu/nu) — candidate lever:
    halves 4 of the ~10 per-param HBM streams.  Math still in f32."""
    import optax
    b1, b2, eps = 0.9, 0.999, 1e-8

    def init(params):
        return {"count": jnp.zeros([], jnp.int32),
                "mu": jax.tree.map(
                    lambda p: jnp.zeros_like(p, jnp.bfloat16), params),
                "nu": jax.tree.map(
                    lambda p: jnp.zeros_like(p, jnp.bfloat16), params)}

    def update(grads, state, params):
        g_norm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
        trigger = g_norm < grad_clip
        count_inc = optax.safe_increment(state["count"])
        bc1 = 1 - b1 ** count_inc
        bc2 = 1 - b2 ** count_inc

        def leaf(g, p, m, v):
            g = jax.lax.select(trigger, g,
                               (g / g_norm.astype(g.dtype)) * grad_clip)
            g = g + weight_decay * p
            m2 = (1 - b1) * g + b1 * m.astype(jnp.float32)
            v2 = (1 - b2) * jnp.square(g) + b2 * v.astype(jnp.float32)
            upd = -lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            return upd, m2.astype(jnp.bfloat16), v2.astype(jnp.bfloat16)

        out = jax.tree.map(leaf, grads, params, state["mu"], state["nu"])
        updates = jax.tree.map(lambda o: o[0], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"count": count_inc, "mu": mu, "nu": nu}

    import types
    return types.SimpleNamespace(init=init, update=update)


def bench_train_program(store: bool, epochs: int = 2, flat: bool = False):
    """Time the PRODUCTION fleet program (train.batched._fleet_program) with
    and without the bf16-storage fast path (and its flat-buffer variant)."""
    from benchmarks.fleet_step import CL, CM, DTYPE, L, LATENT
    from lesionvae_tpu.train.batched import _fleet_program

    program, _, n_batches = _fleet_program(
        N_PAD, L, CM, CL, LATENT, epochs, BATCH, 2e-4, 1e-3, 2.0, DTYPE,
        0, 0, False, jnp.bfloat16 if store else None, False, flat)
    rng = np.random.default_rng(0)
    Xm = jnp.asarray(rng.normal(size=(T, N_PAD, L, CM)), jnp.float32)
    Xl = jnp.asarray(rng.uniform(size=(T, N_PAD, L, CL)), jnp.float32)
    n_j = jnp.full(T, N_PAD - 10, jnp.int32)
    out = program(Xm, Xl, n_j, jax.random.split(jax.random.PRNGKey(2), T))
    np.asarray(out[2])
    t0 = time.perf_counter()
    for r in range(1, 3):
        out = program(Xm, Xl, n_j, jax.random.split(jax.random.PRNGKey(r), T))
    hist = np.asarray(out[2])
    dt = (time.perf_counter() - t0) / 2
    steps = epochs * n_batches
    tag = ("train-bf16flat" if flat
           else "train-bf16store" if store else "train-f32store")
    log(f"[{tag}] {dt / steps * 1e3:.2f} ms/fleet-step "
        f"({T * steps / dt:.0f} member-steps/s; "
        f"final loss {hist[:, -1, 0].mean():.4f} finite={np.isfinite(hist).all()})")


def main():
    modes = sys.argv[1:] or ["adamonly", "fwdcarry", "fwdbwdcarry", "full"]
    log(f"devices: {jax.devices()}  T={T} n_pad={N_PAD} steps={N_STEPS} "
        f"dtype={os.environ.get('FLEET_DTYPE', 'f32')}")
    module, tx, Xm, Xl, params, stats, opt_state = setup()
    for m in modes:
        if m == "adamonly":
            bench_adamonly(module, tx, params, opt_state)
        elif m in ("fwdcarry", "fwdbwdcarry"):
            bench_carry(module, tx, Xm, Xl, params, stats, opt_state, m)
        elif m.startswith("full"):
            unroll = int(m.split(":")[1]) if ":" in m else 1
            bench_full(module, tx, Xm, Xl, params, stats, opt_state, unroll)
        elif m == "trainstore":
            bench_train_program(store=True)
        elif m == "trainflat":
            bench_train_program(store=True, flat=True)
        elif m == "trainf32":
            bench_train_program(store=False)
        elif m.startswith("remat"):
            # remat (save nothing) | remat:dots (save matmul outputs)
            kind = m.split(":")[1] if ":" in m else "full"
            bench_full(module, tx, Xm, Xl, params, stats, opt_state,
                       remat=kind, tag=f"remat:{kind}")
        elif m == "moments16":
            bench_full(module, tx, Xm, Xl, params, stats, opt_state,
                       tx_override=make_optimizer_m16(2e-4, 1e-3, 2.0),
                       tag="moments16")
        else:
            log(f"unknown mode {m}")


if __name__ == "__main__":
    main()
