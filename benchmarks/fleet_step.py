#!/usr/bin/env python
"""Micro-benchmark of the VAE fleet training step on the real TPU chip.

The fleet program (train.batched) is the bench's critical path: 600
sequential vmapped steps dominate the full-cohort wall-clock (BENCH_r01).
This harness times ablations to locate the bottleneck:

  python benchmarks/fleet_step.py [mode ...]

modes (default: step):
  step        one fleet batch-step (fwd+bwd+adam) jitted alone, T x 64 x L
  fwd         forward+loss only
  fwdbwd      forward+backward, no optimizer
  nogather    step with a static batch slice instead of the row gather
  epoch       one full epoch (scan over n_batches) per timing
  train       the full training program at epochs=E (steady-state steps/s)

env: FLEET_T (64), FLEET_NPAD (960), FLEET_L (100), FLEET_EPOCHS (2),
     FLEET_DTYPE (f32|bf16)
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
    # the axon TPU plugin ignores the env var; the config API wins
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from lesionvae_tpu.models.elbo import elbo
from lesionvae_tpu.models.lesion_vae import LesionConditionedVAE
from lesionvae_tpu.train.trainer import make_optimizer

T = int(os.environ.get("FLEET_T", "64"))
N_PAD = int(os.environ.get("FLEET_NPAD", "960"))
L = int(os.environ.get("FLEET_L", "100"))
EPOCHS = int(os.environ.get("FLEET_EPOCHS", "2"))
CM, CL, LATENT, BATCH = 13, 3, 10, 64
DTYPE = {"f32": None, "bf16": jnp.bfloat16}[os.environ.get("FLEET_DTYPE",
                                                           "f32")]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def setup():
    module = LesionConditionedVAE(seq_len=L, micro_ch=CM, lesion_ch=CL,
                                  latent=LATENT, compute_dtype=DTYPE)
    tx = make_optimizer(2e-4, 1e-3, 2.0)
    rng = np.random.default_rng(0)
    Xm = jnp.asarray(rng.normal(size=(T, N_PAD, L, CM)), jnp.float32)
    Xl = jnp.asarray(rng.uniform(size=(T, N_PAD, L, CL)), jnp.float32)

    def init_one(key):
        k1, k2 = jax.random.split(key)
        v = module.init({"params": k1},
                        jnp.zeros((2, L, CM), jnp.float32),
                        jnp.zeros((2, L, CL), jnp.float32), k2,
                        jnp.ones(2, jnp.float32), True)
        return v["params"], v["batch_stats"]

    keys = jax.random.split(jax.random.PRNGKey(0), T)
    params, stats = jax.jit(jax.vmap(init_one))(keys)
    opt_state = jax.jit(jax.vmap(tx.init))(params)
    return module, tx, Xm, Xl, params, stats, opt_state


def make_loss(module):
    def loss_fn(p, stats, xb_m, xb_l, mask, rng, beta):
        (xh, mu, logv), new_vars = module.apply(
            {"params": p, "batch_stats": stats}, xb_m, xb_l, rng, mask, True,
            mutable=["batch_stats"])
        xh = jnp.nan_to_num(xh.astype(jnp.float32), nan=0.0)
        mu = jnp.nan_to_num(mu.astype(jnp.float32), nan=0.0)
        logv = jnp.nan_to_num(logv.astype(jnp.float32), nan=0.0)
        loss, recon, kld = elbo(xh, xb_m, mu, logv, beta=beta, mask=mask)
        return loss, (recon, kld, new_vars["batch_stats"])
    return loss_fn


def timeit(fn, args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_step(module, tx, Xm, Xl, params, stats, opt_state, *, gather=True,
               what="step"):
    loss_fn = make_loss(module)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one(p, s, o, Xm_i, Xl_i, key):
        if gather:
            perm = jax.random.permutation(key, N_PAD)
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, BATCH)
            xb_m = jnp.take(Xm_i, idx, axis=0)
            xb_l = jnp.take(Xl_i, idx, axis=0)
        else:
            xb_m = jax.lax.dynamic_slice_in_dim(Xm_i, 0, BATCH)
            xb_l = jax.lax.dynamic_slice_in_dim(Xl_i, 0, BATCH)
        mask = jnp.ones(BATCH, jnp.float32)
        if what == "fwd":
            loss, aux = loss_fn(p, s, xb_m, xb_l, mask, key, 1.0)
            return loss
        (loss, (recon, kld, new_stats)), grads = grad_fn(
            p, s, xb_m, xb_l, mask, key, 1.0)
        if what == "fwdbwd":
            return loss, grads
        updates, new_o = tx.update(grads, o, p)
        new_p = jax.tree.map(lambda a, u: a + u, p, updates)
        return loss, new_p, new_stats, new_o

    keys = jax.random.split(jax.random.PRNGKey(1), T)
    step = jax.jit(jax.vmap(one))
    dt = timeit(step, (params, stats, opt_state, Xm, Xl, keys))
    agg = T / dt
    log(f"[{what}{'' if gather else '-nogather'}] {dt * 1e3:.2f} ms/fleet-step"
        f"  ({agg:.0f} member-steps/s aggregate)")
    return dt


def bench_train(module, tx, Xm, Xl, params, stats, opt_state):
    from lesionvae_tpu.train.batched import _fleet_program
    program, _, n_batches = _fleet_program(
        N_PAD, L, CM, CL, LATENT, EPOCHS, BATCH, 2e-4, 1e-3, 2.0,
        None if DTYPE is None else DTYPE)
    n_j = jnp.full(T, N_PAD - 10, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(2), T)
    t0 = time.perf_counter()
    out = program(Xm, Xl, n_j, keys)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = program(Xm, Xl, n_j, keys)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    steps = EPOCHS * n_batches * T
    log(f"[train] {dt:.2f}s for {EPOCHS} epochs x {n_batches} batches x {T} "
        f"members = {steps} member-steps -> {steps / dt:.0f} steps/s "
        f"({dt / (EPOCHS * n_batches) * 1e3:.2f} ms/fleet-step; warm-incl-"
        f"compile {warm:.1f}s)")


def bench_scan(module, tx, Xm, Xl, params, stats, opt_state, *, what="full",
               n_steps=int(os.environ.get("FLEET_STEPS", "30")), unroll=1):
    """Time the step INSIDE a lax.scan (the production structure) with
    increasing amounts of the real body, to localize the scan slowdown.

    Ablation results (v5e, bf16, 600 steps): carry 0.14 | fwd 2.44 |
    fwdbwd 7.27 | noselect 16.02 | full 16.03 ms/fleet-step.  CAVEAT: the
    carry/fwd/fwdbwd modes keep params CONSTANT across scan steps, so XLA
    hoists weight-dependent transforms out of the loop — they are lower
    bounds, not honest stage costs.  What the full-vs-noselect pair does
    establish: the finite-loss select is free, and a hand-fused single-pass
    Adam (train.trainer.make_optimizer) measures identical to the optax
    chain — the real step is model-compute-bound, and the remaining lever
    is a fused Pallas fwd+bwd of the model itself."""
    loss_fn = make_loss(module)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_one(Xm_i, Xl_i, p, s, o, key):
        def body(carry, inputs):
            p, s, o = carry
            b, rng = inputs
            perm = jax.random.permutation(rng, N_PAD)
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, BATCH)
            xb_m = jnp.take(Xm_i, idx, axis=0)
            xb_l = jnp.take(Xl_i, idx, axis=0)
            mask = jnp.ones(BATCH, jnp.float32)
            if what == "carry":
                return (p, s, o), jnp.sum(xb_m)
            if what == "fwd":
                loss, (recon, kld, new_s) = loss_fn(p, s, xb_m, xb_l, mask,
                                                    rng, 1.0)
                return (p, new_s, o), loss
            (loss, (recon, kld, new_s)), grads = grad_fn(
                p, s, xb_m, xb_l, mask, rng, 1.0)
            if what == "fwdbwd":
                gsum = jax.tree.reduce(
                    lambda a, g: a + jnp.sum(g), grads, 0.0)
                return (p, new_s, o), loss + gsum
            updates, new_o = tx.update(grads, o, p)
            new_p = jax.tree.map(lambda a, u: a + u, p, updates)
            if what == "noselect":
                return (new_p, new_s, new_o), loss
            finite = jnp.isfinite(loss)
            new_p = jax.tree.map(lambda a, c: jnp.where(finite, c, a), p,
                                 new_p)
            new_o = jax.tree.map(lambda a, c: jnp.where(finite, c, a), o,
                                 new_o)
            return (new_p, new_s, new_o), loss

        rngs = jax.random.split(key, n_steps)
        (p, s, o), losses = jax.lax.scan(
            body, (p, s, o), (jnp.arange(n_steps), rngs), unroll=unroll)
        # consume every iteration's output so no iteration can be DCE'd
        return jnp.sum(losses)

    run = jax.jit(jax.vmap(train_one))
    # DIFFERENT keys per invocation: the remote service appears to memoize
    # repeated executions with identical arguments, which made best-of-N
    # with a constant key report impossible times (observed r2)
    out = run(Xm, Xl, params, stats, opt_state,
              jax.random.split(jax.random.PRNGKey(0), T))
    np.asarray(out)  # fetch = the only reliable completion barrier here
    n_rep = 3
    t0 = time.perf_counter()
    for r in range(1, n_rep + 1):
        out = run(Xm, Xl, params, stats, opt_state,
                  jax.random.split(jax.random.PRNGKey(r), T))
    # np.asarray, NOT block_until_ready: on the remote attachment
    # block_until_ready on a small output returns before the program has
    # actually executed (observed 0.00 ms "timings"); a D2H fetch is the
    # only reliable completion barrier
    vals = np.asarray(out)
    dt = (time.perf_counter() - t0) / n_rep
    log(f"[scan-{what} u{unroll}] {dt / n_steps * 1e3:.2f} ms/fleet-step "
        f"({n_steps} steps, {T * n_steps / dt:.0f} member-steps/s, "
        f"mean_out={float(vals.mean()):.4f})")


def main():
    modes = sys.argv[1:] or ["step"]
    log(f"devices: {jax.devices()}  T={T} n_pad={N_PAD} L={L} "
        f"dtype={os.environ.get('FLEET_DTYPE', 'f32')}")
    module, tx, Xm, Xl, params, stats, opt_state = setup()
    for m in modes:
        if m == "step":
            bench_step(module, tx, Xm, Xl, params, stats, opt_state)
        elif m == "fwd":
            bench_step(module, tx, Xm, Xl, params, stats, opt_state,
                       what="fwd")
        elif m == "fwdbwd":
            bench_step(module, tx, Xm, Xl, params, stats, opt_state,
                       what="fwdbwd")
        elif m == "nogather":
            bench_step(module, tx, Xm, Xl, params, stats, opt_state,
                       gather=False)
        elif m == "train":
            bench_train(module, tx, Xm, Xl, params, stats, opt_state)
        elif m.startswith("scan"):
            # scan, scan-carry, scan-fwd, scan-fwdbwd, scan-noselect,
            # optional trailing :unroll e.g. scan:4
            what = "full"
            unroll = 1
            rest = m[4:]
            if ":" in rest:
                rest, u = rest.rsplit(":", 1)
                unroll = int(u)
            if rest.startswith("-"):
                what = rest[1:]
            bench_scan(module, tx, Xm, Xl, params, stats, opt_state,
                       what=what, unroll=unroll)
        else:
            log(f"unknown mode {m}")


if __name__ == "__main__":
    main()
