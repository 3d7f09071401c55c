#!/usr/bin/env python
"""Per-op device-time breakdown of the fleet training program.

Runs a short fleet train program under ``jax.profiler.trace`` and parses the
xplane proto with ``jax.profiler.ProfileData`` (no TensorBoard needed),
aggregating device-stream op durations by fusion/op name.  This replaces
guesswork about where the 16 ms/fleet-step goes (MXU-underutilized convs vs
HBM-bound elementwise vs gathers vs BN reductions).

  python benchmarks/profile_fleet.py [steps]

env: FLEET_T (64), FLEET_NPAD (960), FLEET_DTYPE (f32|bf16), FLEET_L (100)
"""

import os
import re
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lesionvae_tpu.utils.cache import configure_cache
configure_cache("tpu")  # shared repo-local cache (advisor r4: /tmp dir drifted)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_traced_prod(n_epochs: int, trace_dir: str):
    """Trace the PRODUCTION fleet program (train.batched._fleet_program with
    the bench defaults: bf16 compute + bf16-SR storage) for ``n_epochs``
    epochs — the f32 make_optimizer path below predates the lowmem default
    and no longer matches what the bench ships.  PROFILE_MODE=prod."""
    from lesionvae_tpu.train.batched import _fleet_program

    T = int(os.environ.get("FLEET_T", "64"))
    N_PAD = int(os.environ.get("FLEET_NPAD", "960"))
    L = int(os.environ.get("FLEET_L", "100"))
    CM, CL, LATENT, BATCH = 13, 3, 10, 64
    store = {"f32": None, "bf16": jnp.bfloat16}[
        os.environ.get("FLEET_STORE", "bf16")]
    comp = {"f32": None, "bf16": jnp.bfloat16}[
        os.environ.get("FLEET_DTYPE", "bf16")]
    program, _m, n_batches = _fleet_program(
        N_PAD, L, CM, CL, LATENT, n_epochs, BATCH, 2e-4, 1e-3, 2.0,
        compute_dtype=comp, store_dtype=store)
    rng = np.random.default_rng(0)
    Xm = jnp.asarray(rng.normal(size=(T, N_PAD, L, CM)), jnp.float32)
    Xl = jnp.asarray(rng.uniform(size=(T, N_PAD, L, CL)), jnp.float32)
    n_real = jnp.full((T,), N_PAD, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), T)
    jax.block_until_ready(program(Xm, Xl, n_real, keys))  # compile+load
    n_steps = n_epochs * n_batches
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        out = program(Xm, Xl, n_real,
                      jax.random.split(jax.random.PRNGKey(1), T))
        jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    log(f"traced {n_steps} prod fleet-steps ({n_epochs} epochs x "
        f"{n_batches} batches) in {wall:.2f}s "
        f"({wall / n_steps * 1e3:.2f} ms/fleet-step wall)")
    return n_steps


def run_traced(n_steps: int, trace_dir: str):
    from benchmarks.fleet_step import (BATCH, CL, CM, DTYPE, L, LATENT, N_PAD,
                                       T, make_loss, setup)

    module, tx, Xm, Xl, params, stats, opt_state = setup()
    loss_fn = make_loss(module)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_one(Xm_i, Xl_i, p, s, o, key):
        def body(carry, inputs):
            p, s, o = carry
            _b, rng = inputs
            perm = jax.random.permutation(rng, N_PAD)
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, BATCH)
            xb_m = jnp.take(Xm_i, idx, axis=0)
            xb_l = jnp.take(Xl_i, idx, axis=0)
            mask = jnp.ones(BATCH, jnp.float32)
            (loss, (_r, _k, new_s)), grads = grad_fn(
                p, s, xb_m, xb_l, mask, rng, 1.0)
            updates, new_o = tx.update(grads, o, p)
            new_p = jax.tree.map(lambda a, u: a + u, p, updates)
            finite = jnp.isfinite(loss)
            new_p = jax.tree.map(lambda a, c: jnp.where(finite, c, a), p,
                                 new_p)
            new_o = jax.tree.map(lambda a, c: jnp.where(finite, c, a), o,
                                 new_o)
            return (new_p, new_s, new_o), loss

        rngs = jax.random.split(key, n_steps)
        (p, s, o), losses = jax.lax.scan(body, (p, s, o),
                                         (jnp.arange(n_steps), rngs))
        return jnp.sum(losses)

    run = jax.jit(jax.vmap(train_one))
    keys = jax.random.split(jax.random.PRNGKey(0), T)
    np.asarray(run(Xm, Xl, params, stats, opt_state, keys))  # compile+load

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        out = run(Xm, Xl, params, stats, opt_state,
                  jax.random.split(jax.random.PRNGKey(1), T))
        np.asarray(out)
    wall = time.perf_counter() - t0
    log(f"traced {n_steps} fleet-steps in {wall:.2f}s "
        f"({wall / n_steps * 1e3:.2f} ms/fleet-step wall)")
    return wall


_CLASS_PATTERNS = [
    ("conv/matmul", re.compile(r"convolution|dot|conv", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-slice|"
                                  r"dynamic.update", re.I)),
    ("sort/rng", re.compile(r"sort|rng|bit", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("elementwise/fusion", re.compile(r"fusion|add|multiply|select", re.I)),
]


def classify(name: str) -> str:
    for label, pat in _CLASS_PATTERNS:
        if pat.search(name):
            return label
    return "other"


def summarize(trace_dir: str, top: int = 40):
    files = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not files:
        log(f"no xplane.pb under {trace_dir}")
        return
    pd = jax.profiler.ProfileData.from_file(str(files[-1]))
    per_op = defaultdict(float)
    per_line = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                per_op[ev.name] += dur
                per_line[line.name] += dur
    log("\n== device lines (ms) ==")
    for name, ms in sorted(per_line.items(), key=lambda kv: -kv[1])[:8]:
        log(f"  {ms:10.2f}  {name}")
    total = sum(per_op.values())
    by_class = defaultdict(float)
    for name, ms in per_op.items():
        by_class[classify(name)] += ms
    log(f"\n== op classes (total {total:.1f} ms) ==")
    for name, ms in sorted(by_class.items(), key=lambda kv: -kv[1]):
        log(f"  {ms:10.2f}  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    log(f"\n== top {top} ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        log(f"  {ms:10.2f}  {100 * ms / max(total, 1e-9):5.1f}%  {name[:110]}")


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    trace_dir = os.environ.get("TRACE_DIR") or tempfile.mkdtemp(
        prefix="fleet_trace_")
    run_traced(n_steps, trace_dir)
    summarize(trace_dir)
    log(f"trace dir: {trace_dir}")


if __name__ == "__main__":
    main()
