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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lesionvae")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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
