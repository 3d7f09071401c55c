#!/usr/bin/env python
"""Static HBM-traffic accounting for the production fleet program.

VERDICT r4 #3: "HBM-bound" was asserted from ablations (the fused Adam pass
alone is 9.3 of 16.6 f32 ms/fleet-step; flat-opt 6x worse; unroll neutral)
but never quantified against v5e peak bandwidth.  This probe computes the
program's bytes two ways and writes ``benchmarks/fleet_traffic.json``, which
bench.py combines with the measured ``device_exec.fleet`` to report achieved
GB/s vs peak in the round JSON:

1. **XLA cost model** (authoritative): lower+compile the exact production
   fleet program (train.batched._fleet_program with the bench defaults) and
   read ``compiled.cost_analysis()`` — "bytes accessed" counts HBM operand
   traffic of the optimized, fused HLO; "flops" the arithmetic.
2. **Hand model** (cross-check, weights only): the scan body streams the
   bf16 weight leaves ~10x per step — fwd read + bwd read + grad write +
   optimizer read g/p/m/v + write p/m/v — so
   ``10 * n_weight_params * T * 2 B``; activations/gathers come on top.

Usage:  python benchmarks/fleet_traffic.py            # on the TPU chip
        JAX_PLATFORMS=cpu python benchmarks/fleet_traffic.py   # CPU HLO
                                                       # (different fusion —
                                                       # numbers not used)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from lesionvae_tpu.utils.cache import configure_cache

configure_cache("tpu")
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

OUT = Path(__file__).resolve().parent / "fleet_traffic.json"

# v5e (TPU v5 lite) headline numbers — jax-ml.github.io/scaling-book specs
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def production_config(T=2, n_pad=960, epochs=40):
    """The static config the bench's stream pipeline launches: 4 timepoint
    blocks x 16 members in 8 upload chunks = T=2 per program execution
    (matching T reuses the already-persisted executable; cost scales
    linearly in T so per-member numbers are T-independent).  n_subj+1=38
    summary segments, seed 42 (bench.py)."""
    return dict(n_pad=n_pad, seq_len=100, micro_ch=13, lesion_ch=3,
                latent_dim=10, epochs=epochs, batch_size=64, lr=2e-4,
                weight_decay=1e-3, grad_clip=2.0,
                compute_dtype=jnp.bfloat16, summary_n_seg=38,
                summary_seed=42, normalize=True,
                store_dtype=jnp.bfloat16, dequant=True), T


def weight_stream_model(T):
    """Hand model: bytes/fleet-step from the ~10 weight-leaf passes."""
    from lesionvae_tpu.models.lesion_vae import LesionConditionedVAE
    from lesionvae_tpu.train.lowmem import _is_weight_leaf
    module = LesionConditionedVAE(seq_len=100, micro_ch=13, lesion_ch=3,
                                  latent=10)
    k = jax.random.PRNGKey(0)
    v = jax.eval_shape(
        lambda: module.init({"params": k},
                            jnp.zeros((2, 100, 13), jnp.float32),
                            jnp.zeros((2, 100, 3), jnp.float32), k,
                            jnp.ones(2, jnp.float32), True))
    leaves = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    n_w = sum(x.size for p, x in leaves if _is_weight_leaf(p))
    n_o = sum(x.size for p, x in leaves if not _is_weight_leaf(p))
    # bf16 weight leaves: fwd + bwd reads, grad write, opt 4 reads 3 writes
    return 10 * n_w * T * 2, n_w, n_o


def main():
    cfg, T = production_config()
    from lesionvae_tpu.train.batched import _fleet_program
    t0 = time.perf_counter()
    program, _m, n_batches = _fleet_program(**cfg)
    sds = jax.ShapeDtypeStruct
    u16, f32, i32, u32 = jnp.uint16, jnp.float32, jnp.int32, jnp.uint32
    n_pad, L = cfg["n_pad"], cfg["seq_len"]
    cm, cl = cfg["micro_ch"], cfg["lesion_ch"]
    args = (sds((T, n_pad, L, cm), u16), sds((T, n_pad, L, cl), u16),
            sds((T,), i32), sds((T, 2), u32),
            sds((T, n_pad), f32), sds((T, n_pad), i32),
            sds((T, 1, 1, cm), f32), sds((T, 1, 1, cm), f32),
            sds((T, 1, 1, cl), f32), sds((T, 1, 1, cl), f32))
    lowered = program.lower(*args)
    log(f"lowered in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log(f"compiled in {time.perf_counter() - t0:.1f}s "
        f"(persistent cache makes this a load)")
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    steps = cfg["epochs"] * n_batches
    prog_bytes = float(ca.get("bytes accessed", 0.0))
    prog_flops = float(ca.get("flops", 0.0))
    hand_bytes, n_w, n_o = weight_stream_model(T)
    out = {
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "T": T, "n_pad": n_pad, "epochs": cfg["epochs"],
        "n_batches": n_batches, "steps_per_program": steps,
        "program_bytes_accessed": prog_bytes,
        "program_flops": prog_flops,
        "bytes_per_fleet_step_per_member": prog_bytes / steps / T,
        "flops_per_fleet_step_per_member": prog_flops / steps / T,
        "hand_model_weight_bytes_per_step_per_member": hand_bytes / T,
        "n_weight_params": n_w, "n_other_params": n_o,
        "v5e_hbm_gbps": V5E_HBM_GBPS, "v5e_bf16_tflops": V5E_BF16_TFLOPS,
    }
    log(json.dumps(out, indent=2))
    if jax.devices()[0].platform == "tpu":
        OUT.write_text(json.dumps(out, indent=2) + "\n")
        log(f"wrote {OUT}")
    else:
        log("non-TPU backend: fusion differs, NOT writing the JSON")


if __name__ == "__main__":
    main()
