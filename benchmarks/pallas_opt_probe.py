#!/usr/bin/env python
"""Pallas probe: what does VMEM residency buy the fleet optimizer?

Round-3 finding (docs/STATUS_R3.md): the production fleet step is
12.9 ms with bf16 storage, vs a ~3.6 ms raw-bytes bound — the optimizer's
p/m/v streams round-trip HBM every step.  The round-4 candidate is a
hand-written member kernel that keeps state RESIDENT in VMEM across steps.
But v5e VMEM is ~16 MB/core and one member's p+m+v at bf16 is ~16.8 MB —
whole-member residency is at/over budget before activations.  This probe
measures the two bounds that decide the round-4 design:

  xla      K Adam steps as a lax.scan over (T, P) bf16 buffers — the
           production pattern: every step streams p/m/v from HBM.
  resident the same K steps inside ONE pallas kernel, grid over
           (member, param-block), state held in VMEM registers across the
           K inner iterations — HBM traffic is ONE read + ONE write of
           p/m/v total, independent of K.  (Real training cannot block the
           param axis like this — grads need the whole member's fwd/bwd —
           so this is the RESIDENCY CEILING, not a shippable step.)

The gap between them is the maximum the round-4 kernel can claw from the
optimizer phase; combined with the VMEM budget above it decides between
p-only residency (5.6 MB, m/v streamed) and a split design.

MEASURED (v5e, T=64, P=2.8M, bf16, block 256k):

    K=1   xla 33.4 ms             | resident 55.4 ms   (launch overhead)
    K=10  xla  6.9 ms/step 319GB/s| resident  7.8 ms/step
    K=30  xla  4.5 ms/step 485GB/s| resident  4.4 ms/step   ratio 1.0x

PROBE_FASTMATH=1 (eps-inside rsqrt Adam) at K=30: xla 4.36 ms/step
(505 GB/s), resident 3.91 ms/step — the streaming path moves ~4% (it is
bandwidth-bound; the formula doesn't matter) and even the resident form
only 11%, so no fast-math production knob is warranted either.

CONCLUSION — residency buys ~NOTHING for the optimizer: with HBM traffic
eliminated, Adam's own VPU math (div+sqrt-heavy, ~25 effective ops/elem)
floors at ~4.4 ms/step — equal to the XLA streaming floor at the ~485 GB/s
the scan already achieves.  The bf16 optimizer pass is simultaneously
bandwidth- AND compute-limited; together with the VMEM budget (16 MB <
one member's p+m+v at 16.8 MB) this CLOSES the round-4 whole-member-kernel
hypothesis: the production 12.9 ms step's remaining gap to ~8 ms is
fwd/bwd dispatch structure, not optimizer bytes, and no Pallas rewrite of
the optimizer can pay for itself.

Grads are synthetic-elementwise (g = a*p + c) so both paths run identical
math; both round p/m/v to bf16 every step (production storage-rounding
semantics) and a sample row is checked equal.

usage: python benchmarks/pallas_opt_probe.py [K ...]
env: PROBE_T (members, default 64), PROBE_P (params/member, default
2867200 = 2800*1024 ~ the real 2.8M), PROBE_BLK (block, default 262144).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lesionvae_tpu.utils.cache import configure_cache
configure_cache("tpu")  # shared repo-local cache (advisor r4: /tmp dir drifted)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

T = int(os.environ.get("PROBE_T", "64"))
P = int(os.environ.get("PROBE_P", str(2800 * 1024)))
BLK = int(os.environ.get("PROBE_BLK", str(256 * 1024)))
# BLK 512*1024 OOMs scoped VMEM at 20.8M vs the 16.0M limit (3 bf16 in +
# 3 bf16 out blocks + the f32 p/m/v loop carries + temps) — a direct
# measurement of how little VMEM a whole-member kernel would have to play
# with: one member's p+m+v bf16 alone is ~16.8 MB.
LANES = 256          # 2-D view: (BLK // LANES, LANES) tiles cleanly for bf16
B1, B2, LR, EPS = 0.9, 0.999, 2e-4, 1e-8
GA, GC = 0.999, 1e-3  # synthetic grad g = GA*p + GC
# PROBE_FASTMATH=1: eps-inside-sqrt Adam via one fused rsqrt — measures
# whether the VPU compute floor is the divide/sqrt chain
FASTMATH = os.environ.get("PROBE_FASTMATH", "0") == "1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _adam(p, m, v, g):
    m2 = B1 * m + (1 - B1) * g
    v2 = B2 * v + (1 - B2) * g * g
    if FASTMATH:
        p2 = p - LR * m2 * jax.lax.rsqrt(v2 + EPS * EPS)
    else:
        p2 = p - LR * (m2 / (jnp.sqrt(v2) + EPS))
    return p2, m2, v2


def run_xla(p0, m0, v0, k, c):
    # returns a CHECKSUM, not the params: fetching 367 MB of outputs over
    # the 7-49 MB/s tunnel would dominate the measurement; the scalar
    # depends on every element, so its fetch is the completion barrier
    def body(carry, _):
        p, m, v = carry
        g = GA * p.astype(jnp.float32) + c
        p2, m2, v2 = _adam(p.astype(jnp.float32), m.astype(jnp.float32),
                           v.astype(jnp.float32), g)
        return (p2.astype(p0.dtype), m2.astype(p0.dtype),
                v2.astype(p0.dtype)), 0.0

    (p, m, v), _ = jax.lax.scan(body, (p0, m0, v0), None, length=k)
    return jnp.sum(p.astype(jnp.float32)), p[:1, :LANES]


def _resident_kernel(k_ref, c_ref, p_ref, m_ref, v_ref,
                     po_ref, mo_ref, vo_ref):
    # carry bf16 and round every step (same storage-rounding semantics as
    # the XLA scan, so the parity check is exact-modulo-fp-order)
    def body(i, carry):
        p, m, v = carry
        g = GA * p.astype(jnp.float32) + c_ref[0]
        p2, m2, v2 = _adam(p.astype(jnp.float32), m.astype(jnp.float32),
                           v.astype(jnp.float32), g)
        return (p2.astype(p_ref.dtype), m2.astype(p_ref.dtype),
                v2.astype(p_ref.dtype))

    p, m, v = jax.lax.fori_loop(0, k_ref[0], body,
                                (p_ref[:], m_ref[:], v_ref[:]))
    po_ref[:] = p
    mo_ref[:] = m
    vo_ref[:] = v


def run_resident(p0, m0, v0, k, c):
    rows_total = (T * P) // LANES
    rows_blk = BLK // LANES
    grid = (rows_total // rows_blk,)
    spec = pl.BlockSpec((rows_blk, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    view = lambda x: x.reshape(rows_total, LANES)  # noqa: E731
    po, mo, vo = pl.pallas_call(
        _resident_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [spec] * 3,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((rows_total, LANES), p0.dtype)
                        for _ in range(3)),
    )(jnp.asarray([k], jnp.int32), jnp.asarray([c], jnp.float32),
      view(p0), view(m0), view(v0))
    return jnp.sum(po.astype(jnp.float32)), po[:1, :LANES]


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    # blocks may span member boundaries: Adam is elementwise and the
    # synthetic grads are too, so only the TOTAL must tile
    assert (T * P) % BLK == 0 and BLK % LANES == 0
    log(f"devices: {jax.devices()}  T={T} P={P} ({T * P / 1e6:.0f}M params, "
        f"{3 * T * P * 2 / 1e9:.2f} GB p+m+v bf16)  block={BLK}")
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(T, P)) * 0.02, jnp.bfloat16)
    m0 = jnp.zeros((T, P), jnp.bfloat16)
    v0 = jnp.zeros((T, P), jnp.bfloat16)

    gb_per_step = 6 * T * P * 2 / 1e9  # p/m/v read+write, bf16
    for k in ks:
        fx = jax.jit(run_xla, static_argnames="k")
        fr = jax.jit(run_resident, static_argnames="k")
        _, sx = fx(p0, m0, v0, k, GC)
        sx_h = np.asarray(sx, np.float32)       # compile + small-row fetch
        _, sr = fr(p0, m0, v0, k, GC)
        sr_h = np.asarray(sr, np.float32)
        np.testing.assert_allclose(sr_h, sx_h, rtol=1e-2, atol=1e-4)
        res = {}
        for name, fn in (("xla", fx), ("resident", fr)):
            t0 = time.perf_counter()
            reps = 3
            for r in range(reps):
                # vary c per rep: the remote service may serve repeated
                # byte-identical calls from a cache
                cs, _ = fn(p0, m0, v0, k, GC * (1.0 + 1e-4 * (r + 1)))
                float(cs)    # scalar depends on every element -> barrier
            res[name] = (time.perf_counter() - t0) / reps
        eff = gb_per_step * k / res["xla"]
        log(f"[K={k:3d}] xla {res['xla'] * 1e3:8.2f} ms "
            f"({res['xla'] / k * 1e3:6.2f} ms/step, {eff:.0f} GB/s) | "
            f"resident {res['resident'] * 1e3:8.2f} ms "
            f"({res['resident'] / k * 1e3:6.2f} ms/step) | "
            f"ratio {res['xla'] / res['resident']:.1f}x")


if __name__ == "__main__":
    main()
