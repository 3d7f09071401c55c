"""Static HBM-traffic + FLOP model for the fleet training step.

Round-4 verdict: "HBM-bound" was asserted from ablations (the fused Adam
pass alone = 9.3 of 16.6 f32 ms/fleet-step; benchmarks/fleet_ablate.py)
but never expressed as achieved bytes/s vs the chip's peak.  This module
makes the claim checkable from the bench JSON: it counts, per fleet-step
(one batch step across all T members), the HBM bytes and matmul FLOPs the
program must move/execute, so

    achieved GB/s = bytes_per_step * n_steps / measured fleet device-exec s

can sit next to the v5e peaks in every round's artifacts.

Methodology (assumptions stated, cross-checked by
benchmarks/hbm_cost_probe.py against XLA's own HloCostAnalysis):

- **Parameter streams** come from the REAL param tree (jax.eval_shape on
  module.init — no device needed), split into storage-dtype weight leaves
  (conv/dense, train.lowmem._is_weight_leaf) and f32 residue:
  fwd read + bwd read + grad write + optimizer (read g,p,m,v; write p,m,v).
  The finite-loss select (train/batched.py batch_step) is assumed FUSED
  into the optimizer's output fusion (XLA does this; the cross-check probe
  validates the total).
- **Activation streams** count each fusion-boundary tensor (conv / dense /
  pool / upsample outputs) once for the fwd write, once for the bwd read,
  and once each for the grad-activation write+read — elementwise chains
  (BN scale, ReLU) fuse into their producers on TPU and are not separate
  round-trips.  Boundary list mirrors models/lesion_vae.py (reference
  architecture: src/vae/vae_model.py:17-121).
- **Data gather**: each step gathers batch_size rows of the f32 Xm/Xl
  blocks (train/batched.py batch_step's jnp.take).
- **FLOPs** count matmul/conv MACs*2 (fwd) * 3 (fwd+bwd), the standard
  convention; elementwise/VPU work (BN, ReLU, Adam's div/sqrt) is excluded
  from MFU by definition but IS part of why the step can't reach peak
  bandwidth (benchmarks/pallas_opt_probe.py: Adam's ~25 VPU ops/elem floor
  the optimizer at ~4.4 ms/step even with zero HBM traffic).

Peaks: TPU v5e (the bench chip) — 819 GB/s HBM, 197 bf16 TFLOP/s.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def _param_bytes(module, seq_len, micro_ch, lesion_ch, store_dtype):
    """(weight_leaf_bytes, other_f32_bytes) per member, from the real tree."""
    from ..train.lowmem import _is_weight_leaf

    def init():
        return module.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, seq_len, micro_ch), jnp.float32),
            jnp.zeros((2, seq_len, lesion_ch), jnp.float32),
            jax.random.PRNGKey(1), jnp.ones(2, jnp.float32), True)

    shapes = jax.eval_shape(init)
    w_elems = o_elems = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            shapes["params"])[0]:
        n = int(np.prod(leaf.shape))
        if _is_weight_leaf(path):
            w_elems += n
        else:
            o_elems += n
    w_itemsize = 2 if store_dtype == jnp.bfloat16 else 4
    return w_elems * w_itemsize, o_elems * 4, w_elems + o_elems


def _activation_elems(seq_len, micro_ch, lesion_ch, latent):
    """Fusion-boundary activation element count per SAMPLE for one forward
    pass (see module docstring); mirrors models/lesion_vae.py layer walk."""
    L = seq_len
    acts = 0
    # micro encoder: conv out + pool out per block (channel-last (L, C))
    for lo, c in ((L, 64), (L // 2, 128), (L // 4, 128)):
        acts += lo * c + (lo // 2) * c
    # lesion encoder
    for lo, c in ((L, 32), (L // 2, 64)):
        acts += lo * c + (lo // 2) * c
    h_les = (L // 4) * 64
    h = (L // 8) * 128 + h_les        # concat encoder features
    acts += h + 3 * latent            # mu, logv, z
    # decoder: fc_dec out, then convT out + upsample out per block
    acts += (L // 8) * 128
    for lo, c in ((L // 8, 64), (L // 4, 64), (L // 2, 13)):
        acts += lo * c + 2 * lo * c
    acts += L * 13                    # final interp to seq_len + recon terms
    return acts


def _matmul_flops(seq_len, micro_ch, lesion_ch, latent):
    """Forward conv/dense MACs*2 per SAMPLE (k=5 convs, channel walk per
    models/lesion_vae.py)."""
    L, k = seq_len, 5
    f = 0
    for lo, ci, co in ((L, micro_ch, 64), (L // 2, 64, 128),
                       (L // 4, 128, 128),                    # micro enc
                       (L, lesion_ch, 32), (L // 2, 32, 64)):  # lesion enc
        f += 2 * lo * k * ci * co
    h_in = (L // 8) * 128 + (L // 4) * 64
    f += 2 * 2 * h_in * latent                                # fc_mu, fc_logv
    f += 2 * (latent + (L // 4) * 64) * ((L // 8) * 128)      # fc_dec
    for lo, ci, co in ((L // 8, 128, 64), (L // 4, 64, 64),
                       (L // 2, 64, 13)):                     # decoder convT
        f += 2 * lo * k * ci * co
    return f


def fleet_step_cost(T: int, seq_len: int = 100, micro_ch: int = 13,
                    lesion_ch: int = 3, latent: int = 10,
                    batch_size: int = 64, store_dtype=jnp.bfloat16,
                    compute_dtype=jnp.bfloat16,
                    module=None) -> dict:
    """Bytes + FLOPs for ONE fleet-step (one batch step across T members).

    Returns a dict with per-category GB and total flops; feed the totals to
    :func:`traffic_summary` with the measured device seconds."""
    if module is None:
        from ..models.lesion_vae import LesionConditionedVAE
        module = LesionConditionedVAE(
            seq_len=seq_len, micro_ch=micro_ch, lesion_ch=lesion_ch,
            latent=latent, compute_dtype=compute_dtype)
    w_b, o_b, n_params = _param_bytes(module, seq_len, micro_ch, lesion_ch,
                                      store_dtype)
    p_b = w_b + o_b                                    # one param-tree pass
    act_itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
    act_b = _activation_elems(seq_len, micro_ch, lesion_ch, latent) \
        * act_itemsize * batch_size
    per_member = {
        # fwd reads p; bwd reads p again; grads written once (storage dtype)
        "weights_fwd_bwd": 2 * p_b + p_b,
        # optimizer: read g + read p,m,v + write p,m,v (moments share the
        # weight-leaf storage dtype — train.lowmem stores mu/nu in bf16 too)
        "optimizer": p_b + 3 * p_b + 3 * p_b,
        # fwd write + bwd read + grad-act write+read
        "activations": 4 * act_b,
        # batch gather of f32 Xm/Xl rows
        "data_gather": batch_size * seq_len * (micro_ch + lesion_ch) * 4,
    }
    bytes_step = {k: v * T for k, v in per_member.items()}
    flops_step = 3 * _matmul_flops(seq_len, micro_ch, lesion_ch, latent) \
        * batch_size * T
    return {"bytes_by_category": bytes_step,
            "bytes_total": float(sum(bytes_step.values())),
            "flops_total": float(flops_step),
            "params_per_member": int(n_params)}


def traffic_summary(cost: dict, n_steps: int, device_s: float) -> dict:
    """Achieved bandwidth / MFU fields for the bench JSON."""
    gb = cost["bytes_total"] * n_steps / 1e9
    tf = cost["flops_total"] * n_steps / 1e12
    gbps = gb / device_s if device_s > 0 else 0.0
    tfps = tf / device_s if device_s > 0 else 0.0
    return {
        "fleet_bytes_per_step_mb": round(cost["bytes_total"] / 1e6, 1),
        "fleet_hbm_gbps": round(gbps, 1),
        "fleet_hbm_frac_peak": round(gbps / V5E_HBM_GBPS, 3),
        "fleet_mfu": round(tfps / V5E_BF16_TFLOPS, 4),
    }


def bench_traffic_fields(ledger, epochs: int, batch_size: int,
                         store_dtype, compute_dtype,
                         fleet_device_s: float,
                         latent: int = 10) -> dict:
    """Bench JSON fields from a train.batched.FLEET_LAUNCH_LEDGER capture.

    Each ledger entry is one fleet-program dispatch; its arg avals carry the
    member count (Tc), row padding (n_pad, which fixes steps/epoch) and the
    tensor dims, so the total member-steps executed during the profiled
    pass is exact regardless of stream-block / upload-chunk splitting."""
    if not ledger or fleet_device_s <= 0:
        return {}
    member_steps = 0
    for _prog, avals in ledger:
        Tc, n_pad = avals[0].shape[0], avals[0].shape[1]
        member_steps += Tc * epochs * max(1, n_pad // batch_size)
    seq_len, micro_ch = ledger[0][1][0].shape[2], ledger[0][1][0].shape[3]
    lesion_ch = ledger[0][1][1].shape[3]
    cost = fleet_step_cost(T=1, seq_len=seq_len, micro_ch=micro_ch,
                           lesion_ch=lesion_ch, latent=latent,
                           batch_size=batch_size, store_dtype=store_dtype,
                           compute_dtype=compute_dtype)
    gb = cost["bytes_total"] * member_steps / 1e9
    tf = cost["flops_total"] * member_steps / 1e12
    return {
        "fleet_traffic_gb": round(gb, 1),
        "fleet_hbm_gbps": round(gb / fleet_device_s, 1),
        "fleet_hbm_frac_peak": round(gb / fleet_device_s / V5E_HBM_GBPS, 3),
        "fleet_mfu": round(tf / fleet_device_s / V5E_BF16_TFLOPS, 4),
    }
