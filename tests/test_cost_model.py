"""utils/cost_model: the static HBM-traffic model behind the bench's
fleet_hbm_gbps / fleet_mfu fields (VERDICT r4 #3 quantification)."""

import jax
import jax.numpy as jnp
import numpy as np

from lesionvae_tpu.utils.cost_model import (bench_traffic_fields,
                                            fleet_step_cost, traffic_summary)


def test_param_count_matches_real_init():
    """The eval_shape walk must count exactly the params a real init makes
    (the model whose streams the byte model charges for)."""
    from lesionvae_tpu.models.lesion_vae import LesionConditionedVAE
    module = LesionConditionedVAE(seq_len=100, micro_ch=13, lesion_ch=3,
                                  latent=10)
    variables = module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 100, 13), jnp.float32),
        jnp.zeros((2, 100, 3), jnp.float32),
        jax.random.PRNGKey(1), jnp.ones(2, jnp.float32), True)
    real = sum(int(np.prod(x.shape))
               for x in jax.tree.leaves(variables["params"]))
    cost = fleet_step_cost(T=1)
    assert cost["params_per_member"] == real
    # the architecture is fc_dec-dominated (reference src/vae/vae_model.py):
    # ~2.7M params, fc_dec alone 1610*1536
    assert 2_500_000 < real < 3_000_000


def test_step_cost_scales_with_T_and_dtype():
    c1 = fleet_step_cost(T=1)
    c64 = fleet_step_cost(T=64)
    assert np.isclose(c64["bytes_total"], 64 * c1["bytes_total"])
    assert np.isclose(c64["flops_total"], 64 * c1["flops_total"])
    # f32 storage doubles every weight stream (weights dominate the tree)
    f32 = fleet_step_cost(T=1, store_dtype=jnp.float32,
                          compute_dtype=jnp.float32)
    assert f32["bytes_total"] > 1.7 * c1["bytes_total"]
    # optimizer streams (7 passes over p/m/v/g) must dominate weights_fwd_bwd
    # (3 passes) — the measured basis of the bf16-storage lever
    by = c1["bytes_by_category"]
    assert by["optimizer"] > 2 * by["weights_fwd_bwd"] / 3 * 2


def test_traffic_summary_fields():
    cost = fleet_step_cost(T=64)
    s = traffic_summary(cost, n_steps=600, device_s=7.0)
    assert 0 < s["fleet_hbm_frac_peak"] < 1.5  # sanity: sub-peak-ish
    assert 0 < s["fleet_mfu"] < 1.0
    assert s["fleet_hbm_gbps"] > 0


def test_bench_traffic_fields_from_ledger():
    """Folding a synthetic ledger (4 blocks x 2 chunks of 8 members,
    n_pad=960) must count member-steps exactly: 64 * epochs * 15."""
    aval = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)  # noqa: E731
    entry = (None, (aval((8, 960, 100, 13), jnp.uint16),
                    aval((8, 960, 100, 3), jnp.uint16),
                    aval((8,), jnp.int32), aval((8, 2), jnp.uint32)))
    ledger = [entry] * 8  # 64 members total
    fields = bench_traffic_fields(ledger, epochs=40, batch_size=64,
                                  store_dtype=jnp.bfloat16,
                                  compute_dtype=jnp.bfloat16,
                                  fleet_device_s=6.93)
    per_member = fleet_step_cost(T=1)["bytes_total"]
    expect_gb = per_member * 64 * 40 * 15 / 1e9
    assert np.isclose(fields["fleet_traffic_gb"], round(expect_gb, 1))
    assert np.isclose(fields["fleet_hbm_gbps"],
                      round(expect_gb / 6.93, 1))
    assert fields["fleet_hbm_frac_peak"] == round(
        fields["fleet_hbm_gbps"] / 819.0, 3)
    # empty ledger / zero device time -> no fields, never a crash
    assert bench_traffic_fields([], 40, 64, jnp.bfloat16, jnp.bfloat16,
                                1.0) == {}
    assert bench_traffic_fields(ledger, 40, 64, jnp.bfloat16, jnp.bfloat16,
                                0.0) == {}
