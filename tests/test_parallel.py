"""Multi-chip sharding tests on the fake 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lesionvae_tpu.ops.geometry import streamline_metrics
from lesionvae_tpu.ops.padding import pad_streamlines
from lesionvae_tpu.parallel.mesh import (data_sharding, make_mesh,
                                         pad_to_multiple)
from lesionvae_tpu.parallel.sharded import (dryrun_train_step,
                                            sharded_streamline_metrics)


def test_eight_fake_devices():
    assert jax.device_count() >= 8


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}


def test_sharded_geometry_matches_single_device(rng):
    bundle = [rng.normal(size=(int(rng.integers(5, 30)), 3)) for _ in range(16)]
    pts, lens = pad_streamlines(bundle, dtype=np.float32)
    mesh = make_mesh(8)
    got = sharded_streamline_metrics(pts, lens, mesh)
    want = streamline_metrics(jnp.asarray(pts), jnp.asarray(lens))
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-6, err_msg=k)


def test_pad_to_multiple():
    arr = np.ones((13, 3))
    padded, n = pad_to_multiple(arr, 8)
    assert padded.shape == (16, 3) and n == 13


@pytest.mark.parametrize("n_devices,mp", [
    pytest.param(8, 2, marks=pytest.mark.slow), (4, 1), (2, 2)])
def test_dryrun_multichip_train_step(n_devices, mp):
    loss, delta = dryrun_train_step(n_devices, model_parallel=mp)
    assert np.isfinite(loss)
    assert delta > 0


def test_dp_step_matches_single_device():
    """The sharded DP+TP step must produce the same loss as a 1-device run."""
    loss8, _ = dryrun_train_step(8, model_parallel=2)
    loss1, _ = dryrun_train_step(1, model_parallel=1)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)


def test_batched_bundle_metrics_sharded_matches(rng):
    from lesionvae_tpu.pipeline.geometry_run import batched_bundle_metrics
    bundles = [[rng.normal(size=(int(rng.integers(5, 30)), 3))
                for _ in range(6)] for _ in range(5)]
    mesh = make_mesh(8)
    plain = batched_bundle_metrics(bundles)
    sharded = batched_bundle_metrics(bundles, mesh=mesh)
    for a, b in zip(plain, sharded):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)


def test_fleet_member_sharding_matches_single_device(rng):
    """Fleet parallelism: sharding the MEMBER axis over the mesh's data
    axis trains identical models (members are independent — XLA partitions
    with zero collectives)."""
    from lesionvae_tpu.train.batched import launch_many_vaes, pad_datasets

    tensors = [
        (rng.normal(size=(24, 12, 3)).astype(np.float32),
         rng.uniform(size=(24, 12, 2)).astype(np.float32))
        for _ in range(8)
    ]
    Xm_T, Xl_T, n_real = pad_datasets(tensors, batch_size=8)
    n_pad = Xm_T.shape[1]
    sham_T = np.zeros((8, n_pad), np.float32)
    sham_T[:, :6] = 1.0
    subj_T = np.full((8, n_pad), 3, np.int32)
    subj_T[:, :n_real[0]] = np.arange(n_real[0]) % 3

    mesh = make_mesh(8)
    h_sh = launch_many_vaes(Xm_T, Xl_T, n_real, latent_dim=2, epochs=2,
                            batch_size=8, seed=5,
                            summary_spec=(sham_T, subj_T, 4, 5),
                            normalize_on_device=True, mesh=mesh)
    h_1 = launch_many_vaes(Xm_T, Xl_T, n_real, latent_dim=2, epochs=2,
                           batch_size=8, seed=5,
                           summary_spec=(sham_T, subj_T, 4, 5),
                           normalize_on_device=True)
    np.testing.assert_allclose(np.asarray(h_sh.hist_T),
                               np.asarray(h_1.hist_T), rtol=1e-5, atol=1e-6)
    for a, b in zip(h_sh.summary_T, h_1.summary_T):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # indivisible fleet size is rejected up front
    with pytest.raises(ValueError):
        launch_many_vaes(Xm_T[:6], Xl_T[:6], n_real[:6], latent_dim=2,
                         epochs=1, batch_size=8, seed=5, mesh=mesh)
