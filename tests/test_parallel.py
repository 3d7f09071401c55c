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
