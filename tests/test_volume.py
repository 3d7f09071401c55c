"""Volume-op tests: LCC, unit-volume scale, marching-cubes vertex set."""

import numpy as np

from lesionvae_tpu.ops import volume as vol


def _ball(shape=(24, 24, 24), r=6.0, center=None):
    grid = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"),
                    -1)
    c = np.array(center if center is not None else np.array(shape) / 2)
    return (np.linalg.norm(grid - c, axis=-1) <= r).astype(float)


def test_lcc_picks_largest():
    m = _ball(r=5.0) + _ball(r=2.0, center=(3, 3, 3))
    cc = vol.extract_largest_connected_component(m)
    assert cc.sum() < m.sum()
    # largest component retained: centroid near the big ball's center
    np.testing.assert_allclose(vol.compute_centroid(cc), [12, 12, 12],
                               atol=0.5)


def test_unit_volume_scale():
    m = _ball(r=5.0)
    affine = np.diag([0.5, 0.5, 0.5, 1.0])
    scale, volume = vol.normalize_to_unit_volume(m, affine)
    np.testing.assert_allclose(volume, m.sum() * 0.125, rtol=1e-12)
    np.testing.assert_allclose(scale, volume ** (-1 / 3))


def test_marching_vertices_are_edge_midpoints():
    m = np.zeros((5, 5, 5))
    m[2, 2, 2] = 1.0  # single voxel → 6 face-crossing vertices
    v = vol.marching_cubes_vertices(m)
    assert v.shape == (6, 3)
    want = {(1.5, 2, 2), (2.5, 2, 2), (2, 1.5, 2), (2, 2.5, 2),
            (2, 2, 1.5), (2, 2, 2.5)}
    got = {tuple(row) for row in v}
    assert got == want


def test_marching_sphere_radius():
    m = _ball(r=7.0)
    v = vol.marching_cubes_vertices(m)
    r = np.linalg.norm(v - np.array([12, 12, 12]), axis=1)
    # all vertices within half a voxel of the true radius
    assert abs(np.median(r) - 7.0) < 0.6
    assert (np.abs(r - 7.0) < 1.0).all()


def test_extract_surface_methods_and_cap():
    m = _ball(r=6.0)
    affine = np.eye(4)
    rng = np.random.default_rng(0)
    s_m = vol.extract_surface_points(m, affine, num_points=200, rng=rng,
                                     method="marching")
    s_e = vol.extract_surface_points(m, affine, num_points=200,
                                     rng=np.random.default_rng(0),
                                     method="erosion")
    assert len(s_m) == 200 and len(s_e) == 200
    # auto gate: big lesion → marching; tiny → erosion (reference :119)
    tiny = np.zeros((8, 8, 8))
    tiny[3:5, 3:5, 3:5] = 1
    s_auto = vol.extract_surface_points(tiny, affine, num_points=200)
    voxels = np.argwhere(tiny > 0.5)
    assert {tuple(r) for r in s_auto.astype(int)} <= {tuple(r) for r in voxels}
