"""Member-chunked fleet launches (train.batched upload_chunks): parity pins.

Chunking splits the launch into K member-axis slices — each its own H2D +
program dispatch, so on the remote attachment chunk N+1's upload streams
while chunk N executes (benchmarks/h2d_exec_overlap_probe.py).  Per-member
math is unchanged: keys are split once then sliced, quantization ranges are
per-member, and every program output is member-leading, so the chunked
fleet must reproduce the single launch member for member.
"""

import numpy as np
import pytest

from lesionvae_tpu.train.batched import launch_many_vaes


def _cohort(T=4, n=32, L=8, cm=3, cl=2, seed=0):
    rng = np.random.default_rng(seed)
    Xm = rng.normal(size=(T, n, L, cm)).astype(np.float32)
    Xl = rng.uniform(size=(T, n, L, cl)).astype(np.float32)
    n_real = np.array([n, n - 5, n - 2, n], np.int32)[:T]
    return Xm, Xl, n_real


def _launch(chunks, quantize, with_summary=True, T=4):
    Xm, Xl, n_real = _cohort(T=T)
    spec = None
    if with_summary:
        sham = np.zeros((T, Xm.shape[1]), np.float32)
        sham[:, :4] = 1.0
        subj = np.tile(np.arange(Xm.shape[1], dtype=np.int32) % 3,
                       (T, 1))
        spec = (sham, subj, 3, 7)
    return launch_many_vaes(
        Xm, Xl, n_real, latent_dim=2, epochs=2, batch_size=16, seed=11,
        summary_spec=spec, normalize_on_device=True,
        quantize_upload=quantize, upload_chunks=chunks)


@pytest.mark.parametrize("quantize", [False, True])
def test_chunked_matches_single_launch(quantize):
    h1 = _launch(chunks=1, quantize=quantize)
    h2 = _launch(chunks=2, quantize=quantize)
    hist1, hist2 = np.asarray(h1.hist_T), np.asarray(h2.hist_T)
    assert hist1.shape == hist2.shape
    np.testing.assert_allclose(hist1, hist2, rtol=1e-5, atol=1e-6)
    # vmap width changes XLA's reduction vectorization; the summary's
    # segment sums see f32 reduction-order noise (measured max rel 6.5e-5
    # on CPU) — member math is identical, so a few-x band over that is
    # the right pin, not exact equality
    for a, b in zip(h1.summary_T, h2.summary_T):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)
    # device-resident normalized datasets re-stack to the same blocks
    np.testing.assert_allclose(np.asarray(h1.Xm_j), np.asarray(h2.Xm_j),
                               rtol=1e-6, atol=1e-7)
    # per-member params match (same keys: split once, sliced per chunk)
    import jax
    p1 = jax.tree_util.tree_leaves(h1.params_T)
    p2 = jax.tree_util.tree_leaves(h2.params_T)
    # two epochs of training accumulate the same reduction noise into the
    # params; near-zero weights make rtol meaningless, so pin with an
    # absolute band (observed max abs drift 5.2e-6)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-3, atol=1e-4)


def test_chunked_without_summary_or_normalize():
    Xm, Xl, n_real = _cohort()
    h1 = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                          batch_size=16, seed=3, upload_chunks=1)
    h2 = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                          batch_size=16, seed=3, upload_chunks=4)
    np.testing.assert_allclose(np.asarray(h1.hist_T), np.asarray(h2.hist_T),
                               rtol=1e-5, atol=1e-6)
    # raw-upload contract: handle keeps the device-resident dataset
    np.testing.assert_allclose(np.asarray(h1.Xm_j), np.asarray(h2.Xm_j))
    models, hist = h2.fetch()
    assert len(models) == 4 and hist.shape[0] == 4


def test_chunk_validation():
    Xm, Xl, n_real = _cohort()
    with pytest.raises(ValueError, match="not divisible"):
        launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                         batch_size=16, upload_chunks=3)
    with pytest.raises(ValueError, match="must be >= 1"):
        launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                         batch_size=16, upload_chunks=0)


def test_chunks_auto():
    """'auto' = largest divisor of T <= 8: T=6 -> 3 chunks of 2 members;
    results must match the explicit single launch."""
    Xm, Xl, n_real = _cohort(T=6)
    n_real = np.array([32, 27, 30, 32, 31, 32], np.int32)
    h1 = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                          batch_size=16, seed=5, upload_chunks=1)
    h2 = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                          batch_size=16, seed=5, upload_chunks="auto")
    np.testing.assert_allclose(np.asarray(h1.hist_T), np.asarray(h2.hist_T),
                               rtol=1e-5, atol=1e-6)


def test_member_keys_split_launch():
    """One logical fleet launched as two key-sliced blocks reproduces the
    single launch member for member (the streaming bench pipeline's
    contract: block k passes the canonical fleet's key slice)."""
    import jax

    Xm, Xl, n_real = _cohort(T=4)
    h_full = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=2,
                              batch_size=16, seed=9,
                              normalize_on_device=True)
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    parts = [launch_many_vaes(Xm[sl], Xl[sl], n_real[sl], latent_dim=2,
                              epochs=2, batch_size=16, seed=123,  # ignored
                              normalize_on_device=True,
                              member_keys=np.asarray(keys)[sl])
             for sl in (slice(0, 2), slice(2, 4))]
    hist_full = np.asarray(h_full.hist_T)
    hist_parts = np.concatenate([np.asarray(p.hist_T) for p in parts])
    np.testing.assert_allclose(hist_full, hist_parts, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="member_keys"):
        launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                         batch_size=16, member_keys=np.asarray(keys)[:2])


def test_chunks_reject_mesh():
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    if devs.size < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(devs, ("data",))
    Xm, Xl, n_real = _cohort(T=4)
    with pytest.raises(ValueError, match="single-chip"):
        launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=1,
                         batch_size=16, mesh=mesh, upload_chunks=2)
