"""Trainer tests: history contract, loss decrease, normative z-scores,
data building + normalization oracles."""

import numpy as np
import pandas as pd
import pytest

from lesionvae_tpu.io import synth
from lesionvae_tpu.io.synth import tiny_config
from lesionvae_tpu.train import data as vdata
from lesionvae_tpu.train.normative import (compute_normative_statistics,
                                           compute_zscore_residuals)
from lesionvae_tpu.train.trainer import train_lesion_vae

SEQ, MC, LC = 48, 5, 3


def _toy_data(n=100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, SEQ)
    base = np.sin(2 * np.pi * t)[None, :, None]
    Xm = (base + 0.1 * rng.normal(size=(n, SEQ, MC))).astype(np.float32)
    Xl = rng.uniform(0, 1, size=(n, SEQ, LC)).astype(np.float32)
    return Xm, Xl


def test_training_runs_and_history_contract():
    Xm, Xl = _toy_data(n=100)
    model, hist = train_lesion_vae(Xm, Xl, latent_dim=4, epochs=8,
                                   batch_size=32, seed=0)
    assert list(hist.columns) == ["loss", "recon", "kld", "beta"]
    assert len(hist) == 8
    # beta anneals 0.1 → 2.0 (vae_model.py:135-137)
    np.testing.assert_allclose(hist["beta"].iloc[0], 0.1, rtol=1e-6)
    np.testing.assert_allclose(hist["beta"].iloc[-1], 2.0, rtol=1e-6)
    assert np.isfinite(hist["loss"]).all()
    # training reduces the reconstruction error
    assert hist["recon"].iloc[-1] < hist["recon"].iloc[0]


def test_partial_batch_and_nan_inputs():
    """n not divisible by batch; NaNs imputed to 0 (vae_model.py:184-185)."""
    Xm, Xl = _toy_data(n=70, seed=1)
    Xm[3, 5, 2] = np.nan
    Xl[9, 0, 1] = np.nan
    model, hist = train_lesion_vae(Xm, Xl, latent_dim=3, epochs=3,
                                   batch_size=32, seed=1)
    assert np.isfinite(hist[["loss", "recon", "kld"]].values).all()


def test_determinism_same_seed():
    Xm, Xl = _toy_data(n=64, seed=2)
    _, h1 = train_lesion_vae(Xm, Xl, latent_dim=3, epochs=3, batch_size=32,
                             seed=7)
    _, h2 = train_lesion_vae(Xm, Xl, latent_dim=3, epochs=3, batch_size=32,
                             seed=7)
    np.testing.assert_allclose(h1.values, h2.values, rtol=1e-6)


def test_normative_zscores():
    Xm, Xl = _toy_data(n=96, seed=3)
    model, _ = train_lesion_vae(Xm, Xl, latent_dim=4, epochs=5, batch_size=32,
                                seed=3)
    mean_r, std_r = compute_normative_statistics(model, Xm[:48], Xl[:48])
    assert mean_r.shape == (SEQ, MC)
    assert (std_r >= 1e-6).all()
    z, mag = compute_zscore_residuals(model, Xm, Xl, mean_r, std_r)
    assert z.shape == Xm.shape
    assert mag.shape == (len(Xm),)
    assert np.isfinite(z).all() and np.isfinite(mag).all()
    # magnitude is RMS of z over (position, feature)
    np.testing.assert_allclose(mag, np.sqrt((z ** 2).mean(axis=(1, 2))),
                               rtol=1e-6)


def test_normalization_oracle():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(50, 10, 4)).astype(np.float32) * 5 + 2
    X[0, 0, 0] = np.nan
    X[1, 2, 3] = np.inf
    Xl = rng.normal(size=(50, 10, 3)).astype(np.float32)
    stats = vdata.fit_normalization_stats(X, Xl, [f"f{i}" for i in range(4)])
    flat = X.reshape(-1, 4)
    for j in range(4):
        xj = flat[np.isfinite(flat[:, j]), j]
        np.testing.assert_allclose(stats["median"][j], np.median(xj), rtol=1e-5)
        np.testing.assert_allclose(stats["mean"][j], xj.mean(), rtol=1e-5)
        np.testing.assert_allclose(stats["std"][j], xj.std(), rtol=1e-5)
    Xz, Xl2 = vdata.apply_normalization(X, Xl, stats)
    assert np.isfinite(Xz).all()
    # normalized features ≈ zero mean unit std (over the finite entries)
    assert abs(Xz.reshape(-1, 4).mean(0)).max() < 0.05
    np.testing.assert_allclose(Xz.reshape(-1, 4).std(0), 1.0, atol=0.05)


def test_build_tensor_from_synth_csvs(tmp_path):
    cfg = tiny_config(n_per_group=1, tracts=["atr_left"])
    root = synth.generate_cohort(tmp_path, cfg, seed=21, n_streamlines=8,
                                 volume_shape=(12, 12, 12), with_profiles=True)
    groups = cfg.subjects_by_group()
    subjects = [s for subs in groups.values() for s in subs]
    Xm, Xl, sids, glabels, s = vdata.build_tensor_with_lesion_context(
        root, "atr_left", "9d", subjects, cfg.microstructure_features,
        cfg.lesion_features, groups)
    assert Xm.shape[1:] == (100, 13)
    assert Xl.shape[1:] == (100, 3)
    assert Xm.shape[0] == Xl.shape[0] == len(sids) == len(glabels)
    assert set(glabels) == {"Sham", "TBI", "PTE"}
    # Sham CSVs lack lesion cols → imputed to 0/0/15→1.0 after clip-scale
    sham_rows = glabels == "Sham"
    np.testing.assert_allclose(Xl[sham_rows][:, :, 0], 0.0)
    np.testing.assert_allclose(Xl[sham_rows][:, :, 2], 1.0)
    # lesion_distance scaled into [0, 1]
    assert Xl[:, :, 2].min() >= 0 and Xl[:, :, 2].max() <= 1.0
    assert s.shape == (100,)


def test_normalize_on_device_matches_host():
    """In-program normalization (train.data.normalize_on_device) == host
    fit_normalization_stats + apply_normalization, and training on raw
    tensors with the flag == training on host-normalized tensors."""
    import jax.numpy as jnp

    from lesionvae_tpu.train import data as vdata
    from lesionvae_tpu.train.batched import launch_many_vaes, pad_datasets

    rng = np.random.default_rng(9)
    raw = []
    for n in (40, 25):
        xm = rng.normal(size=(n, 16, 3)).astype(np.float32) * 7 + 2
        xm[rng.uniform(size=xm.shape) < 0.03] = np.nan  # non-finite sites
        xm[0, 0, 0] = np.inf
        xl = rng.uniform(size=(n, 16, 2)).astype(np.float32)
        raw.append((xm, xl))

    # direct function parity on one padded member
    Xm_T, Xl_T, n_real = pad_datasets(raw, batch_size=16)
    for i, (xm, xl) in enumerate(raw):
        st = vdata.fit_normalization_stats(xm, xl, ["a", "b", "c"])
        xz_h, xl_h = vdata.apply_normalization(xm, xl, st)
        xz_d, xl_d, st_d = vdata.normalize_on_device(
            jnp.asarray(Xm_T[i]), jnp.asarray(Xl_T[i]), n_real[i])
        for k in ("median", "mean", "std"):
            np.testing.assert_allclose(np.asarray(st_d[k]), st[k],
                                       rtol=2e-5, atol=1e-6, err_msg=k)
        np.testing.assert_allclose(np.asarray(xz_d)[:n_real[i]], xz_h,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(xl_d)[:n_real[i]], xl_h,
                                   rtol=1e-6, atol=1e-7)

    # end-to-end: training histories agree (pad rows normalize differently
    # but are masked out of every loss/stat)
    normed = [vdata.apply_normalization(
        xm, xl, vdata.fit_normalization_stats(xm, xl, ["a", "b", "c"]))
        for xm, xl in raw]
    Xmn, Xln, _ = pad_datasets(normed, batch_size=16)
    h_dev = launch_many_vaes(Xm_T, Xl_T, n_real, latent_dim=2, epochs=2,
                             batch_size=16, seed=3, normalize_on_device=True)
    h_host = launch_many_vaes(Xmn, Xln, n_real, latent_dim=2, epochs=2,
                              batch_size=16, seed=3)
    assert h_dev.norm_stats_T is not None
    np.testing.assert_allclose(np.asarray(h_dev.hist_T),
                               np.asarray(h_host.hist_T), rtol=1e-3,
                               atol=1e-5)


def test_fused_optimizer_matches_optax_chain():
    """make_optimizer (single-pass fused clip→decay→Adam→scale) must equal
    the optax chain oracle step-for-step on a multi-step trajectory."""
    import jax
    import jax.numpy as jnp

    from lesionvae_tpu.train.trainer import (make_optimizer,
                                             make_optimizer_reference)

    rng = np.random.default_rng(11)
    params = {"w": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
              "b": {"x": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}}
    fused = make_optimizer(2e-4, 1e-3, 2.0)
    ref = make_optimizer_reference(2e-4, 1e-3, 2.0)
    sf, sr = fused.init(params), ref.init(params)
    pf = pr = params
    for step in range(5):
        scale = 100.0 if step in (1, 3) else 0.1  # above + below the clip
        g = {"w": jnp.asarray(rng.normal(size=(7, 5)) * scale, jnp.float32),
             "b": {"x": jnp.asarray(rng.normal(size=(5,)) * scale,
                                    jnp.float32)}}
        uf, sf = fused.update(g, sf, pf)
        ur, sr = ref.update(g, sr, pr)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-8), uf, ur)
        pf = jax.tree.map(lambda p, u: p + u, pf, uf)
        pr = jax.tree.map(lambda p, u: p + u, pr, ur)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-6, atol=1e-8), pf, pr)


def test_normalize_on_device_empty_column_matches_host():
    """A feature column with ZERO finite values must fall back to
    median=mean=0, std=1 (reference normalization.py:35-38) so imputed
    entries z-score to exactly 0 — not the +inf-median / 1e-6-floor the
    masked reductions would otherwise produce (ADVICE r2)."""
    import jax.numpy as jnp

    from lesionvae_tpu.train import data as vdata

    rng = np.random.default_rng(3)
    xm = rng.normal(size=(12, 8, 3)).astype(np.float32)
    xm[:, :, 1] = np.nan          # an entirely non-finite column
    xl = rng.uniform(size=(12, 8, 2)).astype(np.float32)

    st = vdata.fit_normalization_stats(xm, xl, ["a", "b", "c"])
    assert st["median"][1] == 0.0 and st["mean"][1] == 0.0
    assert st["std"][1] == 1.0
    xz_h, _ = vdata.apply_normalization(xm, xl, st)

    n_pad = 16  # pad rows exercise the row mask too
    Xm_p = np.zeros((n_pad, 8, 3), np.float32)
    Xm_p[:12] = xm
    Xl_p = np.zeros((n_pad, 8, 2), np.float32)
    Xl_p[:12] = xl
    xz_d, _, st_d = vdata.normalize_on_device(
        jnp.asarray(Xm_p), jnp.asarray(Xl_p), 12)
    assert float(st_d["median"][1]) == 0.0
    assert float(st_d["mean"][1]) == 0.0
    assert float(st_d["std"][1]) == 1.0
    np.testing.assert_allclose(np.asarray(xz_d)[:12], xz_h,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xz_d)[:12, :, 1], 0.0)
