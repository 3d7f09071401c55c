"""The bench's fast tensor path must equal the production tensor builder.

bench.fast_profile_tensors reads each per-subject profile CSV once and
slices per-tract tensors; the production path is one
build_tensor_with_lesion_context call per (tract, timepoint)
(train/data.py, reference: src/vae/data_loader.py:27-148).  If they ever
diverge, the bench times a different computation than the pipeline ships —
this test pins them together (raw tensors, subject/group metadata, and the
normalized result)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lesionvae_tpu.io import synth
from lesionvae_tpu.io.synth import tiny_config
from lesionvae_tpu.train import data as vdata


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("benchpath")
    cfg = tiny_config(n_per_group=2, tracts=["atr_left", "fimbria_right"])
    synth.generate_cohort(root, cfg, seed=21, n_streamlines=5,
                          volume_shape=(16, 16, 16), with_profiles=True)
    return root, cfg


def test_fast_profile_tensors_matches_builder(cohort):
    import bench

    root, cfg = cohort
    tensor_list, n_subj = bench.fast_profile_tensors(root, cfg)
    groups_dict = {g: list(s) for g, s in cfg.subjects_by_group().items()}
    subjects = [s for subs in groups_dict.values() for s in subs]
    assert n_subj == len(subjects)

    fast = {key: (xm, xl, sham, subj)
            for key, xm, xl, sham, subj in tensor_list}
    assert len(fast) == 2 * len(cfg.timepoints)

    for tract in cfg.geometry_tracts:
        for tp in cfg.timepoints:
            Xm, Xl, subj_ids, group_labels, _s = \
                vdata.build_tensor_with_lesion_context(
                    root, tract, tp, subjects,
                    cfg.microstructure_features, cfg.lesion_features,
                    groups_dict)
            xm_f, xl_f, sham_f, subj_f = fast[(tract, tp)]
            np.testing.assert_allclose(xm_f, Xm, rtol=1e-6, atol=1e-7,
                                       err_msg=f"{tract}@{tp} micro")
            np.testing.assert_allclose(xl_f, Xl, rtol=1e-6, atol=1e-7,
                                       err_msg=f"{tract}@{tp} lesion")
            np.testing.assert_array_equal(sham_f, group_labels == "Sham")
            # fast path uses dense subject indices in cohort enumeration
            # order; map back to ids and compare
            order = {}
            for g, sids in cfg.subjects_by_group().items():
                for sid in sids:
                    order.setdefault(sid, len(order))
            np.testing.assert_array_equal(
                subj_f, np.asarray([order[s] for s in subj_ids]))

            # and the normalized tensors (what the fleet actually trains on)
            st_a = vdata.fit_normalization_stats(
                xm_f, xl_f, cfg.microstructure_features)
            st_b = vdata.fit_normalization_stats(
                Xm, Xl, cfg.microstructure_features)
            for k in st_a:
                np.testing.assert_allclose(st_a[k], st_b[k], rtol=1e-6)
            za, la = vdata.apply_normalization(xm_f, xl_f, st_a)
            zb, lb = vdata.apply_normalization(Xm, Xl, st_b)
            np.testing.assert_allclose(za, zb, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)


def test_fast_profile_tensors_fallback_paths(cohort, monkeypatch):
    """The pyarrow and pandas fallbacks must produce the same tensors as
    the native parser (the bench must stay correct on hosts without the
    native lib or pyarrow)."""
    import bench
    from lesionvae_tpu.io import profiles_native

    root, cfg = cohort
    ref, n_ref = bench.fast_profile_tensors(root, cfg)

    monkeypatch.setattr(profiles_native, "available", lambda: False)
    pa_list, n_pa = bench.fast_profile_tensors(root, cfg)

    import pyarrow
    real_import = __builtins__["__import__"] if isinstance(
        __builtins__, dict) else __builtins__.__import__

    def no_pyarrow(name, *a, **k):
        if name.startswith("pyarrow"):
            raise ImportError("forced")
        return real_import(name, *a, **k)

    monkeypatch.setattr("builtins.__import__", no_pyarrow)
    pd_list, n_pd = bench.fast_profile_tensors(root, cfg)

    assert n_ref == n_pa == n_pd
    for (k1, *a), (k2, *b), (k3, *c) in zip(ref, pa_list, pd_list):
        assert k1 == k2 == k3
        for x, y, z in zip(a, b, c):
            # BIT-exact: the native parser computes the correctly rounded
            # float64 (Clinger fast path / strtod fallback) then casts to
            # float32 — the same two steps pandas and pyarrow take — so
            # cached tensor blocks are interchangeable across readers
            np.testing.assert_array_equal(y, x)
            np.testing.assert_array_equal(z, x)


def test_stream_blocks_match_batch(cohort):
    """The streaming pipeline's timepoint-major generator must produce the
    SAME member tensors as the batch builder (bench BENCH_PIPE=stream) —
    only the grouping differs."""
    import bench

    root, cfg = cohort
    batch_list, n_subj = bench.fast_profile_tensors(root, cfg)
    by_key = {k: rest for k, *rest in batch_list}

    seen = []
    for tp, members in bench.stream_profile_blocks(root, cfg):
        for k, *rest in members:
            assert k[1] == tp
            seen.append(k)
            for x, y in zip(rest, by_key[k]):
                np.testing.assert_array_equal(x, y)
    assert sorted(seen) == sorted(by_key)
    assert len(bench._subject_index(cfg)) == n_subj
