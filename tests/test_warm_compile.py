"""warm_compile launches: the upload-free warmup must be SAFE, not correct.

The bench's cold-start pass (bench.py BENCH_WARM_MODE=compile) replaces the
big H2D blocks with tiny patterns tiled/broadcast on device at the exact
production avals.  Results are garbage by design — what these tests pin is
the safety contract that makes a garbage-data warmup runnable at cohort
scale:
- the programs execute end-to-end without raising;
- fleet outputs the callers touch (hist, normative magnitudes) come back
  finite and correctly shaped — the stream pipeline asserts on them even
  during warmup;
- the geometry warm launch produces valid (nonzero-streamline) summaries
  and NEVER routes rows into the host f64 eigen-refine loop (a zeros
  pattern would flag every row and turn the warmup into minutes of host
  work — the reason the pattern is a full-rank helix).
"""

import numpy as np
import pytest

from lesionvae_tpu.pipeline.geometry_run import launch_bundle_metrics
from lesionvae_tpu.train.batched import launch_many_vaes


def _bundles(seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for n_sl in (3, 5):
        out.append([rng.normal(size=(int(p), 3)).astype(np.float32) * 5.0
                    for p in rng.integers(8, 60, size=n_sl)])
    return out


@pytest.mark.parametrize("quantize", [False, True])
def test_fleet_warm_compile_safe(quantize):
    T, n, L, cm, cl = 3, 32, 8, 3, 2
    rng = np.random.default_rng(1)
    Xm = rng.normal(size=(T, n, L, cm)).astype(np.float32)
    Xl = rng.uniform(size=(T, n, L, cl)).astype(np.float32)
    n_real = np.array([n, n - 5, n - 2], np.int32)
    sham = np.zeros((T, n), np.float32)
    sham[:, :4] = 1.0
    subj = np.tile(np.arange(n, dtype=np.int32) % 3, (T, 1))
    h = launch_many_vaes(Xm, Xl, n_real, latent_dim=2, epochs=2,
                         batch_size=16, seed=11,
                         summary_spec=(sham, subj, 3, 7),
                         normalize_on_device=True, quantize_upload=quantize,
                         warm_compile=True)
    hist = np.asarray(h.hist_T)
    assert hist.shape == (T, 2, 4) and np.isfinite(hist).all()
    # the stream pipeline asserts on these during the warm pass
    _m, _s, mag, prof, _cnt = [np.asarray(x) for x in h.summary_T]
    assert mag.shape[0] == T and np.isfinite(mag).all()
    assert prof.shape[0] == T


@pytest.mark.parametrize("upload", ["f32", "u16d"])
def test_geometry_warm_compile_safe(upload, caplog):
    import logging
    bundles = _bundles()
    with caplog.at_level(logging.INFO, logger="lesionvae_tpu.geometry"):
        finish = launch_bundle_metrics(bundles, upload=upload,
                                       warm_compile=True)
        summaries = finish()
    assert len(summaries) == len(bundles)
    # helix rows are valid streamlines (nonzero arc length) ...
    assert all(s["n_streamlines"] > 0 for s in summaries)
    # ... and the helix covariance is full-rank: the host f64 refine loop
    # (minutes at cohort scale if a degenerate pattern flagged every row)
    # must stay EMPTY
    assert not any("refined" in r.message for r in caplog.records)


def test_geometry_warm_matches_real_program_shapes():
    """Warm launches must enqueue the same chunk shapes as real launches
    (that is the whole point: the jit cache they populate is keyed on the
    input avals)."""
    bundles = _bundles()
    real = launch_bundle_metrics(bundles, upload="f32")
    warm = launch_bundle_metrics(bundles, upload="f32", warm_compile=True)
    rs = [s["n_streamlines"] for s in real()]
    ws = [s["n_streamlines"] for s in warm()]
    assert len(rs) == len(ws)
