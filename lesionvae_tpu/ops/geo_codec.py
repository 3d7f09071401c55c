"""u16 delta codec for the geometry point upload (opt-in).

Measured basis (benchmarks/geo_codec_probe.py on the full bench cohort):
the padded f32 point blocks are the geometry stage's wire cost — 141.6 MB
at a 7-40 MB/s link.  Encoding each streamline as (exact f32 first point,
u16 forward-difference codes with per-(streamline, axis) affine range)
ships 0.55x the bytes at ~3-8 nm per-delta resolution; decoded-metric
shifts are p99 <= 3e-4 for every column EXCEPT torsion (ill-conditioned:
tau = (b.db)/|b|^2 amplifies delta noise without bound as |b| -> 0 —
measured p99 4.9e-3 / max 0.55 vs the f32 path's 2.7e-6 / 1e-4, and a
device-computable fragility certificate was measured useless: catching the
bad rows flags 99.8% of ALL rows).  Torsion therefore comes from the host:
``torsion_f64`` evaluates the reference formula (tract_geom_proc.py:85-96)
in f64 on the ORIGINAL f32 points — numerically BETTER than the f32 device
value it replaces — and the pipeline overwrites the device torsion column.
The eigen inf-gate needs no extra handling: the f32 certificate + host f64
refinement (ops.geometry) flagged the same 78 rows with and without the
codec on the probe cohort.

Both host kernels are native C++ (native/geo_codec.cpp — the numpy encode
costs 1.2-2.4 s and numpy f64 torsion ~5 s on the contended 1-core bench
host); numpy fallbacks keep the path working without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Tuple

import numpy as np

from ..utils.logging import get_logger

log = get_logger("geo_codec")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgeocodec.so"
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "libgeocodec.so"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.geo_encode_u16.restype = ctypes.c_int
        lib.geo_encode_u16.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, i32p,
            ctypes.POINTER(ctypes.c_uint16), f32p, f32p, f32p]
        lib.geo_torsion_f64.restype = ctypes.c_int
        lib.geo_torsion_f64.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, i32p,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception as e:  # missing toolchain -> numpy fallbacks
        log.info("native geo codec unavailable (%s); using numpy", e)
    return _lib


def encode_u16_delta(pts: np.ndarray, lens: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """(S, P, 3) f32 points -> (codes u16 (S, P-1, 3), p0, lo, sc f32 (S, 3)).

    Wire bytes: 2 per padded delta component + 36 per streamline, 0.55x of
    the f32 block on the bench cohort."""
    pts = np.ascontiguousarray(pts, np.float32)
    lens32 = np.ascontiguousarray(lens, np.int32)
    S, P, _ = pts.shape
    lib = _load()
    if lib is not None:
        codes = np.empty((S, P - 1, 3), np.uint16)
        p0 = np.empty((S, 3), np.float32)
        lo = np.empty((S, 3), np.float32)
        sc = np.empty((S, 3), np.float32)
        rc = lib.geo_encode_u16(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), S, P,
            lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            p0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return codes, p0, lo, sc
    # numpy fallback (same semantics)
    d = np.diff(pts, axis=1)
    seg = np.arange(P - 1)[None, :] < (lens32[:, None] - 1)
    dm = np.where(seg[..., None], d, np.nan)
    with np.errstate(all="ignore"):
        lo = np.nan_to_num(np.nanmin(dm, axis=1), nan=0.0)
        hi = np.nan_to_num(np.nanmax(dm, axis=1), nan=0.0)
    sc = (hi - lo) / np.float32(65535.0)
    sc = np.where(sc > 0, sc, 1.0).astype(np.float32)
    codes = np.clip(np.rint((d - lo[:, None, :]) / sc[:, None, :]),
                    0, 65535).astype(np.uint16)
    codes[~seg] = 0
    return codes, pts[:, 0].copy(), lo.astype(np.float32), sc


def torsion_f64(pts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Reference-exact f64 ``torsion_mean`` per streamline
    (tract_geom_proc.py:85-96) from the original f32 points."""
    pts = np.ascontiguousarray(pts, np.float32)
    lens32 = np.ascontiguousarray(lens, np.int32)
    S, P, _ = pts.shape
    lib = _load()
    if lib is not None:
        out = np.empty(S, np.float64)
        rc = lib.geo_torsion_f64(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), S, P,
            lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc == 0:
            return out
    out = np.zeros(S, np.float64)
    for s in range(S):  # numpy fallback: per-row reference formula
        n = int(lens32[s])
        if n < 4:
            continue
        x = pts[s, :n].astype(np.float64)
        v = np.gradient(x, axis=0)
        a = np.gradient(v, axis=0)
        b = np.cross(v, a)
        db = np.gradient(b, axis=0)
        tau = np.einsum("ij,ij->i", b, db) / (
            np.einsum("ij,ij->i", b, b) + 1e-12)
        tau = tau[np.isfinite(tau)]
        out[s] = tau.mean() if tau.size else 0.0
    return out


def decode_points(codes, p0, lo, sc, lengths):
    """Device-side decode: x = concat([p0, p0 + cumsum(masked deltas)]).

    Traced inside the geometry program (jax.numpy); pad deltas decode to
    zero so pad points repeat the last real point — the metrics kernel
    masks them anyway."""
    import jax.numpy as jnp

    PD = codes.shape[1]
    d = lo[:, None, :] + codes.astype(jnp.float32) * sc[:, None, :]
    seg = jnp.arange(PD)[None, :] < (lengths[:, None] - 1)
    d = jnp.where(seg[..., None], d, 0.0)
    x = p0[:, None, :] + jnp.cumsum(d, axis=1)
    return jnp.concatenate([p0[:, None, :], x], axis=1)
