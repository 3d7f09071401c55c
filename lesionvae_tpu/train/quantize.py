"""uint16 fixed-point upload path for the fleet's RAW tensors (opt-in).

Measured basis: the remote-attached bench chip moves H2D at 7-40 MB/s and
the fleet's raw f32 tensors are ~400 MB of the ~600 MB a full run ships
(BENCH logs; the link, not compute, bounds the geometry+fleet wall-clock).
The raw blocks are consumed by the ON-DEVICE normalization
(train.data.normalize_on_device) whose output is z-scored and clamped, so
the upload only needs enough precision to keep z-scores stable — uint16
fixed-point per (member, feature) gives ~1.5e-5 relative range precision
(65533 levels), shifting z-scores by ~1e-4 worst-case, far inside the
fleet's distributional-parity bands, while HALVING the dominant transfer.

Encoding: per (member, feature) affine code = rint((x - lo) / scale) with
lo/hi from the finite values; non-finite values map to reserved sentinel
codes so the device-side median-imputation sees them exactly like f32:
  0xFFFF -> NaN   0xFFFE -> +inf   0xFFFD -> -inf   values <= 0xFFFC.

Opt-in via launch_many_vaes(quantize_upload=True) (requires
normalize_on_device) / bench BENCH_FLEET_UPLOAD=u16; parity pinned in
tests/test_quantize_upload.py (roundtrip precision, sentinel handling,
end-to-end curve + z-score band vs the f32 upload).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..utils.logging import get_logger

log = get_logger("quantize")

SENT_NAN = 0xFFFF
SENT_PINF = 0xFFFE
SENT_NINF = 0xFFFD
MAX_CODE = 0xFFFC

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libquantize.so"
_lib = None
_lib_tried = False


def _load():
    """Native single-pass quantizer (native/quantize.cpp): the numpy path
    costs ~2.2 s idle but ~25 s when the tunnel agent is streaming bytes on
    the same single core (measured in-bench); the C kernel has ~10x less
    memory traffic and exposure.  Auto-builds with make; numpy fallback."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "libquantize.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.quant_u16.restype = ctypes.c_int
        lib.quant_u16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as e:  # missing toolchain -> numpy fallback
        log.info("native quantizer unavailable (%s); using numpy", e)
    return _lib


def _quantize_native(X: np.ndarray
                     ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, np.float32)
    T, n, L, C = X.shape
    codes = np.empty((T, n, L, C), np.uint16)
    lo = np.empty((T, C), np.float32)
    scale = np.empty((T, C), np.float32)
    rc = lib.quant_u16(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, n, L, C,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return codes, lo.reshape(T, 1, 1, C), scale.reshape(T, 1, 1, C)


def quantize_u16(X: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize a (T, n, L, C) f32 block to uint16 codes.

    Returns ``(codes (T,n,L,C) u16, lo (T,1,1,C) f32, scale (T,1,1,C) f32)``
    with per-(member, feature) affine ranges over the FINITE values.
    Constant and all-non-finite features get scale 0 (codes decode to lo).
    """
    X = np.asarray(X, np.float32)
    native = _quantize_native(X)
    if native is not None:
        return native
    # fast path (typical: synthetic/complete profiles are all-finite): plain
    # min/max detect any non-finite value by propagating it, and the code
    # pass fuses round-half-up into the uint16 cast — ~3 array passes on the
    # 1-core bench host instead of the masked path's ~6 (the host quantize
    # cost sits inside the timed fleet-enqueue window)
    lo = np.min(X, axis=(1, 2), keepdims=True)
    hi = np.max(X, axis=(1, 2), keepdims=True)
    if np.isfinite(lo).all() and np.isfinite(hi).all():
        scale = ((hi - lo) / MAX_CODE).astype(np.float32)
        inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0),
                       0.0).astype(np.float32)
        # values are in [lo, hi] by construction; +0.5 then truncate is
        # round-half-up and cannot exceed MAX_CODE + 0.5 -> fits uint16
        codes = ((X - lo) * inv + np.float32(0.5)).astype(np.uint16)
        np.minimum(codes, np.uint16(MAX_CODE), out=codes)  # fp-edge guard
        return codes, lo.astype(np.float32), scale
    # non-finite values present: range over the FINITE values only (like
    # the native kernel — zero-filling before min/max would silently widen
    # the range to include 0 and inflate the quantization step by orders of
    # magnitude for features bounded away from 0), then patch sentinel
    # codes sparsely
    fin = np.isfinite(X)
    masked = np.where(fin, X, np.nan)
    with np.errstate(invalid="ignore"):
        lo = np.nanmin(masked, axis=(1, 2), keepdims=True)
        hi = np.nanmax(masked, axis=(1, 2), keepdims=True)
    lo = np.nan_to_num(lo, nan=0.0).astype(np.float32)
    hi = np.nan_to_num(hi, nan=0.0).astype(np.float32)
    scale = ((hi - lo) / MAX_CODE).astype(np.float32)
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0),
                   0.0).astype(np.float32)
    Xc = np.where(fin, X, lo)       # bad entries: code 0, overwritten below
    codes = ((Xc - lo) * inv + np.float32(0.5)).astype(np.uint16)
    np.minimum(codes, np.uint16(MAX_CODE), out=codes)
    bad = np.nonzero(~fin)
    vals = X[bad]
    codes[bad] = np.where(np.isnan(vals), np.uint16(SENT_NAN),
                          np.where(vals > 0, np.uint16(SENT_PINF),
                                   np.uint16(SENT_NINF)))
    return codes, lo, scale


def dequantize_u16(codes, lo, scale):
    """Traceable inverse for ONE member: codes (n, L, C) u16 with
    lo/scale (1, 1, C) -> f32 with sentinels restored."""
    import jax.numpy as jnp

    x = lo + codes.astype(jnp.float32) * scale
    x = jnp.where(codes == SENT_NAN, jnp.nan, x)
    x = jnp.where(codes == SENT_PINF, jnp.inf, x)
    x = jnp.where(codes == SENT_NINF, -jnp.inf, x)
    return x
