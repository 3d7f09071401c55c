"""VTK parser robustness: malformed inputs must raise cleanly (not crash or
hang), and native/Python parsers must agree on every well-formed file."""

import numpy as np
import pytest

from lesionvae_tpu.io import vtk, vtk_native


def _roundtrip_both(tmp_path, bundle, binary):
    p = tmp_path / "f.vtk"
    vtk.write_vtk_polylines(p, bundle, binary=binary)
    data = p.read_bytes()
    native = vtk_native.parse_polydata(data)
    # force the python path
    saved, vtk_native._lib = vtk_native._lib, None
    vtk_native._tried = True
    try:
        py = vtk.read_vtk_polydata(p)
    finally:
        vtk_native._lib = saved
    return native, py


@pytest.mark.parametrize("binary", [False, True])
def test_native_matches_python_fuzz(tmp_path, rng, binary):
    if not vtk_native.available():
        pytest.skip("native parser unavailable")
    for trial in range(5):
        bundle = [rng.normal(size=(int(rng.integers(3, 40)), 3)) * 100
                  for _ in range(int(rng.integers(1, 20)))]
        native, py = _roundtrip_both(tmp_path, bundle, binary)
        assert native is not None
        np.testing.assert_allclose(native[0], py[0], rtol=1e-6)
        np.testing.assert_array_equal(native[1], py[1])
        np.testing.assert_array_equal(native[2], py[2])


@pytest.mark.parametrize("payload", [
    b"",                                          # empty
    b"not a vtk file at all\n",                   # wrong header
    b"# vtk DataFile Version 3.0\nt\nASCII\nDATASET STRUCTURED_GRID\n",
    b"# vtk DataFile Version 3.0\nt\nEBCDIC\nDATASET POLYDATA\n",
    b"# vtk DataFile Version 3.0\nt\nASCII\nDATASET POLYDATA\n"
    b"POINTS 5 float\n1 2 3\n",                   # truncated points
])
def test_malformed_inputs_raise(tmp_path, payload):
    p = tmp_path / "bad.vtk"
    p.write_bytes(payload)
    with pytest.raises((ValueError, IndexError)):
        vtk.read_vtk_polydata(p)


def test_points_only_no_lines(tmp_path):
    p = tmp_path / "pts.vtk"
    p.write_text("# vtk DataFile Version 3.0\nt\nASCII\nDATASET POLYDATA\n"
                 "POINTS 2 float\n0 0 0\n1 1 1\n")
    pts, offs, conn = vtk.read_vtk_polydata(p)
    assert pts.shape == (2, 3)
    assert vtk.read_streamlines(p) == []


@pytest.mark.parametrize("payload", [
    # hostile declared counts: must raise, not bad_alloc/terminate the process
    b"# vtk DataFile Version 3.0\nt\nASCII\nDATASET POLYDATA\n"
    b"POINTS 999999999999999 float\n1 2 3\n",
    b"# vtk DataFile Version 3.0\nt\nBINARY\nDATASET POLYDATA\n"
    b"POINTS 999999999999999 float\n\x00\x00\x00\x00",
    # count*elem_size wraps size_t (2^61 * 8 == 0 mod 2^64)
    b"# vtk DataFile Version 3.0\nt\nBINARY\nDATASET POLYDATA\n"
    b"POINTS 2305843009213693952 double\n\x00",
    # negative cell size in the v4 packed layout
    b"# vtk DataFile Version 3.0\nt\nASCII\nDATASET POLYDATA\n"
    b"POINTS 1 float\n0 0 0\nLINES 1 2\n-5 0\n",
])
def test_hostile_counts_raise_both_parsers(tmp_path, payload):
    p = tmp_path / "hostile.vtk"
    p.write_bytes(payload)
    if vtk_native.available():
        with pytest.raises(ValueError):
            vtk_native.parse_polydata(payload)
    saved, vtk_native._lib = vtk_native._lib, None
    vtk_native._tried = True
    try:
        with pytest.raises((ValueError, OverflowError)):
            vtk.read_vtk_polydata(p)
    finally:
        vtk_native._lib = saved


def test_truncated_ascii_python_path_raises(tmp_path):
    """The pure-Python tokenizer must raise on truncated ASCII input rather
    than spin forever at EOF (the native parser must not shadow this path)."""
    p = tmp_path / "trunc.vtk"
    p.write_bytes(b"# vtk DataFile Version 3.0\nt\nASCII\nDATASET POLYDATA\n"
                  b"POINTS 5 float\n1 2 3\n")
    saved, vtk_native._lib = vtk_native._lib, None
    vtk_native._tried = True
    try:
        with pytest.raises(ValueError):
            vtk.read_vtk_polydata(p)
    finally:
        vtk_native._lib = saved


def test_out_of_range_indices_rejected(tmp_path):
    """Connectivity pointing past POINTS must not segfault/garbage — the
    reader slices points[idx]; numpy raises IndexError for OOB."""
    p = tmp_path / "oob.vtk"
    p.write_text("# vtk DataFile Version 3.0\nt\nASCII\nDATASET POLYDATA\n"
                 "POINTS 3 float\n0 0 0\n1 1 1\n2 2 2\n"
                 "LINES 1 4\n3 0 1 99\n")
    with pytest.raises(IndexError):
        vtk.read_streamlines(p)
