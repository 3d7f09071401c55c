"""Extra NIfTI paths: qform affine, pixdim fallback, FA brain-volume
fallback, dtype coverage."""

import gzip
import struct

import numpy as np

from lesionvae_tpu.io import nifti
from lesionvae_tpu.ops import volume as vol


def _write_with_qform(path, data, quat, offsets, pixdim):
    """Write a NIfTI then patch it to carry only a qform (no sform)."""
    nifti.save(path, data, np.eye(4))
    raw = bytearray(gzip.decompress(path.read_bytes())
                    if path.suffix == ".gz" else path.read_bytes())
    struct.pack_into("<8f", raw, 76, 1.0, *pixdim, *([1.0] * (7 - 3)))
    struct.pack_into("<h", raw, 252, 1)      # qform_code = 1
    struct.pack_into("<h", raw, 254, 0)      # sform_code = 0
    struct.pack_into("<6f", raw, 256, *quat, *offsets)
    body = bytes(raw)
    if path.suffix == ".gz":
        path.write_bytes(gzip.compress(body))
    else:
        path.write_bytes(body)


def test_qform_identity_quaternion(tmp_path):
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    p = tmp_path / "q.nii"
    _write_with_qform(p, data, quat=(0.0, 0.0, 0.0), offsets=(1.0, 2.0, 3.0),
                      pixdim=(2.0, 3.0, 4.0))
    img = nifti.load(p)
    want = np.diag([2.0, 3.0, 4.0, 1.0])
    want[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(img.affine, want, atol=1e-6)
    np.testing.assert_allclose(img.get_fdata(), data)


def test_qform_rotation_quaternion(tmp_path):
    # quaternion (a=0, b=1, c=0, d=0): 180° rotation about x
    data = np.zeros((2, 2, 2), np.float32)
    p = tmp_path / "r.nii"
    _write_with_qform(p, data, quat=(1.0, 0.0, 0.0), offsets=(0.0, 0.0, 0.0),
                      pixdim=(1.0, 1.0, 1.0))
    img = nifti.load(p)
    want_R = np.diag([1.0, -1.0, -1.0])
    np.testing.assert_allclose(img.affine[:3, :3], want_R, atol=1e-6)


def test_dtype_coverage(tmp_path):
    for dtype in (np.uint8, np.int16, np.int32, np.float64):
        data = (np.arange(8).reshape(2, 2, 2) % 3).astype(dtype)
        p = tmp_path / f"d_{dtype.__name__}.nii.gz"
        nifti.save(p, data, np.eye(4))
        img = nifti.load(p)
        np.testing.assert_allclose(img.get_fdata(), data.astype(np.float64))


def test_brain_volume_fa_fallback(tmp_path):
    """No tissue.nii.gz → FA>0.1 with erosion+dilation cleanup
    (lesion_sh_heme_comprehensive.py:243-255)."""
    from scipy import ndimage

    d = tmp_path / "s1" / "9d"
    fa = np.zeros((16, 16, 16), np.float32)
    fa[4:12, 4:12, 4:12] = 0.5
    affine = np.diag([2.0, 1.0, 1.0, 1.0])
    nifti.save(d / "dti_FA.nii.gz", fa, affine)
    got = vol.compute_brain_volume("s1", "9d", tmp_path)
    mask = ndimage.binary_dilation(
        ndimage.binary_erosion(fa > 0.1, iterations=1), iterations=1)
    np.testing.assert_allclose(got, mask.sum() * 2.0)


def test_brain_volume_missing_everything(tmp_path):
    assert vol.compute_brain_volume("nope", "9d", tmp_path) is None
