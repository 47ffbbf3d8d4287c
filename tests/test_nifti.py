"""NIfTI-1 I/O tests: roundtrip, gzip, 4D, affines, dtype handling."""

import gzip
import struct

import numpy as np
import pytest

from subcort_tpu.io import NiftiImage, load_nii, save_nii


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_roundtrip_3d(tmp_path, rng, suffix, dtype):
    data = (rng.random((17, 23, 9)) * 100).astype(dtype)
    path = str(tmp_path / f"vol{suffix}")
    save_nii(NiftiImage(data), path)
    img = load_nii(path)
    np.testing.assert_array_equal(img.data, data)
    assert img.data.dtype == dtype
    np.testing.assert_allclose(img.affine, np.eye(4))


def test_roundtrip_4d_prior_volume(tmp_path, rng):
    """15-channel prior atlas volumes are 4D (base.py:529)."""
    data = rng.random((12, 10, 8, 15)).astype(np.float32)
    path = str(tmp_path / "MNI_sub_probabilities.nii.gz")
    save_nii(NiftiImage(data), path)
    img = load_nii(path)
    assert img.shape == (12, 10, 8, 15)
    np.testing.assert_array_equal(img.data, data)


def test_affine_preserved(tmp_path, rng):
    affine = np.array([[-1.0, 0, 0, 90.0],
                       [0, 1.2, 0, -126.0],
                       [0, 0, 1.0, -72.0],
                       [0, 0, 0, 1.0]])
    data = rng.random((5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "aff.nii.gz")
    save_nii(NiftiImage(data, affine), path)
    img = load_nii(path)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)


def test_fortran_order_on_disk(tmp_path):
    """NIfTI voxel data is x-fastest: byte order on disk must be Fortran."""
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "f.nii")
    save_nii(NiftiImage(data), path)
    with open(path, "rb") as fh:
        raw = fh.read()
    vox = np.frombuffer(raw, dtype=np.int16, offset=352)
    np.testing.assert_array_equal(vox, data.ravel(order="F"))


def test_scl_slope_applied(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = str(tmp_path / "scl.nii")
    save_nii(NiftiImage(data), path)
    with open(path, "rb") as fh:
        raw = bytearray(fh.read())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 1.0)   # scl_inter
    with open(path, "wb") as fh:
        fh.write(raw)
    img = load_nii(path)
    np.testing.assert_allclose(img.data, data.astype(np.float32) * 2 + 1)


def test_bool_saved_as_uint8(tmp_path):
    """binary masks (e.g. MNI_subcortical_mask) must be writable."""
    data = np.zeros((4, 4, 4), dtype=bool)
    data[1:3, 1:3, 1:3] = True
    path = str(tmp_path / "mask.nii.gz")
    save_nii(NiftiImage(data), path)
    img = load_nii(path)
    np.testing.assert_array_equal(img.data.astype(bool), data)


def test_gzip_file_is_actually_gzipped(tmp_path, rng):
    path = str(tmp_path / "z.nii.gz")
    save_nii(NiftiImage(rng.random((4, 4, 4)).astype(np.float32)), path)
    with open(path, "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"
    with gzip.open(path, "rb") as fh:
        assert struct.unpack("<i", fh.read(4))[0] == 348


def test_nibabel_compat_surface(tmp_path, rng):
    img = NiftiImage(rng.random((3, 3, 3)).astype(np.float32))
    assert img.get_data() is img.data
    assert img.shape == (3, 3, 3)
    img.to_filename(str(tmp_path / "c.nii.gz"))
    assert (tmp_path / "c.nii.gz").exists()


def test_big_endian_read(tmp_path):
    """Legacy big-endian NIfTI-1 files must read correctly."""
    data = np.arange(2 * 3 * 2, dtype=">i2").reshape(2, 3, 2)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 3, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)      # int16
    struct.pack_into(">h", hdr, 72, 16)     # bitpix
    struct.pack_into(">8f", hdr, 76, 1, 1, 1, 1, 0, 0, 0, 0)
    struct.pack_into(">f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    path = str(tmp_path / "be.nii")
    with open(path, "wb") as fh:
        fh.write(bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F"))
    img = load_nii(path)
    np.testing.assert_array_equal(img.data, data.astype(np.int16))


@pytest.mark.parametrize("member", ["hdr", "img"])
@pytest.mark.parametrize("gz", ["", ".gz"])
def test_hdr_img_pair_roundtrip(tmp_path, rng, member, gz):
    """Two-file NIfTI-1 pairs (the other storage form nibabel reads) load
    identically whichever member is named, plain or gzipped."""
    affine = np.diag([1.0, 1.2, 3.0, 1.0])
    affine[:3, 3] = (-90.0, -126.0, -72.0)
    data = (rng.random((9, 7, 5)) * 200).astype(np.int16)
    save_nii(NiftiImage(data, affine), str(tmp_path / f"pair.{member}{gz}"))
    assert (tmp_path / f"pair.hdr{gz}").exists()
    assert (tmp_path / f"pair.img{gz}").exists()
    for name in (f"pair.hdr{gz}", f"pair.img{gz}"):
        img = load_nii(str(tmp_path / name))
        np.testing.assert_array_equal(img.data, data)
        assert img.data.dtype == np.int16
        np.testing.assert_allclose(img.affine, affine, atol=1e-5)
    # pair headers carry the "ni1" magic and vox_offset 0
    opener = gzip.open if gz else open
    with opener(str(tmp_path / f"pair.hdr{gz}"), "rb") as fh:
        hdr = fh.read()
    assert hdr[344:348] == b"ni1\x00"
    assert struct.unpack_from("<f", hdr, 108)[0] == 0.0
    with opener(str(tmp_path / f"pair.img{gz}"), "rb") as fh:
        vox = np.frombuffer(fh.read(), dtype=np.int16)
    np.testing.assert_array_equal(vox, data.ravel(order="F"))


def test_hdr_img_pair_uppercase(tmp_path, rng):
    """Legacy ANALYZE/SPM datasets are often all-uppercase SCAN.HDR/SCAN.IMG.
    save_nii must create the exact path the caller passed (sibling in the
    same case style) and load_nii must find the uppercase sibling."""
    data = (rng.random((6, 5, 4)) * 100).astype(np.int16)
    save_nii(NiftiImage(data), str(tmp_path / "SCAN.IMG"))
    assert (tmp_path / "SCAN.IMG").exists()
    assert (tmp_path / "SCAN.HDR").exists()
    for name in ("SCAN.IMG", "SCAN.HDR"):
        img = load_nii(str(tmp_path / name))
        np.testing.assert_array_equal(img.data, data)
    # mixed case across the pair: uppercase member named, lowercase sibling
    (tmp_path / "SCAN.HDR").rename(tmp_path / "scan2.hdr")
    (tmp_path / "SCAN.IMG").rename(tmp_path / "scan2.IMG")
    img = load_nii(str(tmp_path / "scan2.IMG"))
    np.testing.assert_array_equal(img.data, data)


def test_hdr_img_pair_mixed_case_sibling(tmp_path, rng):
    """Uppercase sibling style requires a FULLY uppercase extension: a
    mixed-case name like scan.Img gets a lowercase .hdr sibling. Pinned
    because the C++ runtime (native/src/nifti.hpp) applies the same rule —
    both runtimes must produce identical file sets from the same argument."""
    data = (rng.random((4, 4, 3)) * 100).astype(np.int16)
    save_nii(NiftiImage(data), str(tmp_path / "scan.Img"))
    assert (tmp_path / "scan.Img").exists()
    assert (tmp_path / "scan.hdr").exists()
    assert not (tmp_path / "scan.HDR").exists()
    img = load_nii(str(tmp_path / "scan.Img"))
    np.testing.assert_array_equal(img.data, data)


def test_hdr_img_pair_mixed_compression(tmp_path, rng):
    """nibabel tolerates e.g. plain .hdr next to gzipped .img — so do we."""
    data = (rng.random((4, 5, 6)) * 50).astype(np.float32)
    save_nii(NiftiImage(data), str(tmp_path / "mix.hdr"))
    (tmp_path / "mix.img").rename(tmp_path / "mix.img.tmp")
    with open(str(tmp_path / "mix.img.tmp"), "rb") as src, \
            gzip.open(str(tmp_path / "mix.img.gz"), "wb") as dst:
        dst.write(src.read())
    (tmp_path / "mix.img.tmp").unlink()
    img = load_nii(str(tmp_path / "mix.hdr"))
    np.testing.assert_array_equal(img.data, data)


def test_hdr_pair_missing_img_raises(tmp_path, rng):
    save_nii(NiftiImage(np.zeros((2, 2, 2), np.uint8)),
             str(tmp_path / "lone.hdr"))
    (tmp_path / "lone.img").unlink()
    with pytest.raises(FileNotFoundError):
        load_nii(str(tmp_path / "lone.hdr"))


def test_reject_non_nifti(tmp_path):
    path = str(tmp_path / "junk.nii")
    with open(path, "wb") as fh:
        fh.write(b"\x00" * 400)
    with pytest.raises(ValueError):
        load_nii(path)


def test_reject_truncated(tmp_path):
    path = str(tmp_path / "short.nii")
    with open(path, "wb") as fh:
        fh.write(b"\x01" * 40)
    with pytest.raises(ValueError):
        load_nii(path)
