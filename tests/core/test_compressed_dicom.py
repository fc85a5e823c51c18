"""Compressed DICOM transfer syntaxes: RLE Lossless + JPEG Lossless.

The reference reads compressed clinical exports via pydicom
(``/root/reference/pylinac/core/image.py:1369``); these tests pin our own
codec round trips (``core/compressed_px``), the encapsulated Part-10
read/write path, and that ``image.load`` consumes compressed files
transparently.
"""

import io

import numpy as np
import pytest

from pylinac_tpu.core import compressed_px as cpx
from pylinac_tpu.core import dcm
from pylinac_tpu.core.array_utils import array_to_dicom


def _ct_like(shape=(128, 160), seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    disk = ((yy - shape[0] / 2) ** 2 + (xx - shape[1] / 2) ** 2
            < (shape[0] / 3) ** 2)
    return (1000 + 800 * disk + rng.integers(0, 20, shape)).astype(np.uint16)


# -- codec round trips -------------------------------------------------------
def test_rle_roundtrip_16bit():
    img = _ct_like()
    frag = cpx.rle_encode_frame(img)
    out = cpx.rle_decode_frame(frag, *img.shape, 16)
    assert np.array_equal(out, img)


def test_rle_roundtrip_8bit():
    img = (_ct_like() >> 4).astype(np.uint8)
    out = cpx.rle_decode_frame(cpx.rle_encode_frame(img), *img.shape, 8)
    assert np.array_equal(out, img)


def test_rle_long_runs_and_singles():
    # worst-case PackBits shapes: >128 runs, singles after runs, alternation
    img = np.zeros((4, 300), np.uint16)
    img[0, :] = 7
    img[1, ::2] = 3
    img[2, :129] = 5
    img[2, 129] = 9
    out = cpx.rle_decode_frame(cpx.rle_encode_frame(img), 4, 300, 16)
    assert np.array_equal(out, img)


def test_rle_truncated_raises():
    img = _ct_like()
    frag = cpx.rle_encode_frame(img)
    with pytest.raises(ValueError, match="truncated"):
        cpx.rle_decode_frame(frag[: len(frag) // 2], *img.shape, 16)


@pytest.mark.parametrize("psv", range(1, 8))
def test_jpeg_lossless_predictors(psv):
    img = _ct_like((64, 80))
    cs = cpx.jpeg_lossless_encode(img, psv=psv)
    assert np.array_equal(cpx.jpeg_lossless_decode(cs), img)


def test_jpeg_lossless_native_matches_python():
    from pylinac_tpu.native import jpeg_lossless_native

    fn = jpeg_lossless_native()
    if fn is None:
        pytest.skip("no native toolchain")
    img = _ct_like((96, 128), seed=3)
    cs = cpx.jpeg_lossless_encode(img)
    assert np.array_equal(fn(cs), cpx.jpeg_lossless_decode(cs))


def test_jpeg_lossless_8bit():
    img = (_ct_like((64, 80)) >> 4).astype(np.uint8)
    out = cpx.jpeg_lossless_decode_fast(cpx.jpeg_lossless_encode(img))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_jpeg_lossless_rejects_lossy():
    # an SOF0 (baseline, lossy) stream must be refused
    bogus = b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x10\x00\x10\x01\xff\xd9"
    with pytest.raises(ValueError):
        cpx.jpeg_lossless_decode(bogus)


# -- Part-10 encapsulated read/write ----------------------------------------
@pytest.mark.parametrize("ts", [dcm.RLE_LOSSLESS, dcm.JPEG_LOSSLESS_SV1])
def test_part10_roundtrip(ts):
    arr = _ct_like()
    ds = array_to_dicom(arr, sid=1000.0, gantry=0, coll=0, couch=0, dpi=100.0)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds, transfer_syntax=ts)
    ds2 = dcm.dcmread(buf.getvalue())
    assert str(ds2.file_meta.TransferSyntaxUID) == ts
    assert np.array_equal(ds2.pixel_array, arr)


def test_part10_multiframe_rle():
    arr = np.random.default_rng(2).integers(0, 3000, (4, 64, 64)).astype(np.uint16)
    ds = dcm.Dataset()
    ds.set_pixel_data(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds, transfer_syntax=dcm.RLE_LOSSLESS)
    assert np.array_equal(dcm.dcmread(buf.getvalue()).pixel_array, arr)


def test_image_load_compressed(tmp_path):
    """End-to-end: image.load() consumes a compressed DICOM transparently."""
    from pylinac_tpu.core import image

    arr = _ct_like()
    ds = array_to_dicom(arr, sid=1000.0, gantry=0, coll=0, couch=0, dpi=100.0)
    p = tmp_path / "rle.dcm"
    dcm.dcmwrite(p, ds, transfer_syntax=dcm.RLE_LOSSLESS)
    img = image.load(str(p))
    assert img.array.shape == arr.shape
    assert np.allclose(img.array, arr)

    p2 = tmp_path / "jll.dcm"
    dcm.dcmwrite(p2, ds, transfer_syntax=dcm.JPEG_LOSSLESS_SV1)
    img2 = image.load(str(p2))
    assert np.allclose(img2.array, arr)
