"""JPEG-LS lossless codec (ITU-T T.87): Python↔C++ cross-validation and the
DICOM 1.2.840.10008.1.2.4.80 round trip (reference reads this syntax via
pydicom's handler, ``/root/reference/pylinac/core/image.py:1369``)."""

import io

import numpy as np
import pytest

from pylinac_tpu.core.jpegls import jpegls_decode, jpegls_encode

RNG = np.random.default_rng(99)

CASES = {
    "flat8": np.full((16, 23), 7, np.uint8),
    "noise8": RNG.integers(0, 256, (24, 31)).astype(np.uint8),
    "ct12": RNG.normal(1000, 350, (48, 37)).clip(0, 4095).astype(np.uint16),
    "runs": np.repeat(RNG.integers(0, 4096, (16, 8)), 4, axis=1).astype(np.uint16),
    "bimodal": (RNG.integers(0, 2, (40, 17)) * 4000).astype(np.uint16),
    "full16": RNG.integers(0, 65536, (21, 45)).astype(np.uint16),
    "single_col": RNG.integers(0, 256, (37, 1)).astype(np.uint8),
    "single_row": RNG.integers(0, 4096, (1, 64)).astype(np.uint16),
}


@pytest.mark.parametrize("name", CASES)
def test_python_roundtrip(name):
    img = CASES[name]
    dec = jpegls_decode(jpegls_encode(img))
    assert dec.dtype == img.dtype
    np.testing.assert_array_equal(dec, img)


def _native():
    from pylinac_tpu.native import jpegls_native

    fns = jpegls_native()
    if fns is None:
        pytest.skip("native toolchain unavailable")
    return fns


@pytest.mark.parametrize("name", CASES)
def test_native_cross_validation(name):
    """The C++ codec must produce byte-identical streams and decode the
    Python encoder's output (and vice versa)."""
    dec_c, enc_c = _native()
    img = CASES[name]
    prec = 8 if img.dtype == np.uint8 else max(2, int(img.max()).bit_length())
    py_stream = jpegls_encode(img)
    c_stream = enc_c(img, prec)
    assert py_stream == c_stream
    np.testing.assert_array_equal(dec_c(py_stream), img)
    np.testing.assert_array_equal(jpegls_decode(c_stream), img)


def test_dicom_roundtrip_jpegls():
    from pylinac_tpu.core import dcm

    arr = RNG.normal(1200, 300, (64, 80)).clip(0, 4095).astype(np.uint16)
    ds = dcm.Dataset()
    ds.Rows, ds.Columns = arr.shape
    ds.BitsAllocated, ds.BitsStored, ds.HighBit = 16, 12, 11
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.2"
    ds.SOPInstanceUID = "1.2.3.4.5"
    ds.set_pixel_data(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds, transfer_syntax=dcm.JPEG_LS_LOSSLESS)
    buf.seek(0)
    ds2 = dcm.dcmread(buf)
    assert str(ds2.file_meta.TransferSyntaxUID) == dcm.JPEG_LS_LOSSLESS
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_rejects_near_lossy():
    img = CASES["ct12"]
    stream = bytearray(jpegls_encode(img))
    # SOS: ...ff da 00 08 01 01 00 NEAR ILV AL — flip NEAR to 2
    sos = stream.find(b"\xff\xda")
    stream[sos + 7] = 2
    with pytest.raises(ValueError, match="NEAR"):
        jpegls_decode(bytes(stream))


def test_corrupt_stream_raises():
    img = CASES["ct12"]
    stream = jpegls_encode(img)
    with pytest.raises(ValueError):
        jpegls_decode(stream[:20] + b"\x00" * 10)
