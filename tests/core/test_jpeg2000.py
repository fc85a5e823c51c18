"""JPEG 2000 lossless codec (T.800, native/jpeg2000.cpp): roundtrips and the
DICOM 1.2.840.10008.1.2.4.90 transfer-syntax integration (reference reads
this syntax via pydicom handlers, ``/root/reference/pylinac/core/image.py:1369``)."""

import io

import numpy as np
import pytest

RNG = np.random.default_rng(7)


def _codec():
    from pylinac_tpu.native import j2k_native

    fns = j2k_native()
    if fns is None:
        pytest.skip("native toolchain unavailable")
    return fns


CASES = {
    "flat": (np.full((64, 64), 512, np.int32), 12, False),
    "tiny": (np.arange(12, dtype=np.int32).reshape(3, 4), 8, False),
    "ct12": (RNG.normal(1000, 300, (96, 128)).clip(0, 4095).astype(np.int32), 12, False),
    "noise16": (RNG.integers(0, 65536, (70, 50)).astype(np.int32), 16, False),
    "signed": (RNG.integers(-2048, 2048, (64, 64)).astype(np.int32), 12, True),
    "odd_dims": (RNG.integers(0, 4096, (65, 67)).astype(np.int32), 12, False),
    "one_col": (RNG.integers(0, 256, (33, 1)).astype(np.int32), 8, False),
    "one_row": (RNG.integers(0, 4096, (1, 77)).astype(np.int32), 12, False),
    "bimodal": ((RNG.integers(0, 2, (80, 60)) * 4000).astype(np.int32), 12, False),
}


@pytest.mark.parametrize("name", CASES)
def test_native_roundtrip(name):
    dec, enc = _codec()
    img, prec, sgnd = CASES[name]
    stream = enc(img, prec, sgnd)
    got, got_prec, got_sgnd = dec(stream)
    assert (got_prec, got_sgnd) == (prec, sgnd)
    np.testing.assert_array_equal(got, img)


def test_marker_structure():
    _, enc = _codec()
    stream = enc(CASES["ct12"][0], 12, False)
    assert stream[:4] == b"\xff\x4f\xff\x51"   # SOC + SIZ
    assert stream[-2:] == b"\xff\xd9"          # EOC
    assert b"\xff\x52" in stream               # COD
    assert b"\xff\x5c" in stream               # QCD


def test_dicom_roundtrip_j2k():
    from pylinac_tpu.core import dcm

    arr = RNG.normal(1200, 350, (64, 80)).clip(0, 4095).astype(np.uint16)
    ds = dcm.Dataset()
    ds.Rows, ds.Columns = arr.shape
    ds.BitsAllocated, ds.BitsStored, ds.HighBit = 16, 12, 11
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.2"
    ds.SOPInstanceUID = "1.2.3.4.6"
    ds.set_pixel_data(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds, transfer_syntax=dcm.J2K_LOSSLESS)
    buf.seek(0)
    ds2 = dcm.dcmread(buf)
    assert str(ds2.file_meta.TransferSyntaxUID) == dcm.J2K_LOSSLESS
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_dicom_signed_ct_roundtrip():
    """Signed HU CT slices (PixelRepresentation=1) survive the J2K trip."""
    from pylinac_tpu.core import dcm

    arr = RNG.normal(0, 500, (48, 52)).clip(-1024, 3071).astype(np.int16)
    ds = dcm.Dataset()
    ds.Rows, ds.Columns = arr.shape
    ds.BitsAllocated, ds.BitsStored, ds.HighBit = 16, 16, 15
    ds.PixelRepresentation = 1
    ds.SamplesPerPixel = 1
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.2"
    ds.SOPInstanceUID = "1.2.3.4.7"
    ds.set_pixel_data(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds, transfer_syntax=dcm.J2K_LOSSLESS)
    buf.seek(0)
    ds2 = dcm.dcmread(buf)
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_corrupt_stream_raises():
    dec, enc = _codec()
    stream = enc(CASES["ct12"][0], 12, False)
    with pytest.raises(ValueError):
        dec(stream[:40])
    with pytest.raises(ValueError):
        dec(b"\x00" * 64)
