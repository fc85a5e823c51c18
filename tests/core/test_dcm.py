import io

import numpy as np
import pytest

from pylinac_tpu.core import dcm


def _make_ds(arr=None):
    ds = dcm.Dataset()
    ds.PatientName = "QA^Phantom"
    ds.PatientID = "12345"
    ds.Modality = "RTIMAGE"
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.481.1"
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.GantryAngle = 90.0
    ds.BeamLimitingDeviceAngle = 45.5
    ds.PixelSpacing = [0.392, 0.392]
    ds.RescaleSlope = 2.0
    ds.RescaleIntercept = -100.0
    ds.RTImageSID = 1500.0
    ds.RadiationMachineSAD = 1000.0
    if arr is not None:
        ds.set_pixel_data(arr)
    return ds


def test_roundtrip_scalar_and_multivalue():
    arr = (np.random.default_rng(0).integers(0, 4096, (32, 48))).astype(np.uint16)
    ds = _make_ds(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds)
    ds2 = dcm.dcmread(buf.getvalue())
    assert ds2.PatientName == "QA^Phantom"
    assert ds2.GantryAngle == 90.0
    assert ds2.PixelSpacing == [0.392, 0.392]
    assert ds2.Rows == 32 and ds2.Columns == 48
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_signed_pixels():
    arr = np.arange(-500, 500, dtype=np.int16).reshape(20, 50)
    ds = _make_ds(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds)
    ds2 = dcm.dcmread(buf.getvalue())
    assert ds2.PixelRepresentation == 1
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_multiframe():
    arr = np.random.default_rng(1).integers(0, 255, (4, 16, 24)).astype(np.uint8)
    ds = _make_ds(arr)
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds)
    ds2 = dcm.dcmread(buf.getvalue())
    assert int(ds2.NumberOfFrames) == 4
    np.testing.assert_array_equal(ds2.pixel_array, arr)


def test_sequences_roundtrip():
    ds = _make_ds()
    beam = dcm.Dataset()
    beam.BeamName = "PF 6X"
    beam.BeamNumber = 1
    cp = dcm.Dataset()
    cp.ControlPointIndex = 0
    cp.GantryAngle = 180.0
    bld = dcm.Dataset()
    bld.RTBeamLimitingDeviceType = "MLCX"
    bld.LeafJawPositions = [-10.0, 10.0]
    cp.BeamLimitingDevicePositionSequence = [bld]
    beam.ControlPointSequence = [cp]
    ds.BeamSequence = [beam]
    buf = io.BytesIO()
    dcm.dcmwrite(buf, ds)
    ds2 = dcm.dcmread(buf.getvalue())
    b = ds2.BeamSequence[0]
    assert b.BeamName == "PF 6X"
    cp2 = b.ControlPointSequence[0]
    assert cp2.GantryAngle == 180.0
    assert cp2.BeamLimitingDevicePositionSequence[0].LeafJawPositions == [-10.0, 10.0]


def test_is_dicom_image(tmp_path):
    arr = np.zeros((8, 8), dtype=np.uint16)
    ds = _make_ds(arr)
    p = tmp_path / "img.dcm"
    dcm.dcmwrite(p, ds)
    assert dcm.is_dicom(p)
    assert dcm.is_dicom_image(p)
    p2 = tmp_path / "not.dcm"
    p2.write_bytes(b"hello world this is not dicom at all")
    assert not dcm.is_dicom(p2)


def test_implicit_vr_read():
    # hand-craft a tiny implicit-VR dataset (no preamble)
    import struct
    body = io.BytesIO()
    # Rows (0028,0010) US=16
    body.write(struct.pack("<HHI", 0x0028, 0x0010, 2) + struct.pack("<H", 16))
    body.write(struct.pack("<HHI", 0x0028, 0x0011, 2) + struct.pack("<H", 8))
    val = b"90.0"
    body.write(struct.pack("<HHI", 0x300A, 0x011E, len(val)) + val)
    ds = dcm.dcmread(body.getvalue())
    assert ds.Rows == 16 and ds.Columns == 8
    assert ds.GantryAngle == 90.0
