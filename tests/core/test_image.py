import io

import numpy as np
import pytest

from pylinac_tpu.core import dcm
from pylinac_tpu.core import image as pimage
from pylinac_tpu.core.xim import write_xim


def _rtimage_file(tmp_path, arr=None, **tags):
    if arr is None:
        arr = np.random.default_rng(0).integers(0, 4000, (64, 80)).astype(np.uint16)
    ds = dcm.Dataset()
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.481.1"
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.Modality = "RTIMAGE"
    ds.ImagePlanePixelSpacing = [0.392, 0.392]
    ds.RTImageSID = 1500.0
    ds.RadiationMachineSAD = 1000.0
    ds.GantryAngle = 0.0
    for k, v in tags.items():
        setattr(ds, k, v)
    ds.set_pixel_data(arr)
    p = tmp_path / "img.dcm"
    dcm.dcmwrite(p, ds)
    return p, arr


def test_load_dispatch_dicom(tmp_path):
    p, arr = _rtimage_file(tmp_path)
    img = pimage.load(p)
    assert isinstance(img, pimage.DicomImage)
    np.testing.assert_array_equal(img.array, arr)


def test_load_dispatch_array():
    arr = np.arange(36).reshape(6, 6)
    img = pimage.load(arr)
    assert isinstance(img, pimage.ArrayImage)


def test_load_dispatch_xim(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 5000, (40, 50)).astype(np.int32)
    p = tmp_path / "img.xim"
    write_xim(p, arr, {"PixelWidth": 0.0336, "PixelHeight": 0.0336,
                       "GantryRtn": 180.0, "MVCollimatorRtn": 180.0, "CouchRtn": 180.0})
    img = pimage.load(p)
    assert isinstance(img, pimage.XIM)
    np.testing.assert_array_equal(img.array, arr)
    assert abs(img.dpmm - 1 / 0.336) < 1e-6


def test_xim_roundtrip_large_diffs(tmp_path):
    # values requiring 2- and 4-byte diffs
    rng = np.random.default_rng(2)
    arr = (rng.integers(0, 2, (30, 30)) * 40000 + rng.integers(0, 200, (30, 30))).astype(np.int32)
    p = tmp_path / "big.xim"
    write_xim(p, arr, {"PixelWidth": 0.0336, "PixelHeight": 0.0336})
    img = pimage.load(p)
    np.testing.assert_array_equal(img.array, arr)


def test_dicom_dpmm_scaled_to_iso(tmp_path):
    p, arr = _rtimage_file(tmp_path)
    img = pimage.load(p)
    # dpmm = 1/0.392 * 1500/1000
    assert abs(img.dpmm - (1 / 0.392) * 1.5) < 1e-6
    assert img.sid == 1500
    assert img.sad == 1000


def test_rescale_slope_intercept(tmp_path):
    arr = np.full((10, 10), 100, dtype=np.uint16)
    p, _ = _rtimage_file(tmp_path, arr=arr, RescaleSlope=2.0, RescaleIntercept=-50.0)
    img = pimage.load(p)
    np.testing.assert_allclose(img.array, 100 * 2.0 - 50.0)


def test_intensity_sign_inversion(tmp_path):
    arr = np.arange(100, dtype=np.uint16).reshape(10, 10)
    p, _ = _rtimage_file(tmp_path, arr=arr, PixelIntensityRelationshipSign=-1)
    img = pimage.load(p)
    # inverted: max - arr + min
    np.testing.assert_allclose(img.array, arr.max() - arr + arr.min())


def test_dicom_save_roundtrip(tmp_path):
    p, arr = _rtimage_file(tmp_path, RescaleSlope=2.0, RescaleIntercept=-50.0)
    img = pimage.load(p)
    out = tmp_path / "resaved.dcm"
    img.save(out)
    img2 = pimage.load(out)
    np.testing.assert_allclose(img2.array, img.array)


def test_check_inversion():
    # bright corners, dark center — should invert
    arr = np.full((100, 100), 1000.0)
    arr[40:60, 40:60] = 0
    img = pimage.ArrayImage(arr.copy())
    img.check_inversion()
    assert img.array[50, 50] > img.array[5, 5]


def test_check_inversion_by_histogram():
    rng = np.random.default_rng(3)
    arr = rng.normal(1000, 10, (100, 100))
    arr[40:60, 40:60] = 0  # dose is LOW value → inverted image
    img = pimage.ArrayImage(arr.copy())
    was = img.check_inversion_by_histogram()
    assert was


def test_crop_and_ops():
    arr = np.arange(100.0).reshape(10, 10)
    img = pimage.ArrayImage(arr.copy())
    img.crop(2)
    assert img.shape == (6, 6)
    img.ground()
    assert img.array.min() == 0
    img.normalize()
    assert img.array.max() == 1


def test_load_multiples(tmp_path):
    arrs = [np.random.default_rng(i).integers(0, 1000, (20, 20)).astype(np.uint16)
            for i in range(3)]
    paths = []
    for i, a in enumerate(arrs):
        p, _ = _rtimage_file(tmp_path / f"d{i}" if False else tmp_path, arr=a)
        newp = tmp_path / f"img{i}.dcm"
        p.rename(newp)
        paths.append(newp)
    img = pimage.load_multiples(paths)
    assert img.shape == (20, 20)


def test_linac_image_axes_from_filename(tmp_path):
    p, arr = _rtimage_file(tmp_path)
    newp = tmp_path / "img_Gantry90_Coll45_Couch315.dcm"
    p.rename(newp)
    img = pimage.LinacDicomImage(newp, use_filenames=True)
    assert img.gantry_angle == 90
    assert img.collimator_angle == 45
    assert img.couch_angle == 315


def test_linac_image_axes_from_tags(tmp_path):
    p, arr = _rtimage_file(tmp_path, GantryAngle=180.0, BeamLimitingDeviceAngle=90.0,
                           PatientSupportAngle=270.0)
    img = pimage.LinacDicomImage(p)
    assert img.gantry_angle == 180
    assert img.collimator_angle == 90
    assert img.couch_angle == 270


def _ct_slice(tmp_path, z, uid, name):
    ds = dcm.Dataset()
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.2"
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.SeriesInstanceUID = uid
    ds.Modality = "CT"
    ds.PixelSpacing = [0.5, 0.5]
    ds.SliceThickness = 2.0
    ds.RescaleSlope = 1.0
    ds.RescaleIntercept = -1000.0
    ds.ImagePositionPatient = [0.0, 0.0, float(z)]
    arr = np.full((32, 32), 1000 + z, dtype=np.uint16)
    ds.set_pixel_data(arr)
    p = tmp_path / name
    dcm.dcmwrite(p, ds)
    return p


def test_dicom_stack_sort_and_uid_filter(tmp_path):
    uid = dcm.generate_uid()
    other_uid = dcm.generate_uid()
    for i, z in enumerate([10, 0, 20, 5, 15]):
        _ct_slice(tmp_path, z, uid, f"s{i}.dcm")
    _ct_slice(tmp_path, 99, other_uid, "other.dcm")
    stack = pimage.DicomImageStack(tmp_path, min_number=3)
    assert len(stack) == 5
    zs = [img.z_position for img in stack.images]
    assert zs == sorted(zs)
    lazy = pimage.LazyDicomImageStack(tmp_path, min_number=3)
    assert len(lazy) == 5
    np.testing.assert_array_equal(lazy.array_3d(), stack.array_3d())
    assert stack.slice_spacing == 5.0


def test_xim_native_decoder_matches_numpy(tmp_path):
    """The C++ stream decoder and numpy vectorized decode are bit-identical."""
    import os

    import pylinac_tpu.native as native
    from pylinac_tpu.core.xim import XimImage

    rng = np.random.default_rng(11)
    arr = rng.integers(-5000, 60000, (97, 131)).astype(np.int32)
    p = tmp_path / "n.xim"
    write_xim(p, arr, {"PixelWidth": 0.0336, "PixelHeight": 0.0336})
    native._lib_cache.clear()
    a_native = XimImage(p).array
    os.environ["PYLINAC_TPU_NO_NATIVE"] = "1"
    native._lib_cache.clear()
    try:
        a_numpy = XimImage(p).array
    finally:
        del os.environ["PYLINAC_TPU_NO_NATIVE"]
        native._lib_cache.clear()
    assert np.array_equal(a_native, a_numpy)
    assert np.array_equal(a_native, arr)
