"""ACR Digital Mammography tests on a synthetic phantom."""

import warnings

import numpy as np
import pytest

from pylinac_tpu.core.array_utils import array_to_dicom
from pylinac_tpu.core import dcm
from pylinac_tpu.planar_imaging import ACRDigitalMammography


def make_mammo_image(path, dpmm: float = 5.0):
    """Bright 70x130mm phantom block with masses, speck groups, and fibers
    drawn at the class's own geometry tables."""
    rng = np.random.default_rng(3)
    h, w = 1024, 768
    cy, cx = h / 2, w / 2
    arr = np.full((h, w), 100.0)
    # phantom body
    half_w = 35 * dpmm
    half_h = 65 * dpmm
    arr[int(cy - half_h):int(cy + half_h),
        int(cx - half_w):int(cx + half_w)] = 500.0

    def to_px(x_mm, y_mm):
        return cx + x_mm * dpmm, cy + y_mm * dpmm

    yy, xx = np.mgrid[:h, :w]

    # masses: 4 strong, 2 faint
    for idx, stng in enumerate(
            ACRDigitalMammography.low_contrast_roi_settings.values()):
        a = np.deg2rad(stng["angle"])
        px = cx + np.cos(a) * stng["distance from center"] * dpmm
        py = cy + np.sin(a) * stng["distance from center"] * dpmm
        r = stng["roi radius"] * dpmm
        amp = 400 if idx < 4 else 0
        arr[(yy - py) ** 2 + (xx - px) ** 2 <= (r * 1.8) ** 2] = 500 + amp

    # speck groups: 3 groups with bright specks, 3 without
    for g_idx, stng_grp in enumerate(
            ACRDigitalMammography.speck_group_roi_settings.values()):
        gx, gy = to_px(stng_grp["x offset"], stng_grp["y offset"])
        if g_idx >= 3:
            continue
        for stng_roi in ACRDigitalMammography.speck_roi_settings.values():
            a = np.deg2rad(stng_roi["angle"])
            sx = gx + np.cos(a) * stng_roi["distance from center"] * dpmm
            sy = gy + np.sin(a) * stng_roi["distance from center"] * dpmm
            arr[(yy - sy) ** 2 + (xx - sx) ** 2 <= 2.0 ** 2] = 30000

    # fibers: 4 long (10mm), 2 short (3mm)
    for f_idx, stng in enumerate(
            ACRDigitalMammography.fibers_roi_settings.values()):
        fx, fy = to_px(stng["x offset"], stng["y offset"])
        length = 10 if f_idx < 4 else 3
        a = np.deg2rad(stng["fiber_orientation"])
        # orientation convention: angle of major axis vs row axis
        ts = np.linspace(-length / 2 * dpmm, length / 2 * dpmm, 200)
        lx = fx + ts * np.sin(a)
        ly = fy - ts * np.cos(a) * -1  # rows increase downward
        width = max(stng["fiber_diameter"] * dpmm / 2, 1.0)
        for t_i in range(len(ts)):
            arr[(yy - ly[t_i]) ** 2 + (xx - lx[t_i]) ** 2 <= width**2] = 1200

    arr += rng.normal(0, 1.0, arr.shape)
    ds = array_to_dicom(arr.clip(0).astype(np.uint16), sid=1000, gantry=0,
                        coll=0, couch=0, dpi=25.4 * dpmm)
    dcm.dcmwrite(path, ds)
    return path


class TestACRMammo:
    @pytest.fixture(scope="class")
    def mammo(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("mammo") / "mammo.dcm")
        make_mammo_image(path)
        m = ACRDigitalMammography(path)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            m.analyze(invert=False, low_contrast_visibility_threshold=400,
                      speck_group_visibility_threshold=400)
        return m

    def test_masses(self, mammo):
        data = mammo.results_data()
        assert data.mass_score == 4
        assert len(data.mass_rois) == 6

    def test_speck_groups(self, mammo):
        data = mammo.results_data()
        # 3 fully-visible groups -> score 3.0
        assert data.speck_group_score == pytest.approx(3.0)
        assert len(data.speck_group_rois) == 6
        assert data.speck_group_rois[0]["num_specks_visible"] == 6
        assert data.speck_group_rois[5]["num_specks_visible"] == 0

    def test_fibers(self, mammo):
        data = mammo.results_data()
        # 4 long fibers -> 4.0
        assert data.fiber_score == pytest.approx(4.0)
        # the gap-closing footprint extends the measured length a bit
        for roi in data.fiber_rois[:4]:
            assert roi["fiber_length"] == pytest.approx(12, abs=4)
        for roi in data.fiber_rois[4:]:
            assert roi["score"] == 0

    def test_results_str(self, mammo):
        s = mammo.results()
        assert "ACR Digital Mammography" in s
        assert "Speck Group Scores" in s and "Fiber Scores" in s

    def test_center_found(self, mammo):
        # canny bbox center drifts slightly with feature asymmetry
        assert mammo.phantom_center.x == pytest.approx(768 / 2, abs=12)
        assert mammo.phantom_center.y == pytest.approx(1024 / 2, abs=12)
