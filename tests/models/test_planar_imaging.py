"""Planar phantom engine tests on synthetic images with known geometry."""

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import ArrayLayer, GaussianFilterLayer
from pylinac_tpu.imggen.simulators import AS1000Image
from pylinac_tpu.imggen.utils import generate_lightrad
from pylinac_tpu.planar_imaging import (
    StandardImagingFC2,
    StandardImagingQC3,
    hough_line,
    hough_line_peaks,
    is_centered,
    is_right_size,
    is_square,
    percent_integral_uniformity,
)


def _draw_disk(arr, cy, cx, radius, value):
    h, w = arr.shape
    yy, xx = np.mgrid[:h, :w]
    arr[(yy - cy) ** 2 + (xx - cx) ** 2 <= radius ** 2] = value


def _make_qc3_image(path, angle_sign=1):
    """A QC3-like phantom: 45-deg rotated rectangle with contrast disks drawn
    at the exact relative ROI positions the class samples."""
    sim = AS1000Image(sid=1000)  # mag factor 1: ssd=sad=1000
    h, w = sim.shape
    dpmm = 1 / sim.pixel_size
    arr = np.zeros((h, w), np.float64)
    cy, cx = h / 2, w / 2

    # rotated rectangle whose bbox area matches phantom_bbox_size_mm2=168^2.
    # For sides a, b at 45deg the bbox is square with side (a+b)/sqrt(2).
    target_bbox_side = 168 * dpmm
    b = target_bbox_side * np.sqrt(2) / 2.25
    a = 1.25 * b
    theta = np.deg2rad(45 * angle_sign)
    yy, xx = np.mgrid[:h, :w]
    u = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
    v = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
    inside = (np.abs(u) <= a / 2) & (np.abs(v) <= b / 2)
    arr[inside] = 500.0

    # place contrast disks using the class's own settings tables so the
    # analysis geometry is exact by construction
    radius = target_bbox_side * 0.0896
    phantom_angle = 45 * angle_sign
    for stng in StandardImagingQC3.low_contrast_roi_settings.values():
        ang = np.deg2rad(phantom_angle + stng["angle"])
        dist = radius * stng["distance from center"]
        _draw_disk(arr, cy + np.sin(ang) * dist, cx + np.cos(ang) * dist,
                   radius * stng["roi radius"], 560.0)
    # high-contrast stripes with declining amplitude -> declining MTF
    amplitudes = [200, 150, 100, 60, 30]
    for amp, stng in zip(amplitudes,
                         StandardImagingQC3.high_contrast_roi_settings.values()):
        ang = np.deg2rad(phantom_angle + stng["angle"])
        dist = radius * stng["distance from center"]
        dcy, dcx = cy + np.sin(ang) * dist, cx + np.cos(ang) * dist
        rr = radius * stng["roi radius"]
        sub_y, sub_x = np.mgrid[:h, :w]
        mask = (sub_y - dcy) ** 2 + (sub_x - dcx) ** 2 <= rr ** 2
        stripes = np.where((sub_x // 3) % 2 == 0, 500 + amp, 500 - amp)
        arr[mask] = stripes[mask]

    rng = np.random.default_rng(42)
    arr += rng.normal(0, 2, arr.shape)
    sim.add_layer(ArrayLayer((arr.clip(0) * 40).astype(np.uint16)))
    sim.generate_dicom(path)
    return path


class TestHelpers:
    def test_piu(self):
        assert percent_integral_uniformity(max=100, min=100) == pytest.approx(
            100, abs=0.01)
        assert percent_integral_uniformity(max=110, min=90) == pytest.approx(
            90, abs=0.1)

    def test_hough_line(self):
        img = np.zeros((100, 100), bool)
        # vertical line x=30: distance 30 at theta=0
        img[10:90, 30] = True
        theta = np.deg2rad(np.linspace(-5, 5, 101))
        acc, angles, dists = hough_line(img, theta)
        _, peak_angles, peak_dists = hough_line_peaks(acc, angles, dists,
                                                      num_peaks=1)
        assert peak_dists[0] == pytest.approx(30, abs=1)
        assert np.rad2deg(peak_angles[0]) == pytest.approx(0, abs=0.5)

    def test_hough_two_parallel_lines(self):
        img = np.zeros((200, 200), bool)
        img[20:180, 50] = True
        img[20:180, 150] = True
        theta = np.deg2rad(np.linspace(-5, 5, 201))
        acc, angles, dists = hough_line(img, theta)
        _, _, peak_dists = hough_line_peaks(acc, angles, dists,
                                            min_distance=30, num_peaks=2)
        assert sorted(np.round(peak_dists)) == [50, 150]


class TestQC3Synthetic:
    @pytest.fixture(scope="class")
    def qc3(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("qc3") / "qc3.dcm")
        _make_qc3_image(path)
        qc3 = StandardImagingQC3(path)
        qc3.analyze()
        return qc3

    def test_angle_detected(self, qc3):
        assert qc3.phantom_angle == pytest.approx(45, abs=0.1)

    def test_center_detected(self, qc3):
        assert qc3.phantom_center.x == pytest.approx(qc3.image.shape[1] / 2, abs=5)
        assert qc3.phantom_center.y == pytest.approx(qc3.image.shape[0] / 2, abs=5)

    def test_low_contrast_rois_seen(self, qc3):
        data = qc3.results_data()
        # all 5 drawn disks have strong contrast against the background ROI
        assert data.num_contrast_rois_seen == 5
        assert data.median_contrast > 0.01

    def test_mtf_declines(self, qc3):
        mtfs = list(qc3.mtf.norm_mtfs.values())
        assert mtfs[0] == pytest.approx(1.0)
        assert mtfs[-1] < mtfs[0]
        assert qc3.mtf.relative_resolution(50) > 0

    def test_results_text(self, qc3):
        s = qc3.results()
        assert "SI QC-3 results" in s and "MTF 50%" in s

    def test_results_data_fields(self, qc3):
        data = qc3.results_data(as_dict=True)
        assert data["analysis_type"] == "SI QC-3"
        assert len(data["low_contrast_rois"]) == 5
        assert data["percent_integral_uniformity"] is not None

    def test_pdf(self, qc3, tmp_path):
        f = tmp_path / "qc3.pdf"
        qc3.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")

    def test_negative_angle(self, tmp_path):
        path = str(tmp_path / "qc3_neg.dcm")
        _make_qc3_image(path, angle_sign=-1)
        qc3 = StandardImagingQC3(path)
        qc3.analyze()
        assert qc3.phantom_angle == pytest.approx(-45, abs=0.1)

    def test_override_conflicts(self, qc3):
        with pytest.raises(ValueError):
            qc3.analyze(center_override=(10, 10), x_adjustment=1)
        with pytest.raises(ValueError):
            qc3.analyze(angle_override=45, angle_adjustment=2)
        with pytest.raises(ValueError):
            qc3.analyze(size_override=100, scaling_factor=1.2)

    def test_not_found_raises(self, tmp_path):
        sim = AS1000Image(sid=1000)
        rng = np.random.default_rng(0)
        sim.add_layer(ArrayLayer(
            (rng.normal(1000, 5, sim.shape)).astype(np.uint16)))
        path = str(tmp_path / "empty.dcm")
        sim.generate_dicom(path)
        qc3 = StandardImagingQC3(path)
        with pytest.raises(ValueError, match="Unable to find the phantom"):
            qc3.analyze()


class TestFC2Synthetic:
    @pytest.fixture(scope="class")
    def fc2(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("fc2") / "fc2.dcm")
        sim = AS1000Image(sid=1000)
        generate_lightrad(
            sim, file_out=path, field_size_mm=(100, 100),
            bb_size_mm=4,
            bb_positions=((-40, -40), (-40, 40), (40, -40), (40, 40)),
            final_layers=[GaussianFilterLayer(sigma_mm=1)])
        fc2 = StandardImagingFC2(path)
        fc2.analyze()
        return fc2

    def test_field_size(self, fc2):
        data = fc2.results_data()
        assert data.field_size_x_mm == pytest.approx(100, abs=1.5)
        assert data.field_size_y_mm == pytest.approx(100, abs=1.5)

    def test_offsets_near_zero(self, fc2):
        data = fc2.results_data()
        assert abs(data.field_epid_offset_x_mm) < 0.5
        assert abs(data.field_epid_offset_y_mm) < 0.5
        assert abs(data.field_bb_offset_x_mm) < 1.0
        assert abs(data.field_bb_offset_y_mm) < 1.0

    def test_four_bbs_found(self, fc2):
        assert len(fc2.bb_centers) == 4

    def test_results_text(self, fc2):
        s = fc2.results()
        assert "SI FC-2 results" in s and "inplane field size" in s

    def test_pdf(self, fc2, tmp_path):
        f = tmp_path / "fc2.pdf"
        fc2.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")


class TestDetectionPredicates:
    class _FakeRegion:
        def __init__(self, bbox):
            self.bbox = bbox
            self.bbox_area = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])

    class _FakeInstance:
        class _Img:
            class _C:
                x, y = 50, 50

            center = _C()

        image = _Img()
        phantom_bbox_size_px = 1600

    def test_is_square(self):
        assert is_square(self._FakeRegion((10, 10, 50, 50)), None)
        assert not is_square(self._FakeRegion((10, 10, 50, 90)), None)

    def test_is_centered(self):
        inst = self._FakeInstance()
        assert is_centered(self._FakeRegion((30, 30, 70, 70)), inst)
        assert not is_centered(self._FakeRegion((0, 0, 20, 20)), inst)

    def test_is_right_size(self):
        inst = self._FakeInstance()
        assert is_right_size(self._FakeRegion((30, 30, 70, 70)), inst)
        assert not is_right_size(self._FakeRegion((30, 30, 40, 40)), inst)
