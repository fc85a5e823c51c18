"""Nuclear medicine suite tests on synthetic NM DICOMs."""

import numpy as np
import pytest

from pylinac_tpu.core import dcm
from pylinac_tpu.nuclear import (
    CenterOfRotation,
    FourBarResolution,
    MaxCountRate,
    Nuclide,
    PlanarUniformity,
    QuadrantResolution,
    SimpleSensitivity,
    TomographicContrast,
    TomographicResolution,
    TomographicUniformity,
    determine_binning,
    fwhm_from_gaussian,
    gaussian_fit,
)


def _write_nm(path, frames, pixel_spacing=4.8, extra=None):
    ds = dcm.Dataset()
    ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.20"
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.StudyInstanceUID = dcm.generate_uid()
    ds.SeriesInstanceUID = dcm.generate_uid()
    ds.Modality = "NM"
    ds.PatientName = "NM^Synthetic"
    ds.PatientID = "NM1"
    ds.PixelSpacing = [pixel_spacing, pixel_spacing]
    for k, v in (extra or {}).items():
        setattr(ds, k, v)
    ds.set_pixel_data(np.asarray(frames).astype(np.uint16))
    dcm.dcmwrite(str(path), ds)
    return str(path)


def _gauss2d(shape, cy, cx, sigma, amp):
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    return amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))


class TestMaxCountRate:
    def test_peak_found(self, tmp_path):
        frames = np.ones((10, 32, 32)) * 10
        frames[4] *= 50  # hot frame
        path = _write_nm(tmp_path / "mcr.dcm", frames)
        mcr = MaxCountRate(path)
        mcr.analyze(frame_duration=2.0)
        assert mcr.max_frame == 4
        assert mcr.max_countrate == pytest.approx(32 * 32 * 500 / 2.0)
        assert "Max countrate" in mcr.results()


class TestPlanarUniformity:
    def test_uniform_field(self, tmp_path):
        rng = np.random.default_rng(2)
        frame = np.zeros((128, 128))
        frame[14:114, 14:114] = 1000 + rng.normal(0, 10, (100, 100))
        path = _write_nm(tmp_path / "pu.dcm", [frame], pixel_spacing=4.8)
        pu = PlanarUniformity(path)
        pu.analyze()
        data = pu.results_data(as_dict=True)
        r = data["Frame 1"]
        # ~1% noise -> integral uniformity of a few percent
        assert 0 < r["ufov_integral_uniformity"] < 15
        assert 0 < r["cfov_differential_uniformity"] <= r[
            "ufov_integral_uniformity"] + 5
        assert "UFOV integral uniformity" in pu.results()

    def test_binning(self):
        assert determine_binning(4.8) == 1
        assert determine_binning(2.4) == 2
        assert determine_binning(1.2) == 4


class TestCenterOfRotation:
    def test_centered_rotation(self, tmp_path):
        """A point source exactly at COR: deviation ~ 0."""
        n_frames = 36
        frames = []
        for i in range(n_frames):
            frames.append(_gauss2d((64, 64), 32, 32, 2.0, 1000))
        rot_item = dcm.Dataset()
        rot_item.RotationDirection = "CW"
        rot_item.StartAngle = 0.0
        rot_item.AngularStep = 10.0
        path = _write_nm(tmp_path / "cor.dcm", frames, pixel_spacing=4.0,
                        extra={"RotationInformationSequence": [rot_item]})
        cor = CenterOfRotation(path)
        cor.analyze()
        assert cor.x_cor_deviation_mm < 0.5
        assert cor.y_cor_deviation_mm < 0.5


class TestTomographicResolution:
    def test_point_source_fwhm(self, tmp_path):
        """Gaussian point source, sigma=2px * 4mm -> FWHM = 2.355*8mm."""
        sigma_px = 2.0
        frames = [_gauss2d((64, 64), 32, 32, sigma_px,
                           1000 * np.exp(-(z - 10) ** 2 / (2 * 3**2)))
                  for z in range(20)]
        path = _write_nm(tmp_path / "res.dcm", frames, pixel_spacing=4.0,
                        extra={"SpacingBetweenSlices": 4.0})
        res = TomographicResolution(path)
        res.analyze()
        expected_fwhm = 2.3548 * sigma_px * 4.0
        assert res.x_axis.fwhm == pytest.approx(expected_fwhm, rel=0.05)
        assert res.y_axis.fwhm == pytest.approx(expected_fwhm, rel=0.05)
        z_fwhm = 2.3548 * 3 * 4.0
        assert res.z_axis.fwhm == pytest.approx(z_fwhm, rel=0.1)
        data = res.results_data()
        assert data.x_fwtm > data.x_fwhm


class TestSensitivity:
    def test_sensitivity(self, tmp_path):
        frame = np.full((64, 64), 100)
        path = _write_nm(tmp_path / "sens.dcm", [frame],
                        extra={"ActualFrameDuration": 60000})  # 60s
        s = SimpleSensitivity(path)
        s.analyze(activity_mbq=100, nuclide=Nuclide.Tc99m)
        cps = 64 * 64 * 100 / 60
        assert s.phantom_cps == pytest.approx(cps)
        assert s.decay_correction == pytest.approx(1.0, abs=0.01)
        assert s.sensitivity_mbq == pytest.approx(cps / s.decay_correction / 100,
                                                  rel=1e-6)
        assert s.background_cps == 0


class TestFourBar:
    def test_pixel_size(self, tmp_path):
        """Two vertical + two horizontal gaussian-profile bars 100mm apart."""
        pixel_spacing = 2.0
        shape = (128, 128)
        sep_px = 100 / pixel_spacing
        arr = np.zeros(shape)
        yy, xx = np.mgrid[:shape[0], :shape[1]]
        for off in (-sep_px / 2, sep_px / 2):
            arr += 1000 * np.exp(-((xx - (64 + off)) ** 2) / (2 * 1.5**2))
            arr += 1000 * np.exp(-((yy - (64 + off)) ** 2) / (2 * 1.5**2))
        path = _write_nm(tmp_path / "fourbar.dcm", [arr],
                        pixel_spacing=pixel_spacing,
                        extra={"Rows": shape[0], "Columns": shape[1]})
        fb = FourBarResolution(path)
        fb.analyze(separation_mm=100)
        data = fb.results_data()
        assert data.x_measured_pixel_size == pytest.approx(2.0, rel=0.03)
        assert data.y_measured_pixel_size == pytest.approx(2.0, rel=0.03)
        expected_fwhm = 2.3548 * 1.5 * 2.0
        assert data.x_fwhm == pytest.approx(expected_fwhm, rel=0.1)
        assert abs(data.x_pixel_size_difference) < 3


class TestQuadrant:
    def test_mtf_declines(self, tmp_path):
        """Four quadrants of bars with declining spatial frequency."""
        pixel_spacing = 2.0
        shape = (256, 256)
        arr = np.full(shape, 500.0)
        yy, xx = np.mgrid[:shape[0], :shape[1]]
        angles = (45, -45, -135, 135)
        bar_widths = (12, 9, 6, 4)  # mm
        for angle, width in zip(angles, bar_widths):
            a = np.deg2rad(angle)
            cx = 128 + np.cos(a) * 65
            cy = 128 + np.sin(a) * 65
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < (40) ** 2
            period_px = 2 * width / pixel_spacing
            stripes = 500 + 400 * np.sign(np.sin(2 * np.pi * xx / period_px))
            arr[mask] = stripes[mask]
        path = _write_nm(tmp_path / "quad.dcm", [arr],
                        pixel_spacing=pixel_spacing,
                        extra={"Rows": shape[0], "Columns": shape[1]})
        q = QuadrantResolution(path)
        q.analyze(bar_widths=bar_widths, roi_diameter_mm=70,
                  distance_from_center_mm=130)
        data = q.results_data()
        mtfs = [v["mtf"] for v in data.quadrants.values()]
        assert mtfs[0] > mtfs[-1]  # finer bars -> lower MTF
        assert "Quadrant Resolution" in q.results()

    def test_wrong_bar_count(self, tmp_path):
        path = _write_nm(tmp_path / "q2.dcm", [np.ones((64, 64))])
        q = QuadrantResolution(path)
        with pytest.raises(ValueError, match="4 bar widths"):
            q.analyze(bar_widths=(1, 2, 3))


class TestTomographicUniformity:
    def test_cylinder(self, tmp_path):
        rng = np.random.default_rng(3)
        frames = []
        yy, xx = np.mgrid[:128, :128]
        disk = (yy - 64) ** 2 + (xx - 64) ** 2 < 50**2
        for _ in range(10):
            f = np.where(disk, 1000.0, 0.0) + rng.normal(0, 10, (128, 128))
            f[f < 0] = 0
            frames.append(f)
        path = _write_nm(tmp_path / "tu.dcm", frames, pixel_spacing=4.8)
        tu = TomographicUniformity(path)
        tu.analyze()
        data = tu.results_data()
        assert 0 < data.ufov_integral_uniformity < 15
        assert data.center_border_ratio == pytest.approx(1.0, abs=0.1)
        assert data.first_frame == 1

    def test_bad_frame_range(self, tmp_path):
        path = _write_nm(tmp_path / "tu2.dcm", [np.ones((64, 64))] * 5)
        tu = TomographicUniformity(path)
        with pytest.raises(ValueError):
            tu.analyze(first_frame=4, last_frame=2)


class TestTomographicContrast:
    def test_cold_spheres(self, tmp_path):
        """Jaszczak-like: uniform hot cylinder with cold spheres."""
        rng = np.random.default_rng(9)
        yy, xx = np.mgrid[:128, :128]
        # slight per-frame radius jitter like a real reconstruction, so the
        # per-slice FOV areas vary (the area filter assumes variance)
        frames = np.array([
            np.where((yy - 64) ** 2 + (xx - 64) ** 2
                     < (55 + rng.uniform(-1, 1)) ** 2, 1000.0, 0.0)
            + rng.normal(0, 5, (128, 128)).clip(-20, 20)
            for _ in range(16)]).clip(0)
        # spheres on slice 10..12 at the nominal angles
        angles = (-10, -70, -130, -190, 110, 50)
        diameters = (38, 31.8, 25.4, 19.1, 15.9, 12.7)
        pixel_spacing = 2.4
        # match the analysis's own placement: eroded radius = 55 - 11, then
        # spheres at 0.65x that radius
        dist_px = (55 - 11) * 0.65
        zz, yy3, xx3 = np.mgrid[:16, :128, :128]
        for angle, diam in zip(angles, diameters):
            a = np.deg2rad(angle)
            cx = 64 + np.cos(a) * dist_px
            cy = 64 + np.sin(a) * dist_px
            r_px = diam / (2 * pixel_spacing)
            mask = ((xx3 - cx) ** 2 + (yy3 - cy) ** 2
                    + (zz - 11) ** 2 <= r_px**2)
            # cold but above the 10%-of-max background cut, like a real
            # Jaszczak acquisition
            frames[mask] = 300.0
        path = _write_nm(tmp_path / "tc.dcm", frames,
                        pixel_spacing=pixel_spacing)
        tc = TomographicContrast(path)
        tc.analyze()
        data = tc.results_data()
        assert len(data.spheres) == 6
        # largest sphere: strong contrast; contrast declines for smaller ones
        # planted michelson contrast: (1000-300)/(1000+300) ~ 54%
        assert data.spheres["1"]["mean_contrast"] > 40
        assert (data.spheres["1"]["mean_contrast"]
                >= data.spheres["6"]["mean_contrast"] - 10)
        assert "Tomographic Contrast" in tc.results()


class TestHelpers:
    def test_fwhm_from_gaussian(self):
        assert fwhm_from_gaussian(1.0) == pytest.approx(2.3548, abs=1e-3)
        assert fwhm_from_gaussian(-1.0) == pytest.approx(2.3548, abs=1e-3)

    def test_gaussian_fit_fn(self):
        x = np.linspace(-5, 5, 100)
        y = gaussian_fit(x, 10, 0, 1)
        assert y.max() == pytest.approx(10, rel=1e-2)
