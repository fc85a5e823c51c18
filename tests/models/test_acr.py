"""ACR CT-464 and ACR MRI-Large tests on synthetic series."""

import warnings

import numpy as np
import pytest

from pylinac_tpu.acr import ACRCT, ACRMRILarge
from pylinac_tpu.imggen.ct import generate_acr_ct
from pylinac_tpu.imggen.mri import generate_acr_mri


class TestACRCT:
    @pytest.fixture(scope="class")
    def ct(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("acrct")
        generate_acr_ct(d)
        ct = ACRCT(str(d))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ct.analyze()
        return ct

    def test_plotly_generic_modules(self, ct):
        import json

        figs = ct.plotly_analyzed_images(show=False)
        assert figs
        for fig in figs.values():
            json.dumps(fig.to_dict())

    def test_hu_values(self, ct):
        rois = ct.ct_calibration_module.rois
        assert rois["Air"].pixel_value == pytest.approx(-1000, abs=15)
        assert rois["Poly"].pixel_value == pytest.approx(-95, abs=15)
        assert rois["Acrylic"].pixel_value == pytest.approx(120, abs=15)
        assert rois["Bone"].pixel_value == pytest.approx(955, abs=15)
        assert rois["Water"].pixel_value == pytest.approx(0, abs=15)

    def test_uniformity(self, ct):
        for roi in ct.uniformity_module.rois.values():
            assert roi.pixel_value == pytest.approx(0, abs=10)

    def test_cnr(self, ct):
        # 30 HU disk on ~3HU smoothed noise
        assert ct.low_contrast_module.cnr() > 5

    def test_mtf_declines(self, ct):
        mtfs = list(ct.spatial_resolution_module.mtf.norm_mtfs.values())
        assert mtfs[0] == pytest.approx(1.0)
        assert mtfs[-1] < 0.5
        assert ct.spatial_resolution_module.mtf.relative_resolution(50) > 0.4

    def test_roll(self, ct):
        assert ct.catphan_roll == pytest.approx(0, abs=1)

    def test_results_data(self, ct):
        data = ct.results_data()
        assert data.phantom_model == "ACR CT 464"
        assert data.ct_module.rois["Air"] == pytest.approx(-1000, abs=15)
        assert data.low_contrast_module.cnr > 5
        assert len(data.spatial_resolution_module.lpmm_to_rmtf) == 8

    def test_results_str(self, ct):
        s = ct.results()
        assert "ACR CT 464" in s and "MTF 50%" in s

    def test_pdf(self, ct, tmp_path):
        f = tmp_path / "acrct.pdf"
        ct.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")


class TestACRMRI:
    @pytest.fixture(scope="class")
    def mri(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("acrmri")
        generate_acr_mri(d)
        mri = ACRMRILarge(str(d))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            mri.analyze()
        return mri

    def test_roll(self, mri):
        assert mri.catphan_roll == pytest.approx(0, abs=1.5)

    def test_slice1_shift_zero(self, mri):
        assert mri.slice1.slice_shift_mm == pytest.approx(0, abs=1.0)

    def test_slice11_shift_zero(self, mri):
        assert mri.slice11.slice_shift_mm == pytest.approx(0, abs=1.0)

    def test_slice_thickness(self, mri):
        # two 50mm ramps: 0.2*(50*50)/(50+50) = 5mm
        assert mri.slice1.measured_slice_thickness_mm == pytest.approx(5, abs=1)

    def test_geometric_distortion(self, mri):
        # 100mm radius disk -> 200mm diameter in all four directions
        for name, p in mri.geometric_distortion.profiles.items():
            assert p["width (mm)"] == pytest.approx(200, abs=4), name

    def test_uniformity_piu(self, mri):
        assert mri.uniformity_module.percent_image_uniformity > 95
        assert mri.uniformity_module.piu_passed

    def test_ghosting(self, mri):
        assert mri.uniformity_module.psg < 3
        assert mri.uniformity_module.psg_passed

    def test_mtf(self, mri):
        assert list(mri.slice1.row_mtf.norm_mtfs.values())[0] == pytest.approx(1.0)
        assert mri.slice1.row_mtf.relative_resolution(50) > 0

    def test_low_contrast_score(self, mri):
        # 4 visible spokes drawn per slice x 4 slices
        assert mri.low_contrast_multi_slice.score == pytest.approx(16, abs=4)

    def test_sagittal(self, mri):
        assert mri.has_sagittal_module
        widths = [p["width (mm)"]
                  for p in mri.sagittal_localization.profiles.values()]
        for w in widths:
            assert w == pytest.approx(148, abs=3)

    def test_results_data(self, mri):
        data = mri.results_data()
        assert data.phantom_model == "ACR MRI Large"
        assert data.uniformity_module.piu > 95
        assert data.low_contrast_multi_slice_module.score > 8

    def test_results_str(self, mri):
        s = mri.results()
        assert "ACR MRI Large" in s and "PIU" in s

    def test_bad_echo_raises(self, tmp_path):
        generate_acr_mri(tmp_path, include_sagittal=False)
        mri = ACRMRILarge(str(tmp_path))
        with pytest.raises(ValueError, match="Echo number"):
            mri.analyze(echo_number=99)
