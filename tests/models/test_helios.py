"""GE Helios daily QA tests on a synthetic series."""

import warnings

import pytest

from pylinac_tpu.helios import GEHeliosCTDaily
from pylinac_tpu.imggen.ct import generate_helios


class TestHelios:
    @pytest.fixture(scope="class")
    def helios(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("helios")
        generate_helios(d)
        h = GEHeliosCTDaily(str(d))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            h.analyze()
        return h

    def test_contrast_scale(self, helios):
        m = helios.contrast_scale_module
        assert m.rois["Plexiglass"].mean == pytest.approx(120, abs=10)
        assert m.rois["Water"].mean == pytest.approx(0, abs=10)
        assert m.contrast_difference == pytest.approx(120, abs=12)

    def test_mtf_declines(self, helios):
        mtfs = list(helios.high_contrast_module.mtf.norm_mtfs.values())
        assert mtfs[0] == pytest.approx(1.0)
        assert mtfs[-1] < mtfs[0]

    def test_noise_uniformity(self, helios):
        m = helios.noise_uniformity_module
        assert m.rois["Center"].mean == pytest.approx(0, abs=10)
        assert abs(m.uniformity_difference) < 10
        assert 0 < m.noise_center_std < 10

    def test_low_contrast(self, helios):
        lc = helios.low_contrast_multi_slice
        assert len(lc.slices) == 3
        assert lc.mean == pytest.approx(0, abs=10)
        assert 0 < lc.std < 10

    def test_roll_always_zero(self, helios):
        assert helios.catphan_roll == 0.0

    def test_results_data(self, helios):
        # a 4-bar daily-QA gauge rarely resolves down to 10% rMTF, so the
        # 10% entry is a (reference-authentic) extrapolation — assert that
        # is the ONLY warning class emitted
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            data = helios.results_data()
        assert all("extrapolation" in str(w.message) for w in wlist)
        assert data.phantom_model == "GE Helios CT Daily"
        assert data.contrast_scale.hu_difference == pytest.approx(120, abs=12)
        assert len(data.high_contrast.mtf_lp_mm) == 9
        assert data.noise_uniformity.center_mean_hu == pytest.approx(0, abs=10)

    def test_results_str(self, helios):
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            s = helios.results()
        assert all("extrapolation" in str(w.message) for w in wlist)
        assert "GE Helios" in s and "Contrast Difference" in s

    def test_pdf(self, helios, tmp_path):
        f = tmp_path / "helios.pdf"
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            helios.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")

    def test_no_demo(self):
        with pytest.raises(NotImplementedError):
            GEHeliosCTDaily.from_demo_image()
