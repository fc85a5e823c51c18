"""TomoCheese tests on synthetic stacks."""

import warnings

import pytest

from pylinac_tpu.cheese import CIRS062M, TomoCheese
from pylinac_tpu.imggen.ct import generate_tomocheese


class TestTomoCheese:
    @pytest.fixture(scope="class")
    def cheese(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("cheese")
        generate_tomocheese(d)
        tc = TomoCheese(str(d))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tc.analyze()
        return tc

    def test_plug_values(self, cheese):
        rois = cheese.module.rois
        assert rois["1"].pixel_value == pytest.approx(-800, abs=15)
        assert rois["6"].pixel_value == pytest.approx(800, abs=15)
        assert rois["8"].pixel_value == pytest.approx(300, abs=15)
        assert rois["13"].pixel_value == pytest.approx(-300, abs=15)
        assert rois["3"].pixel_value == pytest.approx(0, abs=15)

    def test_roll(self, cheese):
        assert cheese.catphan_roll == pytest.approx(0, abs=1)

    def test_results_data(self, cheese):
        data = cheese.results_data()
        assert data.roi_6["median"] == pytest.approx(800, abs=15)
        assert len(data.rois) == 20

    def test_results_str(self, cheese):
        s = cheese.results()
        assert "Tomotherapy Cheese" in s and "ROI 20" in s

    def test_density_curve_requires_config(self, cheese):
        cheese.roi_config = None
        with pytest.raises(ValueError):
            cheese.plot_density_curve(show=False)

    def test_density_config(self, tmp_path):
        generate_tomocheese(tmp_path, num_slices=12)
        tc = TomoCheese(str(tmp_path))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tc.analyze(roi_config={"1": {"density": 0.2},
                                   "6": {"density": 1.8}})
        tc.plot_density_curve(show=False)

    def test_pdf(self, cheese, tmp_path):
        f = tmp_path / "cheese.pdf"
        cheese.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")

    def test_rolled(self, tmp_path):
        generate_tomocheese(tmp_path, roll_deg=2.0, num_slices=12)
        tc = TomoCheese(str(tmp_path))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tc.analyze()
        assert tc.catphan_roll == pytest.approx(2.0, abs=0.7)


class TestCIRS:
    def test_no_demo(self):
        with pytest.raises(NotImplementedError):
            CIRS062M.from_demo_images()
