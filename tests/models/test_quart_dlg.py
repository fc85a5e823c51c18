"""QuartDVT and DLG tests on synthetic data."""

import warnings

import numpy as np
import pytest

from pylinac_tpu.dlg import DLG
from pylinac_tpu.imggen.ct import generate_quart
from pylinac_tpu.picketfence import MLC
from pylinac_tpu.quart import QuartDVT


class TestQuartSynthetic:
    @pytest.fixture(scope="class")
    def quart(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("quart")
        generate_quart(d)
        q = QuartDVT(str(d))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            q.analyze()
        return q

    def test_plotly_generic_modules(self, quart):
        """Engine subclasses get per-module ROI-overlay plotly figures."""
        import json

        figs = quart.plotly_analyzed_images(show=False)
        assert figs  # at least the HU/uniformity/geometry modules
        for fig in figs.values():
            json.dumps(fig.to_dict())
        assert any(f.layout.get("shapes") for f in figs.values())

    def test_hu_linearity(self, quart):
        rois = quart.hu_module.rois
        assert rois["Air"].pixel_value == pytest.approx(-1000, abs=15)
        assert rois["Poly"].pixel_value == pytest.approx(-35, abs=15)
        assert rois["Acrylic"].pixel_value == pytest.approx(120, abs=15)
        assert rois["Teflon"].pixel_value == pytest.approx(990, abs=15)
        assert quart.hu_module.passed_hu

    def test_water_vial_kept(self, quart):
        # the synthetic has a real water vial: HU ~ 0 -> kept
        assert "Water" in quart.hu_module.rois
        assert quart.hu_module.rois["Water"].pixel_value == pytest.approx(0, abs=15)

    def test_uniformity(self, quart):
        # acrylic body is uniform at 120 HU
        for roi in quart.uniformity_module.rois.values():
            assert roi.pixel_value == pytest.approx(120, abs=15)
        assert quart.uniformity_module.overall_passed

    def test_geometry_distances(self, quart):
        dists = quart.geometry_module.distances()
        # 80mm radius -> 160mm diameter
        assert dists["horizontal mm"] == pytest.approx(160, abs=2)
        assert dists["vertical mm"] == pytest.approx(160, abs=2)

    def test_high_contrast_distance(self, quart):
        d = quart.geometry_module.mean_high_contrast_resolution()
        assert 0 < d < 3  # sharp synthetic edge, sub-3mm dropoff

    def test_snr_cnr(self, quart):
        # SNR = (poly + 1000)/sigma; sigma ~ 3HU smoothing-reduced
        assert quart.hu_module.signal_to_noise > 50
        assert quart.hu_module.contrast_to_noise > 10

    def test_slice_thickness(self, quart):
        # wedge geometry: measured ~ slice thickness (2.5mm)
        assert quart.hu_module.meas_slice_thickness == pytest.approx(2.5, abs=0.8)

    def test_roll(self, quart):
        assert quart.catphan_roll == pytest.approx(0, abs=1)

    def test_results_data(self, quart):
        data = quart.results_data()
        assert data.phantom_model == "Quart DVT"
        assert data.hu_module.signal_to_noise > 50
        assert data.geometric_module.mean_high_contrast_distance > 0
        assert "Air" in data.hu_module.rois

    def test_results_str(self, quart):
        s = quart.results()
        assert "Quart DVT" in s and "HU Passed?" in s

    def test_pdf(self, quart, tmp_path):
        f = tmp_path / "quart.pdf"
        quart.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")

    def test_rolled_phantom(self, tmp_path):
        generate_quart(tmp_path, roll_deg=2.0, num_slices=40)
        q = QuartDVT(str(tmp_path))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            q.analyze()
        assert q.catphan_roll == pytest.approx(2.0, abs=0.7)


class TestDLGSynthetic:
    @pytest.fixture(scope="class")
    def dlg_image(self, tmp_path_factory):
        """EPID image with bands of varying gap width: measured prominence
        rises linearly with planned overlap."""
        from pylinac_tpu.imggen.layers import ArrayLayer, GaussianFilterLayer
        from pylinac_tpu.imggen.simulators import AS1000Image

        sim = AS1000Image(sid=1000)
        h, w = sim.shape
        dpmm = 1 / sim.pixel_size
        arr = np.full((h, w), 500.0)
        gaps = (-0.4, -0.6, -0.8, -1.0, -1.2)
        field = 100.0  # mm
        roi = field / len(gaps)
        cy, cx = h / 2, w / 2
        yy = (np.arange(h) - cy) / dpmm
        # draw a dark line at the center whose depth scales with |gap|;
        # band order follows the analysis convention (ascending sort)
        for idx, gap in enumerate(sorted(gaps)):
            upper = field / 2 - idx * roi
            lower = field / 2 - (idx + 1) * roi
            band = (yy > lower) & (yy <= upper)
            depth = 300 * abs(gap)
            line_halfwidth_px = 2
            arr[np.ix_(band, np.arange(int(cx - line_halfwidth_px),
                                       int(cx + line_halfwidth_px)))] -= depth
        sim.add_layer(ArrayLayer((arr * 50).astype(np.uint16)))
        sim.add_layer(GaussianFilterLayer(sigma_mm=0.5))
        path = str(tmp_path_factory.mktemp("dlg") / "dlg.dcm")
        sim.generate_dicom(path)
        return path, gaps

    def test_dlg_fit(self, dlg_image):
        path, gaps = dlg_image
        dlg = DLG(path)
        dlg.analyze(gaps=gaps, mlc=MLC.MILLENNIUM)
        # depth scales linearly with |gap| and hits 0 at gap=0
        assert len(dlg.measured_dlg_per_leaf) > 10
        assert dlg.measured_dlg == pytest.approx(0.0, abs=0.15)

    def test_plot_requires_analysis(self, dlg_image):
        path, _ = dlg_image
        dlg = DLG(path)
        with pytest.raises(ValueError):
            dlg.plot_dlg()
