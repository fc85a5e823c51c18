"""FieldProfileAnalysis tests on synthetic simulator images with known geometry."""

import numpy as np
import pytest

from pylinac_tpu.core.profile import Centering, Edge, Normalization
from pylinac_tpu.field_profile_analysis import DEFAULT_METRICS, FieldProfileAnalysis
from pylinac_tpu.imggen.layers import FilteredFieldLayer, GaussianFilterLayer
from pylinac_tpu.imggen.simulators import AS1000Image


@pytest.fixture(scope="module")
def field_dicom(tmp_path_factory):
    """A 100x100mm field on an AS1000 EPID at 1000mm SID."""
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    path = str(tmp_path_factory.mktemp("fpa") / "field.dcm")
    sim.generate_dicom(path)
    return path


class TestFieldProfileAnalysis:
    @pytest.fixture(scope="class")
    def fa(self, field_dicom):
        fa = FieldProfileAnalysis(field_dicom)
        fa.analyze(edge_type=Edge.INFLECTION_DERIVATIVE)
        return fa

    def test_field_width(self, fa):
        data = fa.results_data()
        # 100mm field at iso; magnified at the 1500mm panel plane but dpmm
        # accounts for SID/SAD, so reported width is at iso: 100mm
        assert data.x_metrics["Field Width (mm)"] == pytest.approx(100, abs=1)
        assert data.y_metrics["Field Width (mm)"] == pytest.approx(100, abs=1)

    def test_default_metrics_present(self, fa):
        data = fa.results_data()
        for key in ("Flatness (Difference) (%)", "Point Difference Symmetry (%)",
                    "Left Penumbra (mm)", "Right Penumbra (mm)",
                    "CAX to Left Beam Edge (mm)", "CAX to Right Beam Edge (mm)"):
            assert key in data.x_metrics, key
            assert key in data.y_metrics, key

    def test_symmetric_field(self, fa):
        data = fa.results_data()
        assert abs(data.x_metrics["Point Difference Symmetry (%)"]) < 1
        assert data.x_metrics["CAX to Left Beam Edge (mm)"] == pytest.approx(50, abs=1)

    def test_center_roi_stats(self, fa):
        data = fa.results_data()
        assert data.center["max"] >= data.center["mean"] >= data.center["min"]
        assert data.center["stdev"] >= 0

    def test_results_string(self, fa):
        s = fa.results()
        assert "x_metrics" in s and "Field Width (mm)" in s

    def test_not_analyzed_raises(self, field_dicom):
        from pylinac_tpu.core.exceptions import NotAnalyzed

        fa = FieldProfileAnalysis(field_dicom)
        with pytest.raises(NotAnalyzed):
            fa.results_data()

    def test_bad_width_raises(self, field_dicom):
        fa = FieldProfileAnalysis(field_dicom)
        with pytest.raises(ValueError):
            fa.analyze(x_width=1.5)

    def test_manual_position_validation(self, field_dicom):
        fa = FieldProfileAnalysis(field_dicom)
        with pytest.raises(ValueError):
            fa.analyze(centering=Centering.MANUAL, position=(1.5, 0.5))

    def test_fwhm_edge(self, field_dicom):
        fa = FieldProfileAnalysis(field_dicom)
        fa.analyze(edge_type=Edge.FWHM, x_width=0.02, y_width=0.02,
                   normalization=Normalization.BEAM_CENTER)
        data = fa.results_data()
        assert data.x_metrics["Field Width (mm)"] == pytest.approx(100, abs=1)
        assert data.edge_type == "FWHM"

    def test_pdf(self, fa, tmp_path):
        f = tmp_path / "fpa.pdf"
        fa.publish_pdf(str(f))
        assert f.read_bytes().startswith(b"%PDF")
