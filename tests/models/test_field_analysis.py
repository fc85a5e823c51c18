"""FieldAnalysis end-to-end tests on synthetic (generated) images with known
ground truth — mirrors the reference's 'benchmarking the algorithm' strategy."""

import numpy as np
import pytest

from pylinac_tpu.field_analysis import (
    Device,
    Edge,
    FieldAnalysis,
    Interpolation,
    Normalization,
    Protocol,
)
from pylinac_tpu.imggen.layers import (
    FilteredFieldLayer,
    FilterFreeFieldLayer,
    GaussianFilterLayer,
)
from pylinac_tpu.imggen.simulators import AS1000Image


@pytest.fixture(scope="module")
def flat_field_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fa")
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100), gaussian_height=0.02))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    path = tmp / "flat.dcm"
    sim.generate_dicom(path)
    return path


@pytest.fixture(scope="module")
def fff_field_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fff")
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilterFreeFieldLayer(field_size_mm=(150, 150)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    path = tmp / "fff.dcm"
    sim.generate_dicom(path)
    return path


def test_field_size_parity(flat_field_file):
    fa = FieldAnalysis(flat_field_file)
    fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=Edge.FWHM)
    data = fa.results_data()
    assert abs(data.field_size_vertical_mm - 100) < 0.6
    assert abs(data.field_size_horizontal_mm - 100) < 0.6
    # symmetric синthetic field: symmetry ~0, flatness small
    assert abs(data.protocol_results["symmetry_vertical"]) < 0.6
    assert abs(data.protocol_results["symmetry_horizontal"]) < 0.6
    assert data.protocol_results["flatness_vertical"] < 2.5


def test_inflection_edge(flat_field_file):
    fa = FieldAnalysis(flat_field_file)
    fa.analyze(protocol=Protocol.VARIAN,
               edge_detection_method=Edge.INFLECTION_DERIVATIVE)
    data = fa.results_data()
    assert abs(data.field_size_vertical_mm - 100) < 1.0
    assert abs(data.field_size_horizontal_mm - 100) < 1.0


def test_hill_edge(flat_field_file):
    fa = FieldAnalysis(flat_field_file)
    fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=Edge.INFLECTION_HILL)
    data = fa.results_data()
    assert abs(data.field_size_vertical_mm - 100) < 1.0
    assert abs(data.field_size_horizontal_mm - 100) < 1.0


def test_penumbra_reasonable(flat_field_file):
    fa = FieldAnalysis(flat_field_file)
    fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=Edge.FWHM)
    data = fa.results_data()
    # generated field blurred with sigma=1mm: 20-80 penumbra ≈ 1.68*sigma
    for pen in (data.top_penumbra_mm, data.bottom_penumbra_mm,
                data.left_penumbra_mm, data.right_penumbra_mm):
        assert 1.0 < pen < 3.0


def test_offset_field_symmetry():
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100), cax_offset_mm=(0, 5)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    import io as _io
    from pylinac_tpu.core import dcm
    buf = _io.BytesIO()
    dcm.dcmwrite(buf, sim.as_dicom())
    buf.seek(0)
    fa = FieldAnalysis(buf)
    fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=Edge.FWHM)
    data = fa.results_data()
    # field offset 5mm right: beam center is offset; still ~100mm wide
    assert abs(data.field_size_horizontal_mm - 100) < 1
    # cax-to-left and cax-to-right should differ by ~10mm
    assert abs((data.cax_to_right_mm - data.cax_to_left_mm) - 10) < 1.5


def test_fff_top_metrics(fff_field_file):
    fa = FieldAnalysis(fff_field_file)
    fa.analyze(protocol=Protocol.VARIAN, is_FFF=True,
               edge_detection_method=Edge.INFLECTION_DERIVATIVE)
    data = fa.results_data()
    assert abs(data.field_size_vertical_mm - 150) < 2
    # centered FFF: top is near the beam center
    assert abs(data.top_vertical_distance_from_beam_center_mm) < 2
    assert abs(data.top_horizontal_distance_from_beam_center_mm) < 2


def test_results_and_json(flat_field_file):
    fa = FieldAnalysis(flat_field_file)
    fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=Edge.FWHM)
    s = fa.results()
    assert "Field Analysis Results" in s
    d = fa.results_data(as_dict=True)
    assert "field_size_vertical_mm" in d
    j = fa.results_data(as_json=True)
    assert "field_size_vertical_mm" in j


def test_not_analyzed_raises(flat_field_file):
    fa = FieldAnalysis(flat_field_file)
    with pytest.raises(Exception):
        fa.results()


def test_publish_pdf(flat_field_file, tmp_path):
    fa = FieldAnalysis(flat_field_file)
    fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=Edge.FWHM)
    out = tmp_path / "report.pdf"
    fa.publish_pdf(out)
    content = out.read_bytes()
    assert content.startswith(b"%PDF-1.4")
    assert b"%%EOF" in content
