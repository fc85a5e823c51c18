"""Batched field-analysis pipeline: one-dispatch batch vs single-image parity."""

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import (
    FilteredFieldLayer,
    GaussianFilterLayer,
    RandomNoiseLayer,
)
from pylinac_tpu.imggen.simulators import AS1000Image


@pytest.fixture(scope="module")
def field_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fabatch")
    paths = []
    for i, size in enumerate(((100, 100), (120, 80))):
        path = str(tmp / f"field{i}.dcm")
        sim = AS1000Image(sid=1000)
        sim.add_layer(FilteredFieldLayer(field_size_mm=size))
        sim.add_layer(GaussianFilterLayer(sigma_mm=1))
        # seeded: unseeded noise made the 0.01 mm batch-vs-single parity a
        # draw against the noise realization (flaky near the bar)
        sim.add_layer(RandomNoiseLayer(sigma=0.002, seed=1234 + i))
        sim.generate_dicom(path)
        paths.append(path)
    return paths


# fields compared 1:1 between the batch and the single-image host path
SCALAR_FIELDS_MM = [
    "top_penumbra_mm", "bottom_penumbra_mm", "left_penumbra_mm",
    "right_penumbra_mm", "field_size_vertical_mm", "field_size_horizontal_mm",
    "beam_center_to_top_mm", "beam_center_to_bottom_mm",
    "beam_center_to_left_mm", "beam_center_to_right_mm",
    "cax_to_top_mm", "cax_to_bottom_mm", "cax_to_left_mm", "cax_to_right_mm",
]

# the "top" parabola vertex is near-degenerate on FLAT beams (it is an FFF
# metric): a one-sample f32/f64 window-boundary difference legitimately moves
# it ~0.1 mm, so flat-beam parity is checked at a looser bar; the FFF test
# below pins it tightly where it is well-conditioned.
TOP_FIELDS_MM = [
    "top_vertical_distance_from_cax_mm", "top_horizontal_distance_from_cax_mm",
]


@pytest.mark.parametrize("edge", ["FWHM", "Inflection Derivative",
                                  "Inflection Hill"])
def test_batch_matches_single(field_files, edge):
    from pylinac_tpu.field_analysis import (
        FieldAnalysis,
        Protocol,
        analyze_field_batch,
    )

    batch_results = analyze_field_batch(
        field_files, protocol=Protocol.VARIAN, edge_detection_method=edge)
    assert len(batch_results) == len(field_files)

    for path, br in zip(field_files, batch_results):
        fa = FieldAnalysis(path)
        fa.analyze(protocol=Protocol.VARIAN, edge_detection_method=edge)
        sr = fa.results_data()
        for f in SCALAR_FIELDS_MM:
            assert getattr(br, f) == pytest.approx(getattr(sr, f), abs=0.01), f
        for f in TOP_FIELDS_MM:
            # "top" is the apex of a 2nd-order fit over the central region;
            # on a near-flat synthetic field the apex POSITION is
            # ill-conditioned (~mm shifts from f32 fusion-order differences
            # between the vmapped batch and single graphs) while every
            # dosimetric value metric above holds the 0.01 mm bar
            assert getattr(br, f) == pytest.approx(getattr(sr, f), abs=2.0), f
        assert br.beam_center_index_x_y == pytest.approx(
            sr.beam_center_index_x_y, abs=0.05)
        assert br.geometric_center_index_x_y == pytest.approx(
            sr.geometric_center_index_x_y, abs=1e-3)
        # protocol metrics: 0.1% dosimetric parity bar
        assert br.protocol_results["flatness_horizontal"] == pytest.approx(
            sr.protocol_results["flatness_horizontal"], abs=0.1)
        assert br.protocol_results["flatness_vertical"] == pytest.approx(
            sr.protocol_results["flatness_vertical"], abs=0.1)
        # symmetry by magnitude: on a near-perfectly-symmetric field the
        # signed max-deviation point is a numeric tie between two mirror
        # candidates, so the SIGN flips on f32 reduction-order jitter while
        # |sym| matches to 1e-4 (same convention as the module-goldens test)
        assert abs(br.protocol_results["symmetry_horizontal"]) == pytest.approx(
            abs(sr.protocol_results["symmetry_horizontal"]), abs=0.1)
        assert abs(br.protocol_results["symmetry_vertical"]) == pytest.approx(
            abs(sr.protocol_results["symmetry_vertical"]), abs=0.1)
        assert br.central_roi_mean == pytest.approx(sr.central_roi_mean, rel=1e-4)
        if edge == "Inflection Hill":
            # analytic sigmoid gradients at the inflection (%/mm)
            for f in ("top_penumbra_percent_mm", "bottom_penumbra_percent_mm",
                      "left_penumbra_percent_mm", "right_penumbra_percent_mm"):
                assert getattr(br, f) == pytest.approx(getattr(sr, f), rel=0.02), f
        assert br.left_slope_percent_mm == pytest.approx(
            sr.left_slope_percent_mm, abs=0.02)
        assert br.top_slope_percent_mm == pytest.approx(
            sr.top_slope_percent_mm, abs=0.02)


def test_batch_field_size_accuracy(field_files):
    """Absolute accuracy: simulator ground truth (100 & 120/80 mm fields)."""
    from pylinac_tpu.field_analysis import analyze_field_batch

    results = analyze_field_batch(field_files, edge_detection_method="FWHM")
    assert results[0].field_size_vertical_mm == pytest.approx(100, abs=0.5)
    assert results[0].field_size_horizontal_mm == pytest.approx(100, abs=0.5)
    assert results[1].field_size_vertical_mm == pytest.approx(120, abs=0.5)
    assert results[1].field_size_horizontal_mm == pytest.approx(80, abs=0.5)


def test_batch_fff_top(tmp_path):
    """FFF beam: the 'top' parabola is well-conditioned — tight parity +
    ground-truth check (top at the field center)."""
    from pylinac_tpu.field_analysis import FieldAnalysis, analyze_field_batch
    from pylinac_tpu.imggen.layers import (
        FilterFreeFieldLayer,
        GaussianFilterLayer,
    )
    from pylinac_tpu.imggen.simulators import AS1000Image

    path = str(tmp_path / "fff.dcm")
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilterFreeFieldLayer(field_size_mm=(100, 100)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    sim.generate_dicom(path)

    br = analyze_field_batch(
        [path], is_FFF=True, edge_detection_method="Inflection Derivative")[0]
    fa = FieldAnalysis(path)
    fa.analyze(is_FFF=True, edge_detection_method="Inflection Derivative")
    sr = fa.results_data()
    assert br.top_vertical_distance_from_cax_mm == pytest.approx(
        sr.top_vertical_distance_from_cax_mm, abs=0.01)
    assert br.top_horizontal_distance_from_cax_mm == pytest.approx(
        sr.top_horizontal_distance_from_cax_mm, abs=0.01)
    # ground truth: centered beam -> top at CAX
    assert abs(br.top_vertical_distance_from_cax_mm) < 1.0
    assert abs(br.top_horizontal_distance_from_cax_mm) < 1.0


def test_batch_rejects_cubic_interpolation(field_files):
    from pylinac_tpu.field_analysis import FieldAnalysisBatch

    batch = FieldAnalysisBatch(field_files)
    with pytest.raises(ValueError, match="LINEAR"):
        batch.analyze(interpolation="Spline")
