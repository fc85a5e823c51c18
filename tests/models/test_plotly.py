"""Structural tests for plotly_analyzed_images() on the big-five modules.

Figures are plotly JSON-schema objects (``core/plotly_utils.py``), mirroring
the reference's per-class plotly API (``/root/reference/pylinac/core/
plotly_utils.py:1`` and ``plotly_analyzed_images`` on each L4 class). With
plotly absent we assert the schema structurally: dict keys, trace types,
JSON-round-trip.
"""

import json

import numpy as np
import pytest

from pylinac_tpu.core.plotly_utils import Figure


def _check_figs(figs, expected_keys, min_traces=1):
    for key in expected_keys:
        assert key in figs, f"missing figure {key!r}: has {list(figs)}"
    for name, fig in figs.items():
        assert isinstance(fig, Figure)
        d = fig.to_dict()
        assert isinstance(d["data"], list) and isinstance(d["layout"], dict)
        json.dumps(d)  # fully serializable
    assert sum(len(f.data) for f in figs.values()) >= min_traces


def test_figure_shim_layout_and_export(tmp_path):
    fig = Figure()
    fig.add_trace({"type": "scatter", "x": np.arange(3), "y": np.arange(3)})
    fig.update_layout(xaxis_title="t", showlegend=False)
    assert fig.layout["xaxis"]["title"] == "t"
    assert fig.layout["showlegend"] is False
    d = fig.to_dict()
    assert d["data"][0]["x"] == [0, 1, 2]
    path = tmp_path / "fig.html"
    fig.write_html(path)
    html = path.read_text()
    assert "Plotly.newPlot" in html and "plotly-2" in html


def test_set_axis_range_reversed_image_axis():
    from pylinac_tpu.core.plotly_utils import image_figure, set_axis_range

    fig = image_figure(np.zeros((5, 5)))
    assert fig.layout["yaxis"]["autorange"] == "reversed"
    set_axis_range(fig, x=[0, 4], y=[1, 3])
    assert fig.layout["yaxis"]["range"] == [3, 1]  # keeps image direction
    assert fig.layout["xaxis"]["range"] == [0, 4]


def test_picketfence_plotly(tmp_path):
    from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer
    from pylinac_tpu.imggen.simulators import AS1200Image
    from pylinac_tpu.imggen.utils import generate_picketfence
    from pylinac_tpu.picketfence import PicketFence

    path = str(tmp_path / "pf.dcm")
    generate_picketfence(
        simulator=AS1200Image(sid=1500), field_layer=PerfectFieldLayer,
        file_out=path, final_layers=[GaussianFilterLayer(sigma_mm=1)],
        pickets=5, picket_spacing_mm=30, picket_width_mm=3)
    pf = PicketFence(path)
    pf.analyze()
    figs = pf.plotly_analyzed_images(show=False)
    _check_figs(figs, ["Picket Fence", "Histogram"], min_traces=5)
    assert figs["Picket Fence"].data[0]["type"] == "heatmap"
    assert figs["Histogram"].data[0]["type"] == "histogram"
    # tolerance guide lines present
    assert len(figs["Histogram"].layout["shapes"]) == 2


def test_starshot_plotly(tmp_path):
    from pylinac_tpu.starshot import Starshot
    from tests.models.test_starshot import make_starshot

    p = make_starshot(tmp_path)
    star = Starshot(p)
    star.analyze()
    figs = star.plotly_analyzed_images(show=False)
    _check_figs(figs, ["Image", "Wobble"], min_traces=6)
    # the zoomed figure pins axis ranges around the wobble
    assert "range" in figs["Wobble"].layout["xaxis"]


def test_vmat_plotly(tmp_path):
    from pylinac_tpu.vmat import DRGS
    from tests.models.test_vmat import make_drgs_pair

    drgs = DRGS(image_paths=make_drgs_pair(tmp_path))
    drgs.analyze()
    figs = drgs.plotly_analyzed_images(show=False)
    _check_figs(figs, ["Open", "DMLC", "Median Profiles"], min_traces=4)
    assert len(figs["Open"].layout["shapes"]) == 7  # 7 DRGS segments


def test_field_analysis_plotly(tmp_path):
    from pylinac_tpu.field_analysis import FieldAnalysis
    from pylinac_tpu.imggen.layers import FilteredFieldLayer, GaussianFilterLayer
    from pylinac_tpu.imggen.simulators import AS1000Image

    path = str(tmp_path / "field.dcm")
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    sim.generate_dicom(path)
    fa = FieldAnalysis(path)
    fa.analyze()
    figs = fa.plotly_analyzed_images(show=False)
    _check_figs(figs, ["Image", "Vertical Profile", "Horizontal Profile"],
                min_traces=3)
    # strip-location guide lines on the image
    assert len(figs["Image"].layout["shapes"]) == 2


def test_winston_lutz_plotly(tmp_path):
    from pylinac_tpu.winston_lutz import WinstonLutz
    from tests.models.test_winstonlutz import _make_set

    d = _make_set(tmp_path, image_axes=((0, 0, 0), (90, 0, 0), (180, 0, 0),
                                        (270, 0, 0)))
    wl = WinstonLutz(d)
    wl.analyze()
    figs = wl.plotly_analyzed_images(show=False)
    assert "Isocenter Visualization" in figs
    img_figs = [k for k in figs if k != "Isocenter Visualization"]
    assert len(img_figs) == 4
    _check_figs(figs, img_figs, min_traces=8)
    types = {t["type"] for t in figs["Isocenter Visualization"].data}
    assert types & {"scatter3d", "surface"}


def test_unanalyzed_raises(tmp_path):
    from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer
    from pylinac_tpu.imggen.simulators import AS1200Image
    from pylinac_tpu.imggen.utils import generate_picketfence
    from pylinac_tpu.picketfence import PicketFence

    path = str(tmp_path / "pf.dcm")
    generate_picketfence(
        simulator=AS1200Image(sid=1500), field_layer=PerfectFieldLayer,
        file_out=path, final_layers=[GaussianFilterLayer(sigma_mm=1)],
        pickets=5, picket_spacing_mm=30, picket_width_mm=3)
    pf = PicketFence(path)
    with pytest.raises(RuntimeError):
        pf.plotly_analyzed_images(show=False)


def test_planar_imaging_plotly(tmp_path):
    """QC-3 plotly figures via the synthetic phantom machinery."""
    import json

    from tests.models.test_planar_imaging import _make_qc3_image
    from pylinac_tpu.planar_imaging import StandardImagingQC3

    path = str(tmp_path / "qc3.dcm")
    _make_qc3_image(path)
    qc3 = StandardImagingQC3(path)
    qc3.analyze()
    figs = qc3.plotly_analyzed_images(show=False)
    assert "Image" in figs and "Low Contrast" in figs and "High Contrast" in figs
    for f in figs.values():
        json.dumps(f.to_dict())
    assert len(figs["Image"].layout["shapes"]) > 5  # outline + ROI circles


def test_field_profile_plotly(tmp_path):
    import json

    from pylinac_tpu.field_profile_analysis import FieldProfileAnalysis
    from pylinac_tpu.imggen.layers import FilteredFieldLayer, GaussianFilterLayer
    from pylinac_tpu.imggen.simulators import AS1000Image

    path = str(tmp_path / "f.dcm")
    sim = AS1000Image(sid=1000)
    sim.add_layer(FilteredFieldLayer(field_size_mm=(100, 100)))
    sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    sim.generate_dicom(path)
    fpa = FieldProfileAnalysis(path)
    fpa.analyze()
    figs = fpa.plotly_analyzed_images(show=False)
    assert set(figs) == {"X Profile", "Y Profile", "Image"}
    for f in figs.values():
        json.dumps(f.to_dict())
    assert len(figs["Image"].layout["shapes"]) == 3
