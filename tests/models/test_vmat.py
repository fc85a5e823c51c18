"""VMAT e2e tests on generated open/DMLC pairs with known segment intensities."""

import numpy as np
import pytest

from pylinac_tpu.core import dcm
from pylinac_tpu.core.array_utils import array_to_dicom
from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer
from pylinac_tpu.imggen.simulators import AS1000Image


def _save(sim, tmp_path, name):
    p = tmp_path / name
    sim.generate_dicom(str(p))
    return str(p)


def make_drgs_pair(tmp_path, roi_errors=(0, 0, 0, 0, 0, 0, 0)):
    """Create open + DMLC images. DMLC has 7 vertical segments; optional
    per-segment intensity errors (%)."""
    open_sim = AS1000Image(sid=1500)
    open_sim.add_layer(PerfectFieldLayer(field_size_mm=(150, 170)))
    open_sim.add_layer(GaussianFilterLayer(sigma_mm=1))

    dmlc_sim = AS1000Image(sid=1500)
    for offset, err in zip((-60, -40, -20, 0, 20, 40, 60), roi_errors):
        dmlc_sim.add_layer(PerfectFieldLayer(
            field_size_mm=(150, 15), cax_offset_mm=(0, offset),
            alpha=0.5 * (1 + err / 100)))
    dmlc_sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    p_open = _save(open_sim, tmp_path, "open.dcm")
    p_dmlc = _save(dmlc_sim, tmp_path, "dmlc.dcm")
    return [p_open, p_dmlc]


def test_perfect_drgs(tmp_path):
    from pylinac_tpu import DRGS

    paths = make_drgs_pair(tmp_path)
    drgs = DRGS(image_paths=paths)
    drgs.analyze(tolerance=1.5)
    data = drgs.results_data()
    assert data.passed
    assert data.max_deviation_percent < 0.3
    assert len(data.segment_data) == 7


def test_drgs_detects_bad_segment(tmp_path):
    from pylinac_tpu import DRGS

    paths = make_drgs_pair(tmp_path, roi_errors=(0, 0, 3, 0, 0, 0, 0))
    drgs = DRGS(image_paths=paths)
    drgs.analyze(tolerance=1.5)
    data = drgs.results_data()
    assert not data.passed
    # segment 2 (0-based) should have ~+2.5% deviation (3% local vs mean)
    devs = [s.r_dev for s in data.segment_data]
    assert abs(devs[2] - max(devs)) < 1e-9
    assert 1.5 < devs[2] < 3.5


def test_image_identification_swap(tmp_path):
    from pylinac_tpu import DRGS

    paths = make_drgs_pair(tmp_path)
    drgs = DRGS(image_paths=[paths[1], paths[0]])  # reversed order
    drgs.analyze()
    assert drgs.results_data().passed


def make_drmlc_pair(tmp_path):
    open_sim = AS1000Image(sid=1500)
    open_sim.add_layer(PerfectFieldLayer(field_size_mm=(150, 130)))
    open_sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    dmlc_sim = AS1000Image(sid=1500)
    for offset in (-45, -15, 15, 45):
        dmlc_sim.add_layer(PerfectFieldLayer(
            field_size_mm=(150, 22), cax_offset_mm=(0, offset), alpha=0.5))
    dmlc_sim.add_layer(GaussianFilterLayer(sigma_mm=1))
    return [_save(open_sim, tmp_path, "open.dcm"),
            _save(dmlc_sim, tmp_path, "dmlc.dcm")]


def test_perfect_drmlc(tmp_path):
    from pylinac_tpu import DRMLC

    paths = make_drmlc_pair(tmp_path)
    vmat = DRMLC(image_paths=paths)
    vmat.analyze(tolerance=1.5)
    data = vmat.results_data()
    assert data.passed
    assert len(data.segment_data) == 4
    assert data.max_deviation_percent < 0.3
    assert "Dose Rate & MLC Speed" in vmat.results()


def test_results_outputs(tmp_path):
    from pylinac_tpu import DRGS

    paths = make_drgs_pair(tmp_path)
    drgs = DRGS(image_paths=paths)
    drgs.analyze()
    d = drgs.results_data(as_dict=True)
    assert "max_deviation_percent" in d
    drgs.publish_pdf(tmp_path / "drgs.pdf")
    assert (tmp_path / "drgs.pdf").read_bytes().startswith(b"%PDF")
