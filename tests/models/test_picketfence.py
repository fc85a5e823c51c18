"""PicketFence e2e tests on generated images with known picket errors."""

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer, RandomNoiseLayer
from pylinac_tpu.imggen.simulators import AS1200Image
from pylinac_tpu.imggen.utils import generate_picketfence


@pytest.fixture(scope="module")
def perfect_pf_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pf")
    path = str(tmp / "pf.dcm")
    sim = AS1200Image(sid=1500)
    generate_picketfence(
        simulator=sim, field_layer=PerfectFieldLayer, file_out=path,
        final_layers=[GaussianFilterLayer(sigma_mm=1)],
        pickets=10, picket_spacing_mm=20, picket_width_mm=3)
    return path


def test_perfect_picketfence(perfect_pf_file):
    from pylinac_tpu import PicketFence

    pf = PicketFence(perfect_pf_file)
    pf.analyze(tolerance=0.5)
    data = pf.results_data()
    assert data.passed
    assert data.number_of_pickets == 10
    assert data.max_error_mm < 0.01  # north-star parity bar; measures ~1e-13
    assert abs(data.mean_picket_spacing_mm - 20) < 0.5
    assert data.percent_leaves_passing == 100
    assert abs(data.mlc_skew) < 0.1


def test_offset_picket_caught(tmp_path):
    from pylinac_tpu import PicketFence

    path = str(tmp_path / "pf_err.dcm")
    sim = AS1200Image(sid=1500)
    # introduce a known 0.3mm error on one picket
    generate_picketfence(
        simulator=sim, field_layer=PerfectFieldLayer, file_out=path,
        final_layers=[GaussianFilterLayer(sigma_mm=1)],
        pickets=5, picket_spacing_mm=30, picket_width_mm=3,
        picket_offset_error=[0, 0, 0.3, 0, 0])
    pf = PicketFence(path)
    pf.analyze(tolerance=0.5)
    data = pf.results_data()
    # error is at the CENTER picket; a fitted line through a uniformly-offset
    # picket has ~0 error (the fit follows the offset), so max error stays low
    # but the offsets from CAX should reflect the 0.3mm shift on picket 2
    offsets = np.array(data.offsets_from_cax_mm)
    diffs = np.abs(np.diff(offsets))
    assert abs((np.max(diffs) - np.min(diffs))) > 0.1  # the shifted picket breaks even spacing


def test_leaf_error_detection(tmp_path):
    from pylinac_tpu import PicketFence
    from pylinac_tpu.core import dcm
    from pylinac_tpu.core.image import DicomImage

    # build a perfect PF then shift a few leaf rows of one picket by 1 mm
    path = str(tmp_path / "pf_leaf.dcm")
    sim = AS1200Image(sid=1500)
    generate_picketfence(
        simulator=sim, field_layer=PerfectFieldLayer, file_out=path,
        pickets=5, picket_spacing_mm=30, picket_width_mm=3)
    img = DicomImage(path)
    arr = img.array.copy()
    # leaf rows near center: rows corresponding to ±leaf widths; shift horizontally
    dpmm = img.dpmm
    shift_px = int(round(1.0 * dpmm))  # 1mm
    rows = slice(arr.shape[0] // 2 - 20, arr.shape[0] // 2 + 20)
    center_picket_cols = slice(arr.shape[1] // 2 - 40, arr.shape[1] // 2 + 40)
    region = arr[rows, center_picket_cols]
    arr[rows, center_picket_cols] = np.roll(region, shift_px, axis=1)
    img.array = arr
    import io as _io
    buf = _io.BytesIO()
    img.save(buf)
    buf.seek(0)
    # blur AFTER the shift to soften edges
    pf = PicketFence(buf)
    pf.analyze(tolerance=0.5)
    data = pf.results_data()
    assert not data.passed
    assert data.max_error_mm > 0.5
    assert len(data.failed_leaves) >= 1
    assert data.max_error_picket == 2


def test_results_and_output(perfect_pf_file, tmp_path):
    from pylinac_tpu import PicketFence

    pf = PicketFence(perfect_pf_file)
    pf.analyze(tolerance=0.5, action_tolerance=0.25)
    s = pf.results()
    assert "Picket Fence Results" in s
    d = pf.results_data(as_dict=True)
    assert d["number_of_pickets"] == 10
    assert "picket_widths" in d
    pf.publish_pdf(tmp_path / "pf.pdf")
    assert (tmp_path / "pf.pdf").read_bytes().startswith(b"%PDF")


def test_hd_mlc(perfect_pf_file):
    from pylinac_tpu import PicketFence
    from pylinac_tpu.picketfence import MLC

    pf = PicketFence(perfect_pf_file, mlc=MLC.HD_MILLENNIUM)
    pf.analyze(tolerance=0.5)
    assert pf.results_data().max_error_mm < 0.01


def test_left_right_orientation(tmp_path):
    from pylinac_tpu import PicketFence
    from pylinac_tpu.picketfence import Orientation

    path = str(tmp_path / "pf_lr.dcm")
    sim = AS1200Image(sid=1500)
    generate_picketfence(
        simulator=sim, field_layer=PerfectFieldLayer, file_out=path,
        final_layers=[GaussianFilterLayer(sigma_mm=1)],
        pickets=5, picket_spacing_mm=30, picket_width_mm=3,
        orientation=Orientation.LEFT_RIGHT)
    pf = PicketFence(path)
    pf.analyze(tolerance=0.5)
    assert pf.orientation == Orientation.LEFT_RIGHT
    assert pf.results_data().number_of_pickets == 5
    assert pf.results_data().max_error_mm < 0.01
