"""Winston-Lutz e2e tests on generated image sets with known BB offsets —
mirrors the reference's synthetic benchmarking strategy."""

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import GaussianFilterLayer, PerfectFieldLayer
from pylinac_tpu.imggen.simulators import AS1200Image
from pylinac_tpu.imggen.utils import generate_winstonlutz

AXES_8 = ((0, 0, 0), (45, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0),
          (0, 45, 0), (0, 90, 0), (0, 0, 45), (0, 0, 90))


def _make_set(tmp_path, **kwargs):
    d = str(tmp_path / "wl_set")
    generate_winstonlutz(
        simulator=AS1200Image(sid=1000),
        field_layer=PerfectFieldLayer,
        final_layers=[GaussianFilterLayer(sigma_mm=1)],
        dir_out=d,
        **kwargs,
    )
    return d


def test_perfect_wl(tmp_path):
    from pylinac_tpu import WinstonLutz

    d = _make_set(tmp_path, image_axes=AXES_8)
    wl = WinstonLutz(d)
    wl.analyze(bb_size_mm=5)
    data = wl.results_data()
    assert data.max_2d_cax_to_bb_mm < 0.25
    assert data.gantry_3d_iso_diameter_mm < 0.3
    assert data.coll_2d_iso_diameter_mm < 0.3
    assert data.couch_2d_iso_diameter_mm < 0.3
    sv = data.bb_shift_vector
    assert abs(sv["x"]) < 0.2 and abs(sv["y"]) < 0.2 and abs(sv["z"]) < 0.2


def test_offset_bb_left(tmp_path):
    from pylinac_tpu import WinstonLutz

    d = _make_set(tmp_path, offset_mm_left=2, image_axes=((0, 0, 0), (90, 0, 0),
                                                          (180, 0, 0), (270, 0, 0)))
    wl = WinstonLutz(d)
    wl.analyze(bb_size_mm=5)
    sv = wl.bb_shift_vector
    # BB is 2mm left; shift instruction should be RIGHT 2mm (x=+2)
    assert abs(sv.x - 2) < 0.3
    assert abs(sv.y) < 0.3
    assert abs(sv.z) < 0.3
    assert abs(wl.cax2bb_distance("max") - 2) < 0.3


def test_offset_bb_up_and_in(tmp_path):
    from pylinac_tpu import WinstonLutz

    d = _make_set(tmp_path, offset_mm_up=3, offset_mm_in=1,
                  image_axes=((0, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0)))
    wl = WinstonLutz(d)
    wl.analyze(bb_size_mm=5)
    sv = wl.bb_shift_vector
    assert abs(sv.z + 3) < 0.3  # BB is UP 3 → shift DOWN (z=-3)
    assert abs(sv.y + 1) < 0.3  # BB is IN 1 → shift OUT (y=-1)


def test_gantry_sag(tmp_path):
    from pylinac_tpu import WinstonLutz

    d = _make_set(tmp_path, gantry_sag=1.0,
                  image_axes=((0, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0)))
    wl = WinstonLutz(d)
    wl.analyze(bb_size_mm=5)
    # 1mm sag: gantry iso should be ~2mm diameter
    assert 1.0 < wl.gantry_iso_size < 2.6


def test_2d_image(tmp_path):
    from pylinac_tpu import WinstonLutz2D

    d = _make_set(tmp_path, offset_mm_left=1, image_axes=((0, 0, 0),))
    import os
    f = os.path.join(d, os.listdir(d)[0])
    wl2d = WinstonLutz2D(f)
    wl2d.analyze(bb_size_mm=5)
    data = wl2d.results_data()
    assert abs(data.cax2bb_distance - 1) < 0.3
    assert data.variable_axis == "Reference"


def test_results_and_outputs(tmp_path):
    from pylinac_tpu import WinstonLutz

    d = _make_set(tmp_path, image_axes=((0, 0, 0), (90, 0, 0), (180, 0, 0), (270, 0, 0)))
    wl = WinstonLutz(d)
    wl.analyze(bb_size_mm=5)
    s = wl.results()
    assert "Winston-Lutz Analysis" in s
    d2 = wl.results_data(as_dict=True)
    assert "max_2d_cax_to_bb_mm" in d2
    assert len(d2["image_details"]) == 4
    pdf_out = tmp_path / "wl.pdf"
    wl.publish_pdf(pdf_out)
    assert pdf_out.read_bytes().startswith(b"%PDF")


def test_couch_kick_iso(tmp_path):
    from pylinac_tpu import WinstonLutz

    d = _make_set(tmp_path, image_axes=((0, 0, 0), (0, 0, 45), (0, 0, 90),
                                        (0, 0, 315)))
    wl = WinstonLutz(d)
    wl.analyze(bb_size_mm=5)
    assert wl.couch_iso_size < 0.4
