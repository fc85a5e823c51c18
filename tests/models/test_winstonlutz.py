"""Winston-Lutz e2e tests on generated image sets with known BB offsets —
mirrors the reference's synthetic benchmarking strategy."""

import numpy as np
import pytest

from pylinac_tpu.winston_lutz import WinstonLutz
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


class TestFromCBCT:
    """4-angle WL from a CBCT BB scan (reference winston_lutz.py:1445)."""

    @pytest.fixture(scope="class")
    def cbct_dir(self, tmp_path_factory):
        from pylinac_tpu.core import dcm
        from pylinac_tpu.core.array_utils import array_to_dicom

        d = tmp_path_factory.mktemp("cbct")
        nz, ny, nx = 80, 256, 256
        px_mm, slice_mm = 0.5, 1.0
        bb_r_mm = 2.5
        off_x_mm, off_y_mm, off_z_mm = 2.0, -1.0, 3.0
        cy, cx, cz = (ny - 1) / 2, (nx - 1) / 2, (nz - 1) / 2
        vol = np.full((nz, ny, nx), -1000.0)
        yy, xx = np.mgrid[:ny, :nx]
        for z in range(nz):
            dz_mm = (z - cz) * slice_mm - off_z_mm
            r2_mm = bb_r_mm**2 - dz_mm**2
            if r2_mm > 0:
                mask = ((yy - cy - off_y_mm / px_mm) ** 2 +
                        (xx - cx - off_x_mm / px_mm) ** 2) * px_mm**2 <= r2_mm
                vol[z][mask] = 8000.0
        vol += np.random.default_rng(0).normal(0, 5, vol.shape)
        series = dcm.generate_uid()
        for z in range(nz):
            u16 = np.clip(vol[z] + 1024, 0, 65535).astype(np.uint16)
            ds = array_to_dicom(
                u16, sid=1000, gantry=0, coll=0, couch=0, dpi=25.4 / px_mm,
                extra_tags={
                    "SeriesInstanceUID": series,
                    "ImagePositionPatient": [0.0, 0.0, float(z * slice_mm)],
                    "SliceThickness": slice_mm,
                    "PixelSpacing": [px_mm, px_mm],
                    "RescaleSlope": 1.0, "RescaleIntercept": -1024.0,
                    "Modality": "CT"})
            dcm.dcmwrite(d / f"{z:03d}.dcm", ds)
        return d

    def test_four_views_and_shift(self, cbct_dir):
        wl = WinstonLutz.from_cbct(cbct_dir)
        assert wl.is_from_cbct
        assert len(wl.images) == 4
        wl.analyze(bb_size_mm=5)
        data = wl.results_data()
        # planted offset (x=2, y=-1, z=3) -> max 2D distance sqrt(2^2+3^2)
        assert data.max_2d_cax_to_bb_mm == pytest.approx(3.61, abs=0.2)
        sv = wl.bb_shift_vector
        assert sv.x == pytest.approx(1.0, abs=0.2)
        assert sv.y == pytest.approx(-3.0, abs=0.2)
        assert sv.z == pytest.approx(-2.0, abs=0.2)

    def test_too_few_slices(self, tmp_path):
        with pytest.raises((ValueError, FileNotFoundError)):
            WinstonLutz.from_cbct(tmp_path)


class TestMultiTargetMultiField:
    """MTMF WL on a generated multi-BB/multi-field set
    (reference winston_lutz.py:2804)."""

    @pytest.fixture(scope="class")
    def mtmf_dir(self, tmp_path_factory):
        from pylinac_tpu.imggen.utils import generate_winstonlutz_multi_bb_multi_field

        d = str(tmp_path_factory.mktemp("mtmf"))
        arrangement = [
            {"offset_left_mm": 0, "offset_up_mm": 0, "offset_in_mm": 0},
            {"offset_left_mm": -20, "offset_up_mm": 0, "offset_in_mm": 30},
        ]
        generate_winstonlutz_multi_bb_multi_field(
            simulator=AS1200Image(sid=1000),
            field_layer=PerfectFieldLayer,
            dir_out=d,
            field_offsets=[(0, 0, 0), (-20, 0, 30)],
            bb_offsets=arrangement,
            final_layers=[GaussianFilterLayer(sigma_mm=1)],
        )
        return d, arrangement

    def test_perfect_set_zero_error(self, mtmf_dir):
        from pylinac_tpu.winston_lutz import BBConfig, WinstonLutzMultiTargetMultiField

        d, arrangement = mtmf_dir
        arr = tuple(BBConfig(name=str(i), bb_size_mm=5, rad_size_mm=20, **a)
                    for i, a in enumerate(arrangement))
        wl = WinstonLutzMultiTargetMultiField(d)
        wl.analyze(bb_arrangement=arr)
        data = wl.results_data()
        assert data.num_total_images == 4
        assert data.max_2d_field_to_bb_mm == pytest.approx(0, abs=0.3)
        assert "Winston-Lutz" in wl.results()

    def test_offset_bb_detected(self, tmp_path):
        """Shift every BB 1mm left of its field: max distance ~1mm."""
        from pylinac_tpu.imggen.utils import generate_winstonlutz_multi_bb_multi_field
        from pylinac_tpu.winston_lutz import BBConfig, WinstonLutzMultiTargetMultiField

        d = str(tmp_path / "mtmf2")
        generate_winstonlutz_multi_bb_multi_field(
            simulator=AS1200Image(sid=1000),
            field_layer=PerfectFieldLayer,
            dir_out=d,
            field_offsets=[(0, 0, 0), (-20, 0, 30)],
            bb_offsets=[(1, 0, 0), (-19, 0, 30)],
            final_layers=[GaussianFilterLayer(sigma_mm=1)],
        )
        arr = (
            BBConfig(name="Iso", offset_left_mm=0, offset_up_mm=0,
                     offset_in_mm=0, bb_size_mm=5, rad_size_mm=20),
            BBConfig(name="1", offset_left_mm=-20, offset_up_mm=0,
                     offset_in_mm=30, bb_size_mm=5, rad_size_mm=20),
        )
        wl = WinstonLutzMultiTargetMultiField(d)
        wl.analyze(bb_arrangement=arr)
        data = wl.results_data()
        assert data.max_2d_field_to_bb_mm == pytest.approx(1.0, abs=0.3)
        # the shift vector should ask to move the phantom 1mm right
        assert abs(abs(data.bb_shift_vector["x"]) - 1.0) < 0.3
