"""Reference-data parity tier: the literal demo-dataset goldens.

These transcribe the reference library's own demo regression values
(BASELINE.md §A; sources cited per test) and run them against the public
demo files fetched from the pylinac demo bucket.  The bucket requires
network egress, which most CI/build environments here do not have — each
test downloads lazily and SKIPS cleanLY when the bucket is unreachable.
To run offline, pre-seed ``~/.pylinac_tpu/demo_files`` with the files.

Run just this tier with ``pytest -m demo_parity``.

Tolerances are the reference's own test deltas, not ours:
``/root/reference/tests_basic/test_cbct.py:500-545`` (HU/unif delta=5,
line length 0.1, roll 0.3, thickness 0.3), ``test_picketfence.py:612-618``
(max/median error delta=0.05), ``test_starshot.py:180-195`` (wobble
delta=tolerance, center delta=3), ``test_winstonlutz.py:1160-1196``
(iso sizes delta=0.15, cax2bb max 0.15 / median 0.1 / mean 0.1).
"""
from __future__ import annotations

import socket

import pytest

pytestmark = pytest.mark.demo_parity

_BUCKET_HOST = "storage.googleapis.com"


def _offline() -> bool:
    try:
        socket.create_connection((_BUCKET_HOST, 443), timeout=3).close()
        return False
    except OSError:
        return True


def _demo(name: str):
    """Fetch a demo file, skipping the test when the bucket is unreachable."""
    if _offline():
        pytest.skip(f"demo bucket {_BUCKET_HOST} unreachable (offline env)")
    from pylinac_tpu.core.io import retrieve_demo_file

    try:
        return retrieve_demo_file(name)
    except OSError as exc:  # partial egress: DNS ok, fetch blocked
        pytest.skip(f"demo file {name} could not be fetched: {exc}")


# ---------------------------------------------------------------------------
# Starshot demo (reference tests_basic/test_starshot.py:228-239)
# ---------------------------------------------------------------------------
class TestStarshotDemo:
    @pytest.fixture(scope="class")
    def star(self):
        from pylinac_tpu.starshot import Starshot

        star = Starshot(_demo("starshot.tif"), sid=1000)
        star.analyze()
        return star

    def test_wobble_diameter(self, star):
        assert star.wobble.diameter_mm == pytest.approx(0.30, abs=0.15)

    def test_wobble_center(self, star):
        assert star.wobble.center.x == pytest.approx(1270, abs=3)
        assert star.wobble.center.y == pytest.approx(1437, abs=3)

    def test_num_lines(self, star):
        assert len(star.lines) == 4


# ---------------------------------------------------------------------------
# PicketFence demo (reference tests_basic/test_picketfence.py:668-678)
# ---------------------------------------------------------------------------
class TestPicketFenceDemo:
    @pytest.fixture(scope="class")
    def pf(self):
        from pylinac_tpu.picketfence import PicketFence

        pf = PicketFence(_demo("AS1200.dcm"))
        pf.analyze()
        return pf

    def test_max_error(self, pf):
        assert pf.max_error == pytest.approx(0.08, abs=0.05)

    def test_abs_median_error(self, pf):
        assert pf.abs_median_error == pytest.approx(0.06, abs=0.05)

    def test_max_error_location(self, pf):
        assert pf.max_error_picket == 0
        assert pf.max_error_leaf == 29


# ---------------------------------------------------------------------------
# VMAT demos (reference tests_basic/test_vmat.py:321-360)
# ---------------------------------------------------------------------------
class TestVMATDemos:
    def test_drgs(self):
        from pylinac_tpu.vmat import DRGS

        drgs = DRGS.from_zip(_demo("drgs.zip"))
        drgs.analyze()
        assert drgs.avg_abs_r_deviation == pytest.approx(0.74, abs=0.1)
        assert drgs.max_r_deviation == pytest.approx(1.8, abs=0.2)
        assert drgs.segments[0].r_dev == pytest.approx(0.965, abs=0.1)
        assert drgs.segments[0].r_corr == pytest.approx(6.2, abs=0.3)

    def test_drmlc(self):
        from pylinac_tpu.vmat import DRMLC

        drmlc = DRMLC.from_zip(_demo("drmlc.zip"))
        drmlc.analyze()
        assert drmlc.avg_abs_r_deviation == pytest.approx(0.44, abs=0.1)
        assert drmlc.max_r_deviation == pytest.approx(0.89, abs=0.15)


# ---------------------------------------------------------------------------
# CatPhan504 demo (reference tests_basic/test_cbct.py:555-575)
# ---------------------------------------------------------------------------
class TestCatPhan504Demo:
    HU_VALUES = {"Poly": -45, "Acrylic": 117, "Delrin": 341, "Air": -998,
                 "Teflon": 997, "PMP": -200, "LDPE": -103}
    UNIF_VALUES = {"Center": 17, "Left": 10, "Right": 0, "Top": 6, "Bottom": 6}

    @pytest.fixture(scope="class")
    def cbct(self):
        from pylinac_tpu.ct import CatPhan504

        cbct = CatPhan504.from_zip(_demo("CatPhan504.zip"))
        cbct.analyze()
        return cbct

    def test_roll_and_origin(self, cbct):
        assert cbct.catphan_roll == pytest.approx(-0.3, abs=0.3)
        assert cbct.origin_slice == pytest.approx(32, abs=1)

    def test_hu_values(self, cbct):
        for key, value in self.HU_VALUES.items():
            assert cbct.ctp404.rois[key].pixel_value == pytest.approx(
                value, abs=5), key

    def test_uniformity(self, cbct):
        for key, value in self.UNIF_VALUES.items():
            assert cbct.ctp486.rois[key].pixel_value == pytest.approx(
                value, abs=5), key

    def test_mtf50(self, cbct):
        assert cbct.ctp528.mtf.relative_resolution(50) == pytest.approx(
            0.56, abs=0.1)

    def test_geometry_and_thickness(self, cbct):
        assert cbct.ctp404.avg_line_length == pytest.approx(49.92, abs=0.1)
        assert cbct.ctp404.meas_slice_thickness == pytest.approx(2.5, abs=0.3)

    def test_low_contrast_visible(self, cbct):
        assert cbct.ctp515.rois_visible == pytest.approx(3, abs=1)


# ---------------------------------------------------------------------------
# Winston-Lutz demo (reference tests_basic/test_winstonlutz.py:1525-1537)
# ---------------------------------------------------------------------------
class TestWinstonLutzDemo:
    @pytest.fixture(scope="class")
    def wl(self):
        from pylinac_tpu.winston_lutz import WinstonLutz

        wl = WinstonLutz.from_zip(_demo("winston_lutz.zip"))
        wl.analyze(machine_scale="Varian IEC")
        return wl

    def test_num_images(self, wl):
        assert len(wl.images) == 17

    def test_iso_sizes(self, wl):
        assert wl.gantry_iso_size == pytest.approx(1.0, abs=0.15)
        assert wl.collimator_iso_size == pytest.approx(1.2, abs=0.15)
        assert wl.couch_iso_size == pytest.approx(2.3, abs=0.15)

    def test_cax2bb_distances(self, wl):
        assert wl.cax2bb_distance(metric="max") == pytest.approx(1.2, abs=0.15)
        assert wl.cax2bb_distance(metric="median") == pytest.approx(0.7, abs=0.1)
        assert wl.cax2bb_distance(metric="mean") == pytest.approx(0.6, abs=0.1)

    def test_bb_shift_vector(self, wl):
        v = wl.bb_shift_vector
        assert v.x == pytest.approx(0.0, abs=0.15)
        assert v.y == pytest.approx(-0.25, abs=0.15)
        assert v.z == pytest.approx(-0.2, abs=0.15)


# ---------------------------------------------------------------------------
# FieldAnalysis demo (reference tests_basic/test_field_analysis.py:536-544)
# ---------------------------------------------------------------------------
class TestFieldAnalysisDemo:
    @pytest.fixture(scope="class")
    def fa(self):
        from pylinac_tpu.field_analysis import FieldAnalysis

        fa = FieldAnalysis(_demo("flatsym_demo.dcm"))
        fa.analyze()
        return fa

    def test_flatness_symmetry(self, fa):
        data = fa.results_data()
        assert data.protocol_results["flatness_vertical"] == pytest.approx(
            1.45, abs=0.15)
        assert data.protocol_results["symmetry_vertical"] == pytest.approx(
            -0.4, abs=0.15)

    def test_field_size(self, fa):
        data = fa.results_data()
        assert data.field_size_vertical_mm == pytest.approx(99.5, abs=0.3)
        assert data.field_size_horizontal_mm == pytest.approx(99.5, abs=0.3)
