"""CatPhan e2e tests on a synthetic CatPhan 504 stack with exact ground truth."""

import numpy as np
import pytest

from pylinac_tpu.imggen.ct import generate_catphan504


@pytest.fixture(scope="module")
def catphan_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("catphan")
    generate_catphan504(tmp, num_slices=60, slice_thickness_mm=2.5)
    return str(tmp)


@pytest.fixture(scope="module")
def analyzed_ct(catphan_dir):
    from pylinac_tpu import CatPhan504

    ct = CatPhan504(catphan_dir)
    ct.analyze()
    return ct


def test_origin_slice(analyzed_ct):
    # z=0 is at slice index 30 (num_slices/2)
    assert abs(analyzed_ct.origin_slice - 30) <= 1


def test_roll_detection(analyzed_ct):
    assert abs(analyzed_ct.catphan_roll) < 0.7


def test_hu_linearity(analyzed_ct):
    data = analyzed_ct.results_data()
    rois = data.ctp404.hu_rois
    expected = {"Air": -1000, "PMP": -196, "LDPE": -104, "Poly": -47,
                "Acrylic": 115, "Delrin": 365, "Teflon": 1000}
    for name, nominal in expected.items():
        assert abs(rois[name].value - nominal) < 12, f"{name}: {rois[name].value}"
    assert data.ctp404.hu_linearity_passed


def test_geometry_nodes(analyzed_ct):
    data = analyzed_ct.results_data()
    assert abs(data.ctp404.avg_line_distance_mm - 50) < 0.5
    assert data.ctp404.geometry_passed


def test_slice_thickness(analyzed_ct):
    data = analyzed_ct.results_data()
    assert abs(data.ctp404.measured_slice_thickness_mm - 2.5) < 0.6


def test_uniformity(analyzed_ct):
    data = analyzed_ct.results_data()
    assert data.ctp486 is not None
    for roi in data.ctp486.rois.values():
        assert abs(roi.value) < 10
    assert data.ctp486.passed


def test_low_contrast_seen(analyzed_ct):
    data = analyzed_ct.results_data()
    assert data.ctp515 is not None
    # 10 HU bubbles with 3 HU noise: at least the big ones visible
    assert data.ctp515.num_rois_seen >= 2


def test_mtf_computed(analyzed_ct):
    data = analyzed_ct.results_data()
    assert data.ctp528 is not None
    mtf50 = data.ctp528.mtf_lp_mm[50]
    assert 0.1 < mtf50 < 1.5


def test_results_str_and_pdf(analyzed_ct, tmp_path):
    s = analyzed_ct.results()
    assert "CTP 404 Results" in s
    analyzed_ct.publish_pdf(tmp_path / "ct.pdf")
    assert (tmp_path / "ct.pdf").read_bytes().startswith(b"%PDF")


def test_rolled_phantom(tmp_path):
    from pylinac_tpu import CatPhan504

    generate_catphan504(tmp_path, num_slices=60, roll_deg=2.0)
    ct = CatPhan504(str(tmp_path))
    ct.analyze()
    assert abs(ct.catphan_roll - 2.0) < 0.7
    data = ct.results_data()
    assert data.ctp404.hu_linearity_passed


def test_catphan_plotly(analyzed_ct):
    """Structural check of the plotly-schema figures (reference ct.py:2150)."""
    import json

    figs = analyzed_ct.plotly_analyzed_images(show=False)
    for key in ("CTP404", "HU Linearity", "CTP486", "CTP528", "MTF", "CTP515"):
        assert key in figs, f"missing {key}: has {list(figs)}"
    for fig in figs.values():
        json.dumps(fig.to_dict())
    assert figs["CTP404"].data[0]["type"] == "heatmap"
    assert len(figs["CTP404"].layout["shapes"]) >= 7  # HU ROIs
    assert figs["MTF"].data[0]["type"] == "scatter"


def test_catphan_batch_matches_single(catphan_dir, tmp_path_factory):
    """CatPhanBatch: one fused localization dispatch for multiple scans;
    per-scan results identical to individual analyzes."""
    from pylinac_tpu import CatPhan504
    from pylinac_tpu.ct import CatPhanBatch

    tmp2 = tmp_path_factory.mktemp("catphan2")
    generate_catphan504(tmp2, num_slices=60, slice_thickness_mm=2.5)

    batch = CatPhanBatch([catphan_dir, str(tmp2)])
    batch.analyze()
    results = batch.results_data()
    assert len(results) == 2

    single = CatPhan504(catphan_dir)
    single.analyze()
    sd = single.results_data()
    bd = results[0]
    assert bd.ctp404.measured_slice_thickness_mm == pytest.approx(
        sd.ctp404.measured_slice_thickness_mm, abs=1e-6)
    for name, roi in sd.ctp404.hu_rois.items():
        assert bd.ctp404.hu_rois[name].value == pytest.approx(roi.value, abs=1e-6)
    assert batch.cts[0].origin_slice == single.origin_slice
    assert batch.cts[0].catphan_roll == pytest.approx(single.catphan_roll, abs=1e-6)


def test_batch_mtf_prepass_matches_sequential(catphan_dir, tmp_path_factory):
    """CatPhanBatch seeds CTP528 MTF via the row-batched peaks pre-pass;
    values must equal the lazy per-scan path exactly."""
    import numpy as np

    from pylinac_tpu.ct import CatPhanBatch

    tmp2 = tmp_path_factory.mktemp("catphan_mtf2")
    generate_catphan504(tmp2, num_slices=60, slice_thickness_mm=2.5)
    batch = CatPhanBatch([catphan_dir, str(tmp2)])
    batch.analyze()
    for ct in batch.cts:
        m = ct.ctp528
        assert "mtf" in m.__dict__  # pre-pass ran
        seeded_max = list(m.mtf.maximums)
        seeded_min = list(m.mtf.minimums)
        del m.__dict__["mtf"]
        lazy = m.mtf  # sequential recompute
        np.testing.assert_array_equal(seeded_max, list(lazy.maximums))
        np.testing.assert_array_equal(seeded_min, list(lazy.minimums))
