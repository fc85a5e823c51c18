"""Whole-module frozen-golden regression (VERDICT r2 #6 / Missing #1).

``tests/data/module_goldens.json`` carries module-level results computed by
the *numpy/scipy reference-semantics baselines* (independent twins of the
reference pipelines, ``bench.py``; frozen by
``scripts/freeze_module_goldens.py``) on the deterministic synthetic
scenarios. Here the PRODUCT batch pipelines run on identical scenarios and
must land within the north-star parity budget (0.01 mm geometric where the
algorithms are numerically identical; documented sub-pixel bars where the
baseline intentionally simplifies — same bars as ``bench.py`` parity).

Reference golden-value pattern: ``/root/reference/tests_basic/test_cbct.py:560``,
``test_picketfence.py:668``, ``test_winstonlutz.py:1525``.
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

GOLDEN = json.loads((REPO / "tests" / "data" / "module_goldens.json").read_text())


@pytest.fixture(scope="module")
def configs():
    from scripts.freeze_module_goldens import small_configs

    return small_configs()


def test_picketfence_golden(configs):
    cfg = configs["PicketFence"]
    cfg.setup()
    cfg.batch.analyze(tolerance=0.5)
    results = cfg.batch.results_data()
    for i, want in enumerate(GOLDEN["PicketFence"]["max_error_mm"]):
        assert float(results[i].max_error_mm) == pytest.approx(want, abs=0.01)


def test_field_analysis_golden(configs):
    cfg = configs["FieldAnalysis"]
    cfg.setup()
    cfg.batch.analyze(edge_detection_method="Inflection Derivative")
    results = cfg.batch.results_data()
    g = GOLDEN["FieldAnalysis"]
    for i in range(4):
        r = results[i]
        assert float(r.field_size_vertical_mm) == pytest.approx(
            g["v_size"][i], abs=0.01)
        assert float(r.field_size_horizontal_mm) == pytest.approx(
            g["h_size"][i], abs=0.01)
        # flatness/symmetry are percent metrics; 0.1% dosimetric budget
        assert float(r.protocol_results["flatness_vertical"]) == pytest.approx(
            g["v_flat"][i], abs=0.1)
        assert float(r.protocol_results["flatness_horizontal"]) == pytest.approx(
            g["h_flat"][i], abs=0.1)
        assert abs(float(r.protocol_results["symmetry_vertical"])) == pytest.approx(
            abs(g["v_sym"][i]), abs=0.1)
        assert abs(float(r.protocol_results["symmetry_horizontal"])) == pytest.approx(
            abs(g["h_sym"][i]), abs=0.1)


def test_starshot_golden(configs):
    cfg = configs["Starshot"]
    cfg.setup()
    cfg.batch.analyze()
    results = cfg.batch.results_data()
    g = GOLDEN["Starshot"]
    dpmm = float(cfg.batch.images[0].dpmm)
    for i in range(2):
        cx, cy = results[i].circle_center_x_y
        # the baseline mimics (not replicates) the radius sweep, so it only
        # rates a sub-pixel bar; the GROUND TRUTH (every generated spoke
        # passes through (500, 520)) carries the 0.01 mm budget
        assert cx == pytest.approx(g["center_xy"][i][0], abs=1.0)
        assert cy == pytest.approx(g["center_xy"][i][1], abs=1.0)
        assert cx == pytest.approx(500.0, abs=0.01 * dpmm)
        assert cy == pytest.approx(520.0, abs=0.01 * dpmm)
        assert results[i].circle_diameter_mm < 0.01


def test_winston_lutz_golden(configs):
    cfg = configs["WinstonLutz"]
    cfg.setup()
    cfg.wl.analyze()
    g = GOLDEN["WinstonLutz"]
    for i, img in enumerate(cfg.wl.images):
        fx, fy = g["field_xy"][i]
        assert img.field_cax.x == pytest.approx(fx, abs=0.05)
        assert img.field_cax.y == pytest.approx(fy, abs=0.05)
        bbx, bby = g["bb_xy"][i]
        # the golden baseline replicates the reference first-hit weighted
        # centroid exactly (bench.py), so the full 0.01 mm budget applies
        # (~0.03 px at this dpmm; residual is f32-vs-f64 roundoff)
        assert img.bb.x == pytest.approx(bbx, abs=0.03)
        assert img.bb.y == pytest.approx(bby, abs=0.03)


def test_catphan_golden(configs):
    cfg = configs["CatPhan504"]
    cfg.setup()
    cfg.batch.analyze()
    results = cfg.batch.results_data()
    g = GOLDEN["CatPhan504"]
    ct = cfg.batch.cts[0]
    assert ct.origin_slice == g["origin_slice"]
    rois = results[0].ctp404.hu_rois
    for name, want in zip(g["hu_names"], g["hu_values"]):
        # plug interiors are uniform; medians agree to a fraction of an HU
        # (baseline samples at coarse nominal angles — bench.py bar)
        assert float(rois[name].value) == pytest.approx(want, abs=3.0)
