"""Cross-implementation profile regression: reference-frozen golden values.

``tests/data/profile_regression.npz`` carries the 20 measured clinical
profiles (water-tank scans, SNC/PTW/tomodose exports — flat and FFF, 6-15
MV, axial and diagonal) from the reference's regression suite
(``/root/reference/tests_basic/core/profile_regression_fixtures.py``)
together with the metric values FROZEN BY THE REFERENCE IMPLEMENTATION.

Tolerances: metrics are in percent units; the bar is abs 1e-4 (%) —
1000x tighter than the 0.1% north-star parity budget (observed deltas are
float-path noise at ~1e-5). Field geometry indices: abs 1e-3 samples.
Matching them pins this build's SingleProfile + protocol functions against
pylinac's own computed numbers on real data — the closest available
substitute for the (network-gated) demo-dataset golden values.
"""

import json

import numpy as np
import pytest

from pylinac_tpu.core.profile import Interpolation, SingleProfile
from pylinac_tpu.field_analysis import (
    flatness_dose_difference,
    flatness_dose_ratio,
    symmetry_area,
    symmetry_pdq_iec,
    symmetry_point_difference,
)

METRIC_CALCULATORS = {
    "varian_flatness_difference": flatness_dose_difference,
    "varian_symmetry_point_difference": symmetry_point_difference,
    "elekta_flatness_ratio": flatness_dose_ratio,
    "elekta_symmetry_pdq": symmetry_pdq_iec,
    "siemens_flatness_difference": flatness_dose_difference,
    "siemens_symmetry_area": symmetry_area,
}


def _load():
    data = np.load("tests/data/profile_regression.npz")
    meta = json.loads(bytes(data["meta_json"]).decode())
    out = []
    for i, m in enumerate(meta):
        out.append((m["name"], data[f"x_{i}"], data[f"v_{i}"], m))
    return out

FIXTURES = _load()


@pytest.mark.parametrize("name,x,v,meta", FIXTURES, ids=[f[0][:40] for f in FIXTURES])
def test_protocol_metrics_match_reference_frozen(name, x, v, meta):
    profile = SingleProfile(v, x_values=x, interpolation=Interpolation.NONE)
    for metric, expected in meta["expected_metrics"].items():
        measured = METRIC_CALCULATORS[metric](profile, in_field_ratio=0.8)
        assert measured == pytest.approx(expected, rel=1e-4, abs=1e-4), f"{name}: {metric}"


@pytest.mark.parametrize("name,x,v,meta", FIXTURES, ids=[f[0][:40] for f in FIXTURES])
def test_field_data_matches_reference_frozen(name, x, v, meta):
    profile = SingleProfile(v, x_values=x, interpolation=Interpolation.NONE)
    fd = profile.field_data(in_field_ratio=0.8, slope_exclusion_ratio=0.2)
    for key, expected in meta["expected_field_data"].items():
        # the "top" parabola vertex is near-degenerate on FLAT beams (an
        # FFF metric): a one-sample fit-window difference legitimately
        # moves it ~0.1 mm, so it gets the looser bar (cf. the FieldAnalysis
        # batch parity tests)
        tol = 1e-2 if '"top"' in key else 1e-3
        assert fd[key] == pytest.approx(expected, rel=1e-5, abs=tol), f"{name}: {key}"


@pytest.mark.parametrize("name,x,v,meta", FIXTURES, ids=[f[0][:40] for f in FIXTURES])
def test_protocol_metrics_without_x_values(name, x, v, meta):
    profile = SingleProfile(v, interpolation=Interpolation.NONE)
    for metric, expected in meta["expected_metrics_no_x"].items():
        measured = METRIC_CALCULATORS[metric](profile, in_field_ratio=0.8)
        assert measured == pytest.approx(expected, rel=1e-4, abs=1e-4), f"{name}: {metric}"
