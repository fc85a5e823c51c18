"""Batched Starshot pipeline: ground truth + single-path proximity.

The batch pipeline mirrors the single path stage for stage
(ops/star_pipeline.py); its angular grid is statically sized, so results
agree with the single path to the sample spacing and with ground truth to
well under the clinical 1 mm tolerance.
"""

import numpy as np
import pytest

from tests.models.test_starshot import make_starshot


@pytest.fixture(scope="module")
def star_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("starbatch")
    paths = []
    for i in range(3):
        d = tmp / f"s{i}"
        d.mkdir()
        paths.append(make_starshot(d, n_spokes=5, angles_offset=10.0 + 5 * i))
    return paths


def test_batch_ground_truth(star_paths):
    from pylinac_tpu.starshot import analyze_star_batch

    results = analyze_star_batch(star_paths)
    assert len(results) == 3
    for r in results:
        # perfect synthetic spokes through one point: near-zero wobble
        assert r.circle_diameter_mm < 0.05
        assert r.passed
        assert len(r.angles) == 5
        # wobble center at the synthetic intersection (500, 520)
        assert r.circle_center_x_y[0] == pytest.approx(500, abs=1.5)
        assert r.circle_center_x_y[1] == pytest.approx(520, abs=1.5)


def test_batch_matches_single(star_paths):
    from pylinac_tpu.starshot import Starshot, StarshotBatch

    batch = StarshotBatch(star_paths)
    batch.analyze()
    for path, br in zip(star_paths, batch.results_data()):
        s = Starshot(path)
        s.analyze()
        sr = s.results_data()
        assert br.circle_diameter_mm == pytest.approx(
            sr.circle_diameter_mm, abs=0.05)
        assert br.circle_center_x_y[0] == pytest.approx(
            sr.circle_center_x_y[0], abs=1.0)
        assert br.circle_center_x_y[1] == pytest.approx(
            sr.circle_center_x_y[1], abs=1.0)
        assert len(br.angles) == len(sr.angles)
        assert np.allclose(sorted(br.angles), sorted(sr.angles), atol=1.0)


def test_batch_wobbly(tmp_path):
    """A deliberately wobbly starshot: the batch must report the wobble."""
    from pylinac_tpu.starshot import analyze_star_batch

    d = tmp_path / "w"
    d.mkdir()
    p = make_starshot(d, n_spokes=5, wobble_shift_px=3.0, dpi=100.0)
    (r,) = analyze_star_batch([p])
    # shifted alternating spokes create a finite wobble circle
    assert 0.2 < r.circle_diameter_mm < 2.0


def test_batch_shape_mismatch(tmp_path):
    from pylinac_tpu.starshot import StarshotBatch

    d1 = tmp_path / "a"
    d1.mkdir()
    d2 = tmp_path / "b"
    d2.mkdir()
    p1 = make_starshot(d1)
    p2 = make_starshot(d2, size=(900, 1000))
    with pytest.raises(ValueError, match="share one shape"):
        StarshotBatch([p1, p2])
