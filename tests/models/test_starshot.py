"""Starshot e2e tests on synthetic spokes with known ground truth."""

import numpy as np
import pytest

from pylinac_tpu.core import dcm
from pylinac_tpu.core.array_utils import array_to_dicom


def make_starshot(tmp_path, center=(500, 520), n_spokes=5, angles_offset=10.0,
                  size=(1000, 1040), spoke_sigma_px=4.0, dpi=100.0, noise=0.0,
                  wobble_shift_px=0.0):
    """Synthetic starshot: n_spokes lines through `center` (x, y px).

    Returns the file path. Ground truth wobble ~0 (or ~wobble_shift_px)."""
    h, w = size
    cy, cx = center[1], center[0]
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    img = np.zeros((h, w))
    rng = np.random.default_rng(42)
    for i in range(n_spokes):
        theta = np.deg2rad(angles_offset + i * 180.0 / n_spokes)
        # line through center with direction (cos t, sin t)
        # add optional per-line offset to create wobble
        off = wobble_shift_px * (1 if i % 2 else -1)
        dx, dy = np.cos(theta), np.sin(theta)
        # distance from each pixel to the line
        d = np.abs(-(yy - cy - off * dx) * dx + (xx - cx + off * dy) * dy)
        img += np.exp(-0.5 * (d / spoke_sigma_px) ** 2)
    img = img / img.max() * 3000
    if noise:
        img += rng.normal(0, noise, img.shape)
    # film-like: dose = high value (will pass inversion check)
    arr = np.clip(img, 0, 65535).astype(np.uint16)
    ds = array_to_dicom(arr, sid=1000.0, gantry=0, coll=0, couch=0, dpi=dpi)
    p = tmp_path / "star.dcm"
    dcm.dcmwrite(p, ds)
    return p


def test_perfect_starshot(tmp_path):
    from pylinac_tpu import Starshot

    path = make_starshot(tmp_path)
    star = Starshot(path)
    star.analyze()
    data = star.results_data()
    assert data.passed
    # ground truth: all lines through (520, 500): wobble ~0
    assert data.circle_diameter_mm < 0.3
    assert abs(data.circle_center_x_y[0] - 500) < 3
    assert abs(data.circle_center_x_y[1] - 520) < 3
    assert len(data.angles) == 5


def test_starshot_num_lines(tmp_path):
    from pylinac_tpu import Starshot

    path = make_starshot(tmp_path, n_spokes=4, angles_offset=20)
    star = Starshot(path)
    star.analyze()
    assert len(star.lines) == 4
    # angle ground truth: spokes at 20, 65, 110(=-70), 155(=-25) from x-axis.
    # calculate_angles measures about vertical.
    found = sorted(star.angles)
    assert len(found) == 4


def test_offcenter_starshot(tmp_path):
    from pylinac_tpu import Starshot

    path = make_starshot(tmp_path, center=(430, 610))
    star = Starshot(path)
    star.analyze()
    data = star.results_data()
    assert data.passed
    assert abs(data.circle_center_x_y[0] - 430) < 3
    assert abs(data.circle_center_x_y[1] - 610) < 3


def test_noisy_starshot(tmp_path):
    from pylinac_tpu import Starshot

    path = make_starshot(tmp_path, noise=30.0)
    star = Starshot(path)
    star.analyze()
    assert star.results_data().circle_diameter_mm < 0.5


def test_wobbly_starshot(tmp_path):
    from pylinac_tpu import Starshot

    # 2px alternating offsets at dpi=100 (0.254mm/px): expect sub-mm but
    # clearly nonzero wobble
    path = make_starshot(tmp_path, wobble_shift_px=2.0)
    star = Starshot(path)
    star.analyze()
    data = star.results_data()
    assert 0.3 < data.circle_diameter_mm < 1.8


def test_results_and_quaac(tmp_path):
    from pylinac_tpu import Starshot

    path = make_starshot(tmp_path)
    star = Starshot(path)
    star.analyze()
    assert "Starshot Analysis Results" in star.results()
    out = tmp_path / "star_quaac.json"
    star.to_quaac(out, overwrite=True)
    assert out.exists()
