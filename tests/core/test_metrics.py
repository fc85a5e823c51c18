"""Metric plugin tests: BB finding, field finding, profile metrics."""

import numpy as np
import pytest

from pylinac_tpu.core.image import ArrayImage
from pylinac_tpu.core import profile as pprof
from pylinac_tpu.metrics.image import (
    DiskROIMetric,
    GlobalSizedDiskLocator,
    GlobalSizedFieldLocator,
    SizedDiskLocator,
    WeightedCentroid,
)
from pylinac_tpu.metrics.profile import (
    FlatnessDifferenceMetric,
    PenumbraLeftMetric,
    PenumbraRightMetric,
    SymmetryPointDifferenceMetric,
)
from pylinac_tpu.core.geometry import Point


def _bb_image(h=300, w=300, bbs=((150, 150),), bb_radius_px=8, dpmm=2.0):
    """Synthetic field+BB image: high signal background (like an open field),
    BBs attenuate (lower signal); the locator inverts internally."""
    yy, xx = np.mgrid[:h, :w]
    img = np.full((h, w), 1000.0)
    for (cy, cx) in bbs:
        r2 = (yy - cy) ** 2 + (xx - cx) ** 2
        img -= 400 * (r2 < bb_radius_px**2)
    rng = np.random.default_rng(0)
    img += rng.normal(0, 5, (h, w))
    return ArrayImage(img, dpi=dpmm * 25.4)


def test_sized_disk_locator_center():
    dpmm = 2.0
    img = _bb_image(dpmm=dpmm)
    points = img.compute(SizedDiskLocator.from_center_physical(
        expected_position_mm=(0, 0), search_window_mm=(20, 20),
        radius_mm=4, radius_tolerance_mm=2))
    assert len(points) == 1
    assert abs(points[0].x - 150) < 1
    assert abs(points[0].y - 150) < 1


def test_global_disk_locator():
    img = _bb_image(bbs=((75, 75), (75, 225), (225, 75), (225, 225)))
    points = img.compute(GlobalSizedDiskLocator(
        radius_mm=4, radius_tolerance_mm=2, min_number=4, max_number=4))
    assert len(points) == 4
    found = sorted((round(p.y), round(p.x)) for p in points)
    expected = sorted([(75, 75), (75, 225), (225, 75), (225, 225)])
    for f, e in zip(found, expected):
        assert abs(f[0] - e[0]) <= 1
        assert abs(f[1] - e[1]) <= 1


def test_global_field_locator():
    h = w = 300
    yy, xx = np.mgrid[:h, :w]
    img = np.zeros((h, w))
    # a 60x60 px field at (150,150): 30mm at dpmm=2
    img[120:180, 120:180] = 1000.0
    from pylinac_tpu.ops.filters import gaussian_filter
    import jax.numpy as jnp
    img = np.asarray(gaussian_filter(jnp.asarray(img, jnp.float32), 1.5))
    image = ArrayImage(img, dpi=2.0 * 25.4)
    fields = image.compute(GlobalSizedFieldLocator.from_physical(
        field_width_mm=30, field_height_mm=30, field_tolerance_mm=5, min_number=1))
    assert len(fields) == 1
    assert abs(fields[0].x - 149.5) < 1.5
    assert abs(fields[0].y - 149.5) < 1.5


def test_weighted_centroid():
    img = ArrayImage(np.zeros((50, 50)))
    img.array[20, 30] = 10.0
    p = img.compute(WeightedCentroid())
    assert p.x == 30 and p.y == 20


def test_disk_roi_metric():
    arr = np.full((100, 100), 5.0)
    img = ArrayImage(arr)
    roi = img.compute(DiskROIMetric(radius=10, center=Point(50, 50)))
    assert abs(roi.mean - 5.0) < 1e-6


def _field_profile(dpmm=2.0):
    n = 400
    x = np.arange(n, dtype=np.float64)
    left, right = 120, 280
    k = 2.0
    v = 1000 / (1 + np.exp((left - x) / k)) - 1000 / (1 + np.exp((right - x) / k))
    return pprof.FWXMProfilePhysical(v + 10, dpmm=dpmm)


def test_flatness_metric():
    p = _field_profile()
    flatness = p.compute(FlatnessDifferenceMetric(in_field_ratio=0.8))
    assert 0 <= flatness < 1  # nearly flat synthetic field


def test_symmetry_metric():
    p = _field_profile()
    sym = p.compute(SymmetryPointDifferenceMetric())
    assert abs(sym) < 0.5


def test_penumbra_metrics():
    p = _field_profile()
    result = p.compute([PenumbraLeftMetric(), PenumbraRightMetric()])
    # 20-80 width of logistic k=2: 2*ln4*2 = 5.545 px = 2.77 mm
    assert abs(result["Left Penumbra (mm)"] - 2.77) < 0.3
    assert abs(result["Right Penumbra (mm)"] - 2.77) < 0.3
