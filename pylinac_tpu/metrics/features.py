"""Region predicate library (parity: reference ``metrics/features.py``).

Predicates operate on :class:`pylinac_tpu.metrics.utils.RegionView` objects
which expose skimage-compatible attribute names.
"""

from __future__ import annotations

import numpy as np


def is_symmetric(region, *args, **kwargs) -> bool:
    """Whether the region's bbox is roughly square (i.e. a circle-ish blob)."""
    ymin, xmin, ymax, xmax = region.bbox
    y = abs(ymax - ymin)
    x = abs(xmax - xmin)
    if x > max(y * 1.05, y + 3) or x < min(y * 0.95, y - 3):
        return False
    return True


def is_near_center(region, *args, **kwargs) -> bool:
    """Whether the region is <2 cm from the image center."""
    dpmm = kwargs["dpmm"]
    shape = kwargs["shape"]
    extent_limit_mm = 20
    bottom, left, top, right = region.bbox
    bb_center_x = left + (right - left) / 2
    bb_center_y = bottom + (top - bottom) / 2
    x_lo = shape[1] / 2 - dpmm * extent_limit_mm
    x_hi = shape[1] / 2 + dpmm * extent_limit_mm
    y_lo = shape[0] / 2 - dpmm * extent_limit_mm
    y_hi = shape[0] / 2 + dpmm * extent_limit_mm
    return (x_lo < bb_center_x < x_hi) and (y_lo < bb_center_y < y_hi)


def is_right_size_bb(region, *args, **kwargs) -> bool:
    """Whether the region area matches a BB of the given radius ± tolerance."""
    bb_area = region.area_filled / (kwargs["dpmm"] ** 2)
    bb_size = kwargs["bb_size"]
    tolerance = kwargs["tolerance"]
    larger_bb_area = np.pi * (bb_size + tolerance) ** 2
    smaller_bb_area = max((np.pi * (bb_size - tolerance) ** 2, 2))
    return smaller_bb_area < bb_area < larger_bb_area


def is_solid(region, *args, **kwargs) -> bool:
    """Whether the region is non-spiculated (solidity > 0.9)."""
    return region.solidity > 0.9


def is_round(region, *args, **kwargs) -> bool:
    """Fill ratio of bbox consistent with a circle (π/4 ± 20%)."""
    expected_fill_ratio = np.pi / 4
    actual_fill_ratio = region.filled_area / region.bbox_area
    return expected_fill_ratio * 1.2 > actual_fill_ratio > expected_fill_ratio * 0.8


def is_right_circumference(region, *args, **kwargs) -> bool:
    """Perimeter consistent with a circle of the given radius ± tolerance."""
    upper = 2 * np.pi * (kwargs["bb_size"] + kwargs["tolerance"])
    lower = 2 * np.pi * (kwargs["bb_size"] - kwargs["tolerance"])
    actual = region.perimeter / kwargs["dpmm"]
    return upper > actual > lower


def is_right_square_perimeter(region, *args, **kwargs) -> bool:
    """Perimeter consistent with the expected square field (upper bound +20%)."""
    actual = region.perimeter / kwargs["dpmm"]
    upper = 1.20 * 2 * (kwargs["field_width_mm"] + kwargs["field_tolerance_mm"]) + 2 * (
        kwargs["field_height_mm"] + kwargs["field_tolerance_mm"])
    lower = 2 * (kwargs["field_width_mm"] - kwargs["field_tolerance_mm"]) + 2 * (
        kwargs["field_height_mm"] - kwargs["field_tolerance_mm"])
    return upper > actual > lower


def is_square(region, *args, **kwargs) -> bool:
    """Fill ratio of bbox consistent with a square (> 0.8)."""
    return region.filled_area / region.bbox_area > 0.8


def is_right_area_square(region, *args, **kwargs) -> bool:
    """Area consistent with the expected square field size ± tolerance."""
    field_area = region.area_filled / (kwargs["dpmm"] ** 2)
    low = (kwargs["field_width_mm"] - kwargs["field_tolerance_mm"]) * (
        kwargs["field_height_mm"] - kwargs["field_tolerance_mm"])
    high = (kwargs["field_width_mm"] + kwargs["field_tolerance_mm"]) * (
        kwargs["field_height_mm"] + kwargs["field_tolerance_mm"])
    return low < field_area < high
