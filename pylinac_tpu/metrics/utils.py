"""Feature finding: the multi-threshold BB/field detector.

TPU-native rewrite of the reference's ``find_features``
(``metrics/utils.py:66``): a single jitted labeling+regionprops kernel
(:mod:`pylinac_tpu.ops.label`) is invoked per threshold step (compiled once,
re-dispatched 50×), with predicates evaluated on the fixed-K property arrays.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..core.array_utils import stretch
from ..core.geometry import Point
from ..ops import label as jlabel

# threshold-scan chunking: each device dispatch evaluates _CHUNK thresholds
# at once (vmap), and the host early-exits between chunks once max_number
# features are found. One chunk costs ~one dispatch round trip regardless of
# chunk size, so this trades the reference's 50 sequential dispatches for at
# most 50/_CHUNK. Sentinel cutoffs > 1 yield empty masks (sample is
# stretched to [0, 1]).
_N_STEPS = 52
_CHUNK = 13


@functools.partial(jax.jit, static_argnames=("K",))
def _batched_regionprops(sample: jnp.ndarray, cutoffs: jnp.ndarray, K: int):
    """regionprops at every threshold in ONE device dispatch (vmap over the
    cutoff axis) — turns the reference's 50-step sequential scan into a
    single fused call (SURVEY §7: run all thresholds in parallel)."""

    def one(cut):
        regions = jlabel.regionprops(sample > cut, sample, K=K,
                                     connectivity=1, fill=True)
        return jlabel.clear_border(regions)

    return jax.vmap(one)(cutoffs)


class RegionView:
    """A skimage-RegionProperties-compatible view over one slot of the
    fixed-K :class:`pylinac_tpu.ops.label.Regions` arrays."""

    __slots__ = ("_regions", "_i")

    def __init__(self, regions: jlabel.Regions, i: int):
        self._regions = regions
        self._i = i

    @property
    def bbox(self) -> tuple[int, int, int, int]:
        r = self._regions
        i = self._i
        return (int(r.bbox_rmin[i]), int(r.bbox_cmin[i]),
                int(r.bbox_rmax[i]), int(r.bbox_cmax[i]))

    @property
    def area(self) -> float:
        return float(self._regions.area[self._i])

    @property
    def area_filled(self) -> float:
        return float(self._regions.area_filled[self._i])

    filled_area = area_filled

    @property
    def bbox_area(self) -> float:
        return float(self._regions.bbox_area[self._i])

    @property
    def area_bbox(self) -> float:
        return self.bbox_area

    @property
    def solidity(self) -> float:
        return float(self._regions.solidity[self._i])

    @property
    def perimeter(self) -> float:
        return float(self._regions.perimeter[self._i])

    @property
    def centroid(self) -> tuple[float, float]:
        return (float(self._regions.centroid_r[self._i]),
                float(self._regions.centroid_c[self._i]))

    @property
    def weighted_centroid(self) -> tuple[float, float]:
        return (float(self._regions.weighted_centroid_r[self._i]),
                float(self._regions.weighted_centroid_c[self._i]))

    @property
    def centroid_weighted(self) -> tuple[float, float]:
        return self.weighted_centroid

    @property
    def eccentricity(self) -> float:
        return float(self._regions.eccentricity[self._i])

    @property
    def orientation(self) -> float:
        return float(self._regions.orientation[self._i])

    @property
    def major_axis_length(self) -> float:
        return float(self._regions.major_axis_length[self._i])

    @property
    def minor_axis_length(self) -> float:
        return float(self._regions.minor_axis_length[self._i])

    @property
    def equivalent_diameter_area(self) -> float:
        return float(np.sqrt(4 * self.area / np.pi))

    @property
    def mean_intensity(self) -> float:
        return float(self._regions.mean_intensity[self._i])

    @property
    def max_intensity(self) -> float:
        return float(self._regions.max_intensity[self._i])

    @property
    def min_intensity(self) -> float:
        return float(self._regions.min_intensity[self._i])


def valid_region_views(regions: jlabel.Regions, host: bool = True) -> list[RegionView]:
    """Materialize RegionViews for the valid slots (host-side)."""
    host_regions = jlabel.regions_to_host(regions)
    return [RegionView(host_regions, i) for i in np.nonzero(host_regions.valid)[0]]


def deduplicate_points_and_boundaries(
    original_points: list[Point],
    new_points: list[Point],
    min_separation_px: float,
    original_boundaries: list,
    new_boundaries: list,
) -> tuple[list[Point], list]:
    """Drop new points closer than ``min_separation_px`` to any original point
    (reference ``metrics/utils.py:14``)."""
    combined_points = original_points
    combined_boundaries = original_boundaries
    for new_point, new_boundary in zip(new_points, new_boundaries):
        for original_point in original_points:
            if new_point.distance_to(original_point) < min_separation_px:
                break
        else:
            combined_points.append(new_point)
            combined_boundaries.append(new_boundary)
    return combined_points, combined_boundaries


def _region_boundary(regions_host, i: int, mask_shape, top_offset: int, left_offset: int) -> np.ndarray:
    """Approximate region boundary scatter points for plotting: the bbox ring.

    The reference extracts exact inner boundaries via skimage
    (``metrics/utils.py:40``) purely for plotting; we return the bbox outline
    which serves the same visualization purpose without a second labeling pass.
    """
    rmin, cmin, rmax, cmax = (int(regions_host.bbox_rmin[i]), int(regions_host.bbox_cmin[i]),
                              int(regions_host.bbox_rmax[i]), int(regions_host.bbox_cmax[i]))
    boundary = np.zeros((rmax + top_offset + 1, cmax + left_offset + 1), dtype=bool)
    boundary[rmin + top_offset: rmax + top_offset, cmin + left_offset] = True
    boundary[rmin + top_offset: rmax + top_offset, cmax + left_offset - 1] = True
    boundary[rmin + top_offset, cmin + left_offset: cmax + left_offset] = True
    boundary[rmax + top_offset - 1, cmin + left_offset: cmax + left_offset] = True
    return boundary


def find_features(
    sample: np.ndarray,
    top_offset: int,
    left_offset: int,
    min_number: int,
    max_number: int | float,
    dpmm: float,
    detection_conditions: list[Callable],
    radius_mm: float,
    radius_tolerance_mm: float,
    min_separation_mm: float,
    K: int = 24,
    compute_hull: bool = True,
    batch_thresholds: bool | None = None,
) -> tuple[list[Point], list[np.ndarray], list[RegionView]]:
    """Scan 50 threshold steps, label + regionprops each, apply the predicate
    chain, dedupe by separation.  Parity with reference ``metrics/utils.py:66``.

    ``batch_thresholds``: evaluate thresholds in vmapped chunks of
    :data:`_CHUNK` per device dispatch instead of one call per threshold
    (identical results). Opt-in: wins when the scan runs most thresholds
    (multi-feature finds); the default sequential loop wins for early-exit
    single-feature finds because it stops dispatching at the first hit.
    """
    sample = stretch(np.asarray(sample, dtype=np.float32), min=0, max=1)
    from ..ops import route
    dev_sample = route.put(sample)
    imin, imax = float(sample.min()), float(sample.max())
    spread = imax - imin
    step_size = spread / 50
    cutoff = imin + step_size

    if batch_thresholds is None:
        batch_thresholds = False
    chunk_host = None  # Regions of (_CHUNK, K) numpy arrays for current chunk
    if batch_thresholds:
        # same accumulated float sequence as the sequential loop
        cuts = []
        c = cutoff
        while c <= imax and len(cuts) < _N_STEPS:
            cuts.append(c)
            c += step_size
        all_cutoffs = np.full(
            ((len(cuts) + _CHUNK - 1) // _CHUNK or 1) * _CHUNK, 2.0, np.float32)
        all_cutoffs[: len(cuts)] = cuts

    total_features: list[Point] = []
    feature_boundaries: list[np.ndarray] = []
    last_regions: list[RegionView] = []
    step_idx = 0
    while cutoff <= imax and len(total_features) < max_number:
        if batch_thresholds:
            if step_idx % _CHUNK == 0:  # dispatch the next chunk of thresholds
                chunk = all_cutoffs[step_idx: step_idx + _CHUNK]
                batched = _batched_regionprops(dev_sample, route.put(chunk), K)
                chunk_host = jlabel.regions_to_host(batched)
            host_regions = jlabel.Regions(
                *[f[step_idx % _CHUNK] for f in chunk_host])
        else:
            regions = jlabel.regionprops(dev_sample > cutoff, dev_sample, K=K,
                                         connectivity=1, fill=True)
            regions = jlabel.clear_border(regions)
            host_regions = jlabel.regions_to_host(regions)
        step_idx += 1
        candidates = [RegionView(host_regions, i)
                      for i in np.nonzero(host_regions.valid)[0]]
        # apply predicate chain (largest-area first like the reference)
        candidates.sort(key=lambda r: r.filled_area, reverse=True)
        kept = []
        for region in candidates:
            if all(condition(region, dpmm=dpmm, bb_size=radius_mm,
                             tolerance=radius_tolerance_mm, shape=sample.shape)
                   for condition in detection_conditions):
                kept.append(region)
        if kept:
            new_points = [Point(r.weighted_centroid[1], r.weighted_centroid[0])
                          for r in kept]
            new_boundaries = [
                _region_boundary(host_regions, r._i, sample.shape, top_offset, left_offset)
                for r in kept]
            total_features, feature_boundaries = deduplicate_points_and_boundaries(
                original_points=total_features, new_points=new_points,
                min_separation_px=min_separation_mm * dpmm,
                original_boundaries=feature_boundaries,
                new_boundaries=new_boundaries)
            last_regions = kept
        cutoff += step_size

    if len(total_features) < min_number:
        raise ValueError(
            f"Couldn't find the minimum number of disks in the image. "
            f"Found {len(total_features)}; required: {min_number}")
    for feature in total_features:
        feature.x += left_offset
        feature.y += top_offset
    return total_features, feature_boundaries, last_regions


def get_boundary(region, top_offset: int, left_offset: int) -> np.ndarray:
    """Bbox-outline boundary for a RegionView (plotting aid)."""
    return _region_boundary(region._regions, region._i, None, top_offset, left_offset)
