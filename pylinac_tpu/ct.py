"""CatPhan CBCT/CT QA engine: CatPhan 503/504/600/604/700.

API parity with the reference (``/root/reference/pylinac/ct.py``).
TPU-native notes:

* phantom localization (Scharr edges → Otsu → labeling → regionprops) runs
  on the jitted device kernels (:mod:`pylinac_tpu.ops`) per slice;
* the CT volume is held as a float32 stack; slice combining is an array
  reduction; module ROI sampling is gather math;
* the spatial-resolution module's collapsed circular profile + peak/valley
  search uses the fixed-shape peak kernel.
"""

from __future__ import annotations

import os
import textwrap
import warnings
import zipfile
import functools
from functools import cached_property
from pathlib import Path
from typing import BinaryIO, Callable, Sequence

import numpy as np
from pydantic import BaseModel, Field

import jax
import jax.numpy as jnp

from . import profiling
from .core import image
from .core.contrast import Contrast
from .core.geometry import Line, Point
from .core.io import TemporaryZipDirectory, get_url, retrieve_demo_file
from .core.mtf import MTF
from .core.profile import CollapsedCircleProfile, FWXMProfile
from .core.roi import DiskROI, LowContrastDiskROI, RectangleROI
from .core.utilities import QuaacDatum, QuaacMixin, ResultBase, ResultsDataMixin
from .core.warnings import capture_warnings
from .core.image import z_position
from .ops import label as jlabel
from .ops import label_native
from .ops import route
from .ops.filters import gaussian_filter, scharr
from .ops.threshold import otsu_threshold
from .metrics.utils import RegionView

# Ramp angle correction: the wire is at 23°, making its projection longer
# (Catphan manual, "Scan slice geometry")
RAMP_ANGLE_RATIO = 0.42

# nominal HU values (midpoints of the manual's ranges)
AIR = -1000
LUNG_7112 = -868
PMP = -196
LDPE = -104
POLY = -47
WATER = 0
ACRYLIC = 115
BONE_20 = 237
DELRIN = 365
BONE_50 = 725
TEFLON = 1000


# --------------------------------------------------------------------------
# Result models
# --------------------------------------------------------------------------
class ROIResult(BaseModel):
    name: str = Field(description="The region the ROI was sampled from.")
    value: float = Field(description="The measured HU value.")
    stdev: float = Field(description="The ROI pixel value standard deviation.")
    difference: float | None = Field(description="Measured minus nominal.")
    nominal_value: float | None = Field(description="The nominal HU value.")
    passed: bool | None = Field(description="Whether the ROI passed.")


class CTP404Result(BaseModel):
    offset: int = Field(description="Module offset from origin slice (mm).")
    low_contrast_visibility: float = Field(description="Low contrast visibility score.")
    thickness_passed: bool = Field(description="Whether slice thickness passed.")
    measured_slice_thickness_mm: float = Field(description="Measured slice thickness (mm).")
    thickness_num_slices_combined: int = Field(description="Slices combined for thickness.")
    geometry_passed: bool = Field(description="Whether geometry passed.")
    avg_line_distance_mm: float = Field(description="Average node line distance (mm).")
    line_distances_mm: list[float] = Field(description="Individual node distances (mm).")
    hu_linearity_passed: bool = Field(description="Whether HU linearity passed.")
    hu_tolerance: float = Field(description="HU tolerance.")
    hu_rois: dict[str, ROIResult] = Field(description="HU ROI results by material.")


class CTP486Result(BaseModel):
    uniformity_index: float = Field(description="Uniformity index (Elstrom eq 2).")
    integral_non_uniformity: float = Field(description="Integral non-uniformity (eq 1).")
    nps_avg_power: float = Field(description="Average noise power.")
    nps_max_freq: float = Field(description="Most populous NPS frequency.")
    passed: bool = Field(description="Whether uniformity passed.")
    rois: dict[str, ROIResult] = Field(description="Uniformity ROI results.")


class CTP515Result(BaseModel):
    cnr_threshold: float = Field(description="CNR 'seen' threshold.")
    num_rois_seen: int = Field(description="Number of ROIs seen.")
    roi_settings: dict = Field(description="Low-contrast ROI settings.")
    roi_results: dict = Field(description="Low-contrast ROI results.")


class CTP528Result(BaseModel):
    start_angle_radians: float | None = Field(description="Circular profile start angle.")
    mtf_lp_mm: dict = Field(description="MTF in lp/mm at 10-90%.")
    roi_settings: dict[str, dict] = Field(description="MTF ROI settings.")


class CatphanResult(ResultBase):
    catphan_model: str = Field(description="The CatPhan model analyzed.")
    catphan_roll_deg: float = Field(description="The phantom roll (deg).")
    origin_slice: int = Field(description="The origin (HU module center) slice.")
    num_images: int = Field(description="Number of images in the dataset.")
    ctp404: CTP404Result = Field(description="CTP404 results.")
    ctp486: CTP486Result | None = Field(default=None, description="CTP486 results.")
    ctp528: CTP528Result | None = Field(default=None, description="CTP528 results.")
    ctp515: CTP515Result | None = Field(default=None, description="CTP515 results.")


# --------------------------------------------------------------------------
# ROI flavors
# --------------------------------------------------------------------------
class SpatialResolutionROI(RectangleROI):
    @property
    def plot_color(self):
        return "blue"


class HUDiskROI(DiskROI):
    """A disk ROI with a nominal HU value + tolerance (reference ``ct.py:251``)."""

    def __init__(self, array, angle, roi_radius, dist_from_center, phantom_center,
                 nominal_value=None, tolerance=None, background_mean=None,
                 background_std=None):
        new_center = self._get_shifted_center(angle, dist_from_center, phantom_center)
        super().__init__(array, roi_radius, new_center)
        self.nominal_val = nominal_value
        self.tolerance = tolerance

    @property
    def value_diff(self) -> float:
        return self.pixel_value - self.nominal_val

    @property
    def passed(self) -> bool:
        if self.tolerance:
            return abs(self.value_diff) <= self.tolerance
        return True

    @property
    def plot_color(self) -> str:
        return "green" if self.passed else "red"


class ThicknessROI(RectangleROI):
    """Rect ROI over the angled wire ramp for slice thickness (reference ``:300``)."""

    @cached_property
    def long_profile(self) -> FWXMProfile:
        from .ops import route
        from .ops.filters import gaussian_filter as _gf

        # small-array CPU routing: a lone wire-ramp blur is a ~30 ms tunnel
        # round trip on a remote chip but microseconds in-process
        with profiling.stage("ctp404.thickness_profile"):
            arr = np.asarray(_gf(route.put(np.asarray(self.pixel_array, np.float32)), 1.0))
            return FWXMProfile(values=arr.max(axis=int(np.argmin(arr.shape))))

    @cached_property
    def wire_fwhm(self) -> float:
        return self.long_profile.field_width_px

    @property
    def plot_color(self) -> str:
        return "blue"


# --------------------------------------------------------------------------
# Region finding (device kernels)
# --------------------------------------------------------------------------
def _use_native_ccl() -> bool:
    """Route host-consumed region extraction through the C++ CCL backend
    (ONE bit-packed fetch + exact union-find) unless the A/B knob pins a
    device backend. The sharded multi-chip localization keeps the device
    path regardless (its regions reduce across the mesh)."""
    import os

    if os.environ.get("PYLINAC_TPU_CCL") in ("xla", "pallas"):
        return False
    return label_native.available()


def _edges_and_mask(arr, cy, cx, radius, use_disk: bool, use_otsu: bool,
                    scale08: bool, host: bool | None = None):
    """The mask stage shared by every region-extraction backend — MUST stay
    bit-identical across routes (Scharr→Gaussian→threshold, reference
    ``ct.py:3315``). ``host`` picks the Otsu histogram strategy for the
    backend the caller routed to (see ``ops.threshold.otsu_threshold``)."""
    edges = gaussian_filter(scharr(arr.astype(jnp.float32)), 1.0)
    if use_disk:
        h, w = arr.shape
        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 < radius**2
        if use_otsu:
            thres = otsu_threshold(edges, mask=disk, host=host)
        else:
            thres = (jnp.sum(jnp.where(disk, edges, 0.0))
                     / jnp.maximum(jnp.sum(disk), 1))
    else:
        thres = (otsu_threshold(edges, host=host) if use_otsu
                 else jnp.mean(edges))
    if scale08:
        thres = thres * 0.8
    return edges > thres, edges


@functools.partial(jax.jit, static_argnames=("use_disk", "use_otsu",
                                             "scale08", "want_edges",
                                             "host"))
def _mask_pack_batch(arrs, cy, cx, radius, use_disk: bool, use_otsu: bool,
                     scale08: bool, want_edges: bool, host: bool = False):
    """Batched mask stage → ONE flat float32 wire buffer for the native CCL
    backend: [bit-packed mask halfwords..., edge image (optional)]."""
    from .ops.pack import pack_tree
    bw, edges = jax.vmap(
        lambda a: _edges_and_mask(a, cy, cx, radius, use_disk, use_otsu,
                                  scale08, host=host))(arrs)
    packed = label_native.pack_mask16(bw)
    if want_edges:
        return pack_tree([packed.ravel(), edges.ravel()])
    return pack_tree([packed.ravel()])


# Mask batches at or below this element count run on the in-process CPU
# backend (same jitted kernel, microsecond dispatch) instead of the
# accelerator: below ~3M elems the tunnel round trip (~31 ms) plus the
# fetch exceeds the host's ~6 ms/MB mask-stage cost (measured, see
# PERF_BUDGET.json). Large batches (whole-stack localization) amortize the
# round trip and stay on the accelerator.
_HOST_MASK_ELEMS = int(os.environ.get("PYLINAC_TPU_HOST_MASK_ELEMS", 3_000_000))


def _native_region_rows(arrs: np.ndarray, centers_yx, radius,
                        threshold: str, scale08: bool,
                        want_edges: bool) -> tuple[jlabel.Regions, np.ndarray]:
    """Device mask stage + one fetch + C++ CCL for a host array batch.
    Returns ((B, K) Regions on host, n_regions)."""
    b, h, w = arrs.shape
    use_disk = centers_yx is not None
    cy, cx = centers_yx if use_disk else (0.0, 0.0)
    from .ops.pack import fetch_concat
    small = arrs.size <= _HOST_MASK_ELEMS
    dev = route.put(np.ascontiguousarray(arrs, np.float32), small=small)
    flat = fetch_concat(_mask_pack_batch(
        dev, np.float32(cy), np.float32(cx), np.float32(radius),
        use_disk, threshold == "otsu", scale08, want_edges,
        host=small or route.default_is_cpu()))
    ww = label_native.packed_width(w)
    nbits = b * h * ww
    bits = flat[:nbits].reshape(b, h, ww)
    edges = flat[nbits:].reshape(b, h, w) if want_edges else None
    return label_native.regions_from_packed(bits, w, edges, connectivity=2)


@functools.partial(jax.jit, static_argnames=("K", "use_disk", "use_otsu",
                                             "scale08", "clear_borders",
                                             "minmax"))
def _regions_fused(arr, cy, cx, radius, K: int, use_disk: bool,
                   use_otsu: bool, scale08: bool, clear_borders: bool,
                   minmax: bool):
    """One-dispatch Scharr→threshold→regionprops for a single slice
    (the eager op-by-op form paid one tunnel round trip per step)."""
    bw, edges = _edges_and_mask(arr, cy, cx, radius, use_disk, use_otsu,
                                scale08)
    regions = jlabel.regionprops(bw, edges, K=K, connectivity=2, hull=False,
                                 minmax=minmax)
    if clear_borders:
        regions = jlabel.clear_border(regions)
    return jlabel.pack_regions(regions)


def get_regions(slice_or_arr, fill_holes: bool = False, clear_borders: bool = True,
                threshold: str = "otsu", minmax: bool = True):
    """Scharr-edge → threshold → label/regionprops pipeline
    (reference ``ct.py:3315``), fused into ONE device dispatch.

    Returns (labeled_array(None), regions, num_regions). ``minmax=False``
    skips the bbox/min-max reductions for callers that don't read them
    (see :func:`pylinac_tpu.ops.label.regionprops`).
    """
    if isinstance(slice_or_arr, Slice):
        arr = slice_or_arr.image.array
        center = slice_or_arr.image.center
        use_disk = True
        radius = 110 / slice_or_arr.mm_per_pixel
        scale08 = True
    else:
        arr = np.asarray(slice_or_arr)
        center = Point(int(arr.shape[1] / 2), int(arr.shape[0] / 2))
        use_disk = False
        radius = 0.0
        scale08 = False
    if _use_native_ccl():
        host, _n = _native_region_rows(
            np.asarray(arr, np.float32)[None],
            (float(center.y), float(center.x)) if use_disk else None,
            radius, threshold, scale08, want_edges=True)
        row = jlabel.Regions(*[f[0] for f in host])
        keep = row.valid & ~row.touches_border if clear_borders else row.valid
        views = [RegionView(row, i) for i in np.nonzero(keep)[0]]
        return None, views, len(views)
    dev = jnp.asarray(np.asarray(arr, np.float32))
    # escalate K when the fixed slots fill up (more regions than slots means
    # silent truncation that drops regions by position)
    K = 32
    while True:
        packed = _regions_fused(
            dev, jnp.float32(center.y), jnp.float32(center.x),
            jnp.float32(radius), K=K, use_disk=use_disk,
            use_otsu=threshold == "otsu", scale08=scale08,
            clear_borders=False, minmax=minmax)
        host = jlabel.regions_to_host(packed)
        if host.valid.sum() < K or K >= 512:
            break
        K *= 4
    if clear_borders:
        keep = host.valid & ~host.touches_border
    else:
        keep = host.valid
    views = [RegionView(host, i) for i in np.nonzero(keep)[0]]
    return None, views, len(views)


@functools.partial(jax.jit, static_argnames=("K", "use_disk", "use_otsu",
                                             "scale08", "clear_borders",
                                             "minmax"))
def _regions_fused_batch(arrs, cy, cx, radius, K: int, use_disk: bool,
                         use_otsu: bool, scale08: bool, clear_borders: bool,
                         minmax: bool):
    """Batched :func:`_regions_fused`: the Scharr→threshold→regionprops
    pipeline for N same-shape slices in ONE dispatch (CatPhanBatch shares
    the roll-slice and geometry-node passes across scans this way)."""
    b, h, w = arrs.shape
    edges = jax.vmap(lambda a: gaussian_filter(scharr(a.astype(jnp.float32)),
                                               1.0))(arrs)
    if use_disk:
        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 < radius**2
        if use_otsu:
            thres = jax.vmap(lambda e: otsu_threshold(e, mask=disk))(edges)
        else:
            thres = (jnp.sum(jnp.where(disk, edges, 0.0), axis=(1, 2))
                     / jnp.maximum(jnp.sum(disk), 1))
    else:
        thres = (jax.vmap(otsu_threshold)(edges) if use_otsu
                 else jnp.mean(edges, axis=(1, 2)))
    if scale08:
        thres = thres * 0.8
    bw = edges > thres[:, None, None]
    regions = jlabel.regionprops_batch(bw, edges, K=K, connectivity=2,
                                       hull=False,    # CT never reads solidity
                                       minmax=minmax)
    if clear_borders:
        regions = jlabel.clear_border(regions)
    return jlabel.pack_regions(regions)


def get_regions_batch(arrs: np.ndarray, centers_yx: tuple[float, float] | None,
                      radius: float, threshold: str = "otsu",
                      scale08: bool = False, clear_borders: bool = True,
                      minmax: bool = True,
                      want_intensity: bool = True) -> list[list[RegionView]] | None:
    """Batched :func:`get_regions` over same-shape arrays — one device
    dispatch + one fetch for the whole batch.  ``centers_yx`` enables the
    disk-masked threshold (the :class:`Slice` branch of get_regions).
    Returns per-array RegionView lists, or None when any array's regions
    overflow the K slots (caller falls back to the per-array path).
    ``want_intensity=False`` skips the edge-image fetch on the native route
    (callers that read no intensity-weighted properties, e.g. the roll
    pre-pass)."""
    if _use_native_ccl():
        host, _n = _native_region_rows(
            np.stack(arrs).astype(np.float32), centers_yx, radius,
            threshold, scale08, want_edges=want_intensity)
        out = []
        for i in range(len(arrs)):
            keep = host.valid[i]
            if clear_borders:
                keep = keep & ~host.touches_border[i]
            row = jlabel.Regions(*[f[i] for f in host])
            out.append([RegionView(row, j) for j in np.nonzero(keep)[0]])
        return out
    dev = jnp.asarray(np.stack(arrs).astype(np.float32))
    use_disk = centers_yx is not None
    cy, cx = centers_yx if use_disk else (0.0, 0.0)
    K = 32
    packed = _regions_fused_batch(
        dev, jnp.float32(cy), jnp.float32(cx), jnp.float32(radius), K=K,
        use_disk=use_disk, use_otsu=threshold == "otsu", scale08=scale08,
        clear_borders=False, minmax=minmax)
    host = jlabel.regions_to_host(packed)
    out = []
    for i in range(len(arrs)):
        valid = host.valid[i]
        if valid.sum() >= K:
            return None  # slot overflow; per-array K escalation path
        if clear_borders:
            keep = valid & ~host.touches_border[i]
        else:
            keep = valid
        row = jlabel.Regions(*[f[i] for f in host])
        out.append([RegionView(row, j) for j in np.nonzero(keep)[0]])
    return out


@functools.partial(jax.jit, static_argnames=("ds", "clip"))
def _stack_mask_pack(raw_vol, ds: int, clip: bool):
    """Native-CCL variant of :func:`_stack_phantom_regions`: the same
    on-device pool→clip→Scharr→Otsu mask stage, but the output is ONE flat
    float32 buffer [bit-packed masks..., per-slice edge maxima] — a single
    fetch feeds the host C++ union-find (ops/label_native.py), replacing
    the on-device CCL sweeps + one-hot props + 3-array fetch (~500 ms →
    ~40 ms through the 31 ms/round-trip tunnel)."""
    n, h, w = raw_vol.shape
    if ds > 1:
        vol = raw_vol.reshape(n, h // ds, ds, w // ds, ds).mean(axis=(2, 4))
    else:
        vol = raw_vol
    clipped = jnp.clip(vol, -1000, 1000) if clip else vol
    edges = jax.vmap(lambda s: gaussian_filter(scharr(s), 1.0))(clipped)
    thres = jax.vmap(otsu_threshold)(edges)
    bw = edges > thres[:, None, None]
    max_edges = jax.vmap(lambda s: jnp.max(scharr(s)))(vol)
    # f32 is the tunnel's bulk wire format (integer arrays fetch
    # element-wise — LINK_BUDGET.json "u8" row); ship the f32 halfwords in
    # ~chunk-sized buffers the host drains on parallel streams
    from .ops.pack import PACK_CHUNK_ELEMS
    halfwords = label_native.pack_mask16(bw).ravel()
    m = halfwords.shape[0]
    step = max(PACK_CHUNK_ELEMS, 1)
    chunks = tuple(halfwords[off:off + step] for off in range(0, m, step))
    return chunks + (max_edges,)


def _stack_regions_native(vol_dev, ds: int, clip: bool, clear_borders: bool):
    """Run the stack localization through the native backend. Returns
    ((N, K) host Regions, max_edges (N,))."""
    from .ops.pack import fetch_all
    n, h, w = vol_dev.shape
    hp, wp = h // ds, w // ds
    ww = label_native.packed_width(wp)
    parts = _stack_mask_pack(vol_dev, ds, clip)
    host = fetch_all(list(parts))
    bits = np.concatenate(host[:-1]).reshape(n, hp, ww)
    max_edges = host[-1].astype(np.float32)
    host, _n = label_native.regions_from_packed(bits, wp, None,
                                                connectivity=2)
    if clear_borders:
        host = host._replace(valid=host.valid & ~host.touches_border)
    return host, max_edges


@functools.partial(jax.jit, static_argnames=("K", "clear_borders", "ds", "clip"))
def _stack_phantom_regions(raw_vol, K: int, clear_borders: bool, ds: int,
                           clip: bool):
    """Whole-stack pool -> clip -> Scharr -> Otsu -> batched regionprops.

    Takes the device-resident FULL-RES volume (uploaded once per loaded
    scan) and performs the ``localization_downsample`` mean-pool and the
    ±1000 HU localization clip on device — re-staging them on host cost
    ~350 ms/scan per analyze. The CCL + hole sweeps run as blocked
    VMEM-resident pallas programs over the whole stack
    (:func:`pylinac_tpu.ops.label.regionprops_batch`); the previous vmapped
    single-image kernels serialized one grid step per slice (~12 ms each).
    Returns (packed regions, per-slice pooled-edge sanity max)."""
    n, h, w = raw_vol.shape
    if ds > 1:
        vol = raw_vol.reshape(n, h // ds, ds, w // ds, ds).mean(axis=(2, 4))
    else:
        vol = raw_vol
    clipped = jnp.clip(vol, -1000, 1000) if clip else vol

    edges = jax.vmap(lambda s: gaussian_filter(scharr(s), 1.0))(clipped)
    thres = jax.vmap(otsu_threshold)(edges)
    bw = edges > thres[:, None, None]
    regions = jlabel.regionprops_batch(bw, edges, K=K, connectivity=2,
                                       hull=False,    # CT never reads solidity
                                       minmax=False)  # ...nor bbox/min/max
    if clear_borders:
        regions = jlabel.clear_border(regions)
    max_edges = jax.vmap(lambda s: jnp.max(scharr(s)))(vol)
    return jlabel.pack_regions(regions), max_edges


def combine_surrounding_slices(dicomstack, nominal_slice_num: int,
                               slices_plusminus: int = 1, mode: str = "mean") -> np.ndarray:
    """Combine a slice with its neighbors (reference ``ct.py:3351``)."""
    slices = range(nominal_slice_num - slices_plusminus,
                   nominal_slice_num + slices_plusminus + 1)
    arrays = tuple(dicomstack[s].array for s in slices)
    array_stack = np.dstack(arrays)
    if mode == "mean":
        return np.mean(array_stack, 2)
    elif mode == "median":
        return np.median(array_stack, 2)
    return np.max(array_stack, 2)


def rois_to_results(dict_mapping: dict[str, DiskROI]) -> dict[str, ROIResult]:
    return {
        name: ROIResult(
            name=name, value=roi.pixel_value, stdev=roi.std,
            difference=getattr(roi, "value_diff", None),
            nominal_value=getattr(roi, "nominal_val", None),
            passed=getattr(roi, "passed", None))
        for name, roi in dict_mapping.items()}


# --------------------------------------------------------------------------
# Slices & modules
# --------------------------------------------------------------------------
class Slice:
    """One analyzed CT slice, optionally combined with neighbors (reference ``:321``)."""

    def __init__(self, catphan, slice_num: int | None = None, combine: bool = True,
                 combine_method: str = "mean", num_slices: int = 0,
                 clear_borders: bool = True, original_image=None):
        if slice_num is not None:
            self.slice_num = slice_num
        if combine and num_slices > 0:
            vol = getattr(catphan, "_host_vol", None)
            lo = self.slice_num - num_slices
            hi = self.slice_num + num_slices
            if vol is not None and lo >= 0 and hi < vol.shape[0]:
                # same reduction over the cached float32 stack (exact for
                # integer-valued sources; f64 accumulate) — np.dstack of the
                # per-slice arrays re-copied ~40 ms per module construction
                seg = vol[lo:hi + 1]
                if combine_method == "mean":
                    array = seg.mean(axis=0, dtype=np.float64)
                elif combine_method == "median":
                    array = np.median(seg.astype(np.float64), axis=0)
                else:
                    array = seg.max(axis=0)
            else:
                array = combine_surrounding_slices(
                    catphan.dicom_stack, self.slice_num, mode=combine_method,
                    slices_plusminus=num_slices)
        elif original_image is not None:
            array = original_image
        else:
            array = catphan.dicom_stack[self.slice_num].array
        self.image = image.load(array if isinstance(array, np.ndarray) else array.array)
        self.catphan_size = catphan.catphan_size
        self.mm_per_pixel = catphan.mm_per_pixel
        self.clear_borders = clear_borders
        self.clip_in_localization = catphan.clip_in_localization
        if catphan._phantom_center_func:
            self._phantom_center_func = catphan._phantom_center_func

    @cached_property
    def phantom_roi(self) -> RegionView:
        """The region matching the phantom's expected size & shape (reference ``:382``)."""
        dev = jnp.asarray(self.image.array, jnp.float32)
        edges = np.asarray(scharr(dev))
        if np.max(edges) < 0.1:
            raise ValueError("No edges were found in the image that look like the phantom")
        if self.clip_in_localization:
            clipped = np.clip(self.image.array, a_min=-1000, a_max=1000)
        else:
            clipped = self.image.array
        _, regions, num_roi = get_regions(
            clipped, fill_holes=True, threshold="otsu",
            clear_borders=self.clear_borders)
        if num_roi < 1:
            raise ValueError(f"The number of ROIs detected {num_roi} was not the number expected (1)")
        catphan_region = sorted(
            regions, key=lambda x: np.abs(x.filled_area - self.catphan_size))[0]
        if (self.catphan_size * 1.3 < catphan_region.filled_area
                or catphan_region.filled_area < self.catphan_size / 1.3):
            raise ValueError("Unable to find ROI of expected size of the phantom")
        return catphan_region

    def is_phantom_in_view(self) -> bool:
        try:
            self.phantom_roi
            return True
        except ValueError:
            return False

    @property
    def phan_center(self) -> Point:
        x = self._phantom_center_func[0](self.slice_num)
        y = self._phantom_center_func[1](self.slice_num)
        return Point(x=x, y=y)


class CatPhanModule(Slice):
    """Base for a CTP module: ROI settings in mm/deg → pixel ROIs (reference ``:443``)."""

    common_name: str = ""
    combine_method: str = "mean"
    num_slices: int = 0
    roi_settings: dict = {}
    background_roi_settings: dict = {}
    window_min = None
    window_max = None
    attr_name: str = ""

    def __init__(self, catphan, tolerance: float | None = None, offset: int = 0,
                 clear_borders: bool = True):
        self.model = ""
        self._offset = offset
        self.origin_slice = catphan.origin_slice
        self.tolerance = tolerance
        self.slice_thickness = catphan.dicom_stack.metadata.SliceThickness
        self.slice_spacing = catphan.dicom_stack.slice_spacing
        self.catphan_roll = catphan.catphan_roll
        self.roi_size_factor = catphan.roi_size_factor
        self.scaling_factor = catphan.scaling_factor
        self.roll_slice_offset = catphan.roll_slice_offset
        self.mm_per_pixel = catphan.mm_per_pixel
        self.rois: dict[str, HUDiskROI] = {}
        self.background_rois: dict[str, HUDiskROI] = {}
        # deep copy the class-level settings so unit conversion doesn't
        # mutate shared state between instances
        import copy as _copy

        self.roi_settings = _copy.deepcopy(self.roi_settings)
        self.background_roi_settings = _copy.deepcopy(self.background_roi_settings)
        with profiling.stage(f"{self.attr_name}.combine"):
            Slice.__init__(self, catphan, combine_method=self.combine_method,
                           num_slices=self.num_slices, clear_borders=clear_borders)
        self._convert_units_in_settings()
        with profiling.stage(f"{self.attr_name}.preprocess"):
            self.preprocess(catphan)
        with profiling.stage(f"{self.attr_name}.rois"):
            self._setup_rois()

    def _convert_units_in_settings(self) -> None:
        setting_groups = [getattr(self, attr) for attr in dir(self)
                          if attr.endswith("roi_settings")]
        for roi_settings in setting_groups:
            for roi, settings in roi_settings.items():
                if isinstance(settings, dict):
                    if settings.get("distance") is not None:
                        settings["distance_pixels"] = (
                            settings["distance"] * self.scaling_factor / self.mm_per_pixel)
                    if settings.get("radial_distance") is not None:
                        settings["radial_distance_pixels"] = (
                            settings["radial_distance"] * self.scaling_factor / self.mm_per_pixel)
                    if settings.get("transversal_distance") is not None:
                        settings["transversal_distance_pixels"] = (
                            settings["transversal_distance"] * self.scaling_factor / self.mm_per_pixel)
                    if settings.get("angle") is not None:
                        settings["angle_corrected"] = settings["angle"] + self.catphan_roll
                    if settings.get("radius") is not None:
                        settings["radius_pixels"] = (
                            settings["radius"] * self.roi_size_factor / self.mm_per_pixel)
                    if settings.get("width") is not None:
                        settings["width_pixels"] = (
                            settings["width"] * self.roi_size_factor / self.mm_per_pixel)
                    if settings.get("height") is not None:
                        settings["height_pixels"] = (
                            settings["height"] * self.roi_size_factor / self.mm_per_pixel)

    def preprocess(self, catphan):
        pass

    @property
    def slice_num(self) -> int:
        return int(self.origin_slice + round(self._offset / self.slice_spacing))

    @slice_num.setter
    def slice_num(self, value):  # allow Slice.__init__ assignment
        self.__dict__["slice_num"] = value

    def _setup_rois(self) -> None:
        for name, setting in self.background_roi_settings.items():
            self.background_rois[name] = HUDiskROI(
                self.image, setting["angle_corrected"], setting["radius_pixels"],
                setting["distance_pixels"], self.phan_center)
        for name, setting in self.roi_settings.items():
            nominal_value = setting.get("value", 0)
            self.rois[name] = HUDiskROI(
                self.image, setting["angle_corrected"], setting["radius_pixels"],
                setting["distance_pixels"], self.phan_center, nominal_value,
                self.tolerance)

    def plot_rois(self, axis) -> None:
        for roi in self.rois.values():
            roi.plot2axes(axis, edgecolor=roi.plot_color)
        for roi in self.background_rois.values():
            roi.plot2axes(axis, edgecolor="blue")

    def plot(self, axis):
        axis.imshow(self.image.array, cmap="gray", vmin=self.window_min,
                    vmax=self.window_max)
        self.plot_rois(axis)
        axis.autoscale(tight=True)
        axis.set_title(f"{self.common_name} ({self.slice_num + 1})")
        axis.axis("off")

    @property
    def roi_vals_as_str(self) -> str:
        return ", ".join(f"{name}: {roi.pixel_value}" for name, roi in self.rois.items())


class CTP404CP504(CatPhanModule):
    """CTP404: HU linearity, slice thickness, geometry (reference ``ct.py:626``)."""

    attr_name = "ctp404"
    common_name = "HU Linearity"
    roi_dist_mm = 58.7
    roi_radius_mm = 5
    roi_settings = {
        "Air": {"value": AIR, "angle": -90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "PMP": {"value": PMP, "angle": -120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "LDPE": {"value": LDPE, "angle": 180, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Poly": {"value": POLY, "angle": 120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Acrylic": {"value": ACRYLIC, "angle": 60, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Delrin": {"value": DELRIN, "angle": 0, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Teflon": {"value": TEFLON, "angle": -60, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }
    background_roi_settings = {
        "1": {"angle": -30, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "2": {"angle": -150, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "3": {"angle": -210, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "4": {"angle": 30, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }
    thickness_roi_height = 40
    thickness_roi_width = 10
    thickness_roi_distance_mm = 38
    thickness_roi_settings = {
        "Left": {"angle": 180, "width": thickness_roi_width, "height": thickness_roi_height, "distance": thickness_roi_distance_mm},
        "Bottom": {"angle": 90, "width": thickness_roi_height, "height": thickness_roi_width, "distance": thickness_roi_distance_mm},
        "Right": {"angle": 0, "width": thickness_roi_width, "height": thickness_roi_height, "distance": thickness_roi_distance_mm},
        "Top": {"angle": -90, "width": thickness_roi_height, "height": thickness_roi_width, "distance": thickness_roi_distance_mm},
    }
    geometry_roi_size_mm = 35
    geometry_roi_settings = {
        "Top-Horizontal": (0, 1),
        "Bottom-Horizontal": (2, 3),
        "Left-Vertical": (0, 2),
        "Right-Vertical": (1, 3),
    }

    def __init__(self, catphan, offset, hu_tolerance, thickness_tolerance,
                 scaling_tolerance, clear_borders: bool = True,
                 thickness_slice_straddle: str | int = "auto",
                 expected_hu_values: dict | None = None):
        import copy as _copy

        self.mm_per_pixel = catphan.mm_per_pixel
        self.hu_tolerance = hu_tolerance
        self.thickness_tolerance = thickness_tolerance
        self.scaling_tolerance = scaling_tolerance
        self.thickness_rois: dict[str, ThicknessROI] = {}
        self.lines: dict[str, GeometricLine] = {}
        self.thickness_slice_straddle = thickness_slice_straddle
        self.expected_hu_values = expected_hu_values
        self.thickness_roi_settings = _copy.deepcopy(self.thickness_roi_settings)
        super().__init__(catphan, tolerance=hu_tolerance, offset=offset,
                         clear_borders=clear_borders)

    def preprocess(self, catphan) -> None:
        self._defer_geometry = getattr(catphan, "_defer_geometry", False)
        if (isinstance(self.thickness_slice_straddle, str)
                and self.thickness_slice_straddle.lower() == "auto"):
            if float(catphan.dicom_stack.metadata.SliceThickness) < 3.5:
                self.pad = 1
            else:
                self.pad = 0
        else:
            self.pad = self.thickness_slice_straddle
        self.thickness_image = Slice(
            catphan, combine_method="mean", num_slices=self.num_slices + self.pad,
            slice_num=self.slice_num, clear_borders=self.clear_borders).image

    def _replace_hu_values(self):
        if self.expected_hu_values is not None:
            for name, value in self.expected_hu_values.items():
                if name in self.roi_settings:
                    self.roi_settings[name]["value"] = value

    def _setup_rois(self) -> None:
        self._replace_hu_values()
        super()._setup_rois()
        self._setup_thickness_rois()
        if len(self.geometry_roi_settings) > 0:
            self._setup_geometry_rois()

    def _setup_thickness_rois(self) -> None:
        for name, setting in self.thickness_roi_settings.items():
            self.thickness_rois[name] = ThicknessROI.from_phantom_center(
                self.thickness_image, setting["width_pixels"],
                setting["height_pixels"], setting["angle_corrected"],
                setting["distance_pixels"], self.phan_center)

    def _geometry_crop(self) -> tuple[np.ndarray, tuple, tuple]:
        boxsize = self.geometry_roi_size_mm / self.mm_per_pixel
        xbounds = (int(self.phan_center.x - boxsize), int(self.phan_center.x + boxsize))
        ybounds = (int(self.phan_center.y - boxsize), int(self.phan_center.y + boxsize))
        geo_img = self.image[ybounds[0]:ybounds[1], xbounds[0]:xbounds[1]].copy()
        geo_img = geo_img - np.median(geo_img)
        nearest_extreme = min(abs(geo_img.max()), abs(geo_img.min()))
        geo_clipped_abs = np.abs(np.clip(geo_img, a_min=-nearest_extreme,
                                         a_max=nearest_extreme))
        return geo_clipped_abs, xbounds, ybounds

    def _setup_geometry_rois(self) -> None:
        geo_clipped_abs, xbounds, ybounds = self._geometry_crop()
        if getattr(self, "_defer_geometry", False):
            # CatPhanBatch finalizes all scans' node detections in one
            # batched dispatch after the per-scan walk
            self._deferred_geo = (geo_clipped_abs, xbounds, ybounds)
            return
        _, regions, num_roi = get_regions(geo_clipped_abs, fill_holes=True,
                                          clear_borders=False)
        self._finalize_geometry(regions, num_roi, xbounds, ybounds)

    def _finalize_geometry(self, regions, num_roi: int, xbounds, ybounds) -> None:
        if num_roi < 4:
            raise ValueError("Unable to locate the Geometric nodes")
        elif num_roi > 4:
            regions = sorted(regions, key=lambda x: x.filled_area, reverse=True)[:4]
        sorted_regions = sorted(regions, key=lambda x: 2 * x.centroid[0] + x.centroid[1])
        centers = [Point(r.weighted_centroid[1] + xbounds[0],
                         r.weighted_centroid[0] + ybounds[0]) for r in sorted_regions]
        for name, order in self.geometry_roi_settings.items():
            self.lines[name] = GeometricLine(
                centers[order[0]], centers[order[1]], self.mm_per_pixel,
                self.scaling_tolerance)

    @property
    def lcv(self) -> float:
        """Low-contrast visibility (reference ``:845``)."""
        return (2 * abs(self.rois["LDPE"].pixel_value - self.rois["Poly"].pixel_value)
                / (self.rois["LDPE"].std + self.rois["Poly"].std))

    @property
    def passed_hu(self) -> bool:
        return all(roi.passed for roi in self.rois.values())

    @property
    def passed_thickness(self) -> bool:
        return (self.slice_thickness - self.thickness_tolerance
                < self.meas_slice_thickness
                < self.slice_thickness + self.thickness_tolerance)

    @property
    def meas_slice_thickness(self) -> float:
        """Mean wire-FWHM thickness, ramp-corrected (reference ``:973``)."""
        return np.mean(sorted(
            roi.wire_fwhm * self.mm_per_pixel * RAMP_ANGLE_RATIO
            for roi in self.thickness_rois.values())) / (1 + 2 * self.pad)

    @property
    def avg_line_length(self) -> float:
        return float(np.mean([line.length_mm for line in self.lines.values()]))

    @property
    def passed_geometry(self) -> bool:
        return all(line.passed for line in self.lines.values())

    def plot_linearity(self, axis=None, plot_delta: bool = True):
        import matplotlib.pyplot as plt

        nominal_x = [roi.nominal_val for roi in self.rois.values()]
        if axis is None:
            _, axis = plt.subplots()
        if plot_delta:
            values = [roi.value_diff for roi in self.rois.values()]
            nominal_measurements = [0] * len(values)
            ylabel = "HU Delta"
        else:
            values = [roi.pixel_value for roi in self.rois.values()]
            nominal_measurements = nominal_x
            ylabel = "Measured Values"
        points = axis.plot(nominal_x, values, "g+", markersize=15, mew=2)
        axis.plot(nominal_x, nominal_measurements)
        axis.plot(nominal_x, np.array(nominal_measurements) + self.hu_tolerance, "r--")
        axis.plot(nominal_x, np.array(nominal_measurements) - self.hu_tolerance, "r--")
        axis.margins(0.05)
        axis.grid(True)
        axis.set_xlabel("Nominal Values")
        axis.set_ylabel(ylabel)
        axis.set_title("HU linearity")
        return points

    def plot_rois(self, axis) -> None:
        super().plot_rois(axis)
        for roi in self.thickness_rois.values():
            roi.plot2axes(axis, edgecolor="blue")
        for line in self.lines.values():
            line.plot2axes(axis, color=line.pass_fail_color)


class CTP404CP503(CTP404CP504):
    """Alias for namespace consistency."""


class CTP404CP600(CTP404CP504):
    roi_dist_mm = 58.7
    roi_radius_mm = 5
    roi_settings = {
        "Air": {"value": AIR, "angle": 90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "PMP": {"value": PMP, "angle": 60, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "LDPE": {"value": LDPE, "angle": 0, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Poly": {"value": POLY, "angle": -60, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Acrylic": {"value": ACRYLIC, "angle": -120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Delrin": {"value": DELRIN, "angle": -180, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Teflon": {"value": TEFLON, "angle": 120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Vial": {"value": WATER, "angle": -90, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }

    def _setup_rois(self) -> None:
        super()._setup_rois()
        if self.rois["Vial"].pixel_value < -500:  # vial absent; closer to air
            self.rois.pop("Vial")


class CTP404CP604(CTP404CP504):
    roi_dist_mm = 58.7
    roi_radius_mm = 5
    roi_settings = {
        "Air": {"value": AIR, "angle": -90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "PMP": {"value": PMP, "angle": -120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "50% Bone": {"value": BONE_50, "angle": -150, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "LDPE": {"value": LDPE, "angle": 180, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Poly": {"value": POLY, "angle": 120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Acrylic": {"value": ACRYLIC, "angle": 60, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "20% Bone": {"value": BONE_20, "angle": 30, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Delrin": {"value": DELRIN, "angle": 0, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Teflon": {"value": TEFLON, "angle": -60, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }
    background_roi_settings = {
        "1": {"angle": -30, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "2": {"angle": -210, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }


class CTP404CP700(CTP404CP504):
    roi_dist_mm = 58.7
    roi_radius_mm = 5
    roi_settings = {
        "Air": {"value": AIR, "angle": 180 - -90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "PMP": {"value": PMP, "angle": 180 - -120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Lung": {"value": LUNG_7112, "angle": 180 - -165, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Delrin": {"value": DELRIN, "angle": 180 - 165, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Poly": {"value": POLY, "angle": 180 - 120, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Teflon": {"value": TEFLON, "angle": 180 - 90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Bone 20%": {"value": BONE_20, "angle": 180 - 60, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "LDPE": {"value": LDPE, "angle": 180 - 15, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Bone 50%": {"value": BONE_50, "angle": 180 - -15, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Acrylic": {"value": ACRYLIC, "angle": 180 - -60, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Vial": {"value": WATER, "angle": 180 - -135, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }
    background_roi_settings = {
        "1": {"angle": -37.5, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "2": {"angle": -142.5, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "3": {"angle": 142.5, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "4": {"angle": 37.5, "distance": roi_dist_mm, "radius": roi_radius_mm},
    }


class CTP486(CatPhanModule):
    """HU uniformity module (reference ``ct.py:1251``)."""

    attr_name = "ctp486"
    common_name = "HU Uniformity"
    roi_dist_mm = 53
    roi_radius_mm = 10
    nominal_value = 0
    roi_settings = {
        "Top": {"value": nominal_value, "angle": -90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Right": {"value": nominal_value, "angle": 0, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Bottom": {"value": nominal_value, "angle": 90, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Left": {"value": nominal_value, "angle": 180, "distance": roi_dist_mm, "radius": roi_radius_mm},
        "Center": {"value": nominal_value, "angle": 0, "distance": 0, "radius": roi_radius_mm},
    }

    def _setup_rois(self) -> None:
        super()._setup_rois()
        self.nps_rois = {}
        for name, setting in self.roi_settings.items():
            self.nps_rois[name] = RectangleROI.from_phantom_center(
                array=self.image, width=setting["radius_pixels"] * 2,
                height=setting["radius_pixels"] * 2,
                angle=setting["angle_corrected"],
                dist_from_center=setting["distance_pixels"],
                phantom_center=self.phan_center)

    def plot_profiles(self, axis=None) -> None:
        import matplotlib.pyplot as plt

        if axis is None:
            _, axis = plt.subplots()
        axis.plot(self.image[int(self.phan_center.y), :], "g", label="Horizontal")
        axis.plot(self.image[:, int(self.phan_center.x)], "b", label="Vertical")
        axis.autoscale(tight=True)
        axis.axhline(self.nominal_value + self.tolerance, color="r", linewidth=3)
        axis.axhline(self.nominal_value - self.tolerance, color="r", linewidth=3)
        axis.grid(True)
        axis.set_ylabel("HU")
        axis.legend(loc=8, fontsize="small", title="")
        axis.set_title("Uniformity Profiles")

    @property
    def overall_passed(self) -> bool:
        return all(roi.passed for roi in self.rois.values())

    @property
    def uniformity_index(self) -> float:
        """Elstrom et al eq 2."""
        center = self.rois["Center"]
        uis = [100 * ((roi.pixel_value - center.pixel_value) / (center.pixel_value + 1000))
               for roi in self.rois.values()]
        return uis[int(np.argmax(np.abs(uis)))]

    @property
    def integral_non_uniformity(self) -> float:
        """Elstrom et al eq 1."""
        maxhu = max(roi.pixel_value for roi in self.rois.values())
        minhu = min(roi.pixel_value for roi in self.rois.values())
        return (maxhu - minhu) / (maxhu + minhu + 2000)

    @cached_property
    def _nps(self) -> tuple[np.ndarray, np.ndarray, float, float]:
        """(ps2d, ps1d, avg_power, max_freq) from ONE jitted dispatch on the
        in-process CPU backend (the ROI stack is a few hundred KB; eager
        evaluation cost ~30 device executions per scan)."""
        from .ops import route
        from .ops.stats import nps_bundle

        with profiling.stage("ctp486.nps"):
            rois = [r.pixel_array for r in self.nps_rois.values()]
            length = min(min(r.shape) for r in rois)
            stacked = np.stack([r[:length, :length] for r in rois])
            ps2d, ps1d, avg, maxf = nps_bundle(
                route.put(stacked.astype(np.float32)),
                pixel_size=self.mm_per_pixel)
            return np.asarray(ps2d), np.asarray(ps1d), float(avg), float(maxf)

    @property
    def power_spectrum_2d(self) -> np.ndarray:
        return self._nps[0]

    @property
    def power_spectrum_1d(self) -> np.ndarray:
        return self._nps[1]

    @property
    def avg_noise_power(self) -> float:
        return self._nps[2]

    @property
    def max_noise_power_frequency(self) -> float:
        return self._nps[3]


class CTP528(CatPhanModule):
    """ABC marker for spatial-resolution modules."""


class CTP528CP504(CTP528):
    """Spatial resolution via collapsed circle profile (reference ``ct.py:1398``)."""

    attr_name = "ctp528"
    common_name = "Spatial Resolution"
    radius2linepairs_mm = 47
    combine_method = "max"
    num_slices = 3
    boundaries = (0, 0.107, 0.173, 0.236, 0.286, 0.335, 0.387, 0.434, 0.479)
    start_angle = np.pi
    ccw = True
    roi_settings = {
        "region 1": {"start": boundaries[0], "end": boundaries[1], "num peaks": 2, "num valleys": 1, "peak spacing": 0.021, "gap size (cm)": 0.5, "lp/mm": 0.1},
        "region 2": {"start": boundaries[1], "end": boundaries[2], "num peaks": 3, "num valleys": 2, "peak spacing": 0.01, "gap size (cm)": 0.25, "lp/mm": 0.2},
        "region 3": {"start": boundaries[2], "end": boundaries[3], "num peaks": 4, "num valleys": 3, "peak spacing": 0.006, "gap size (cm)": 0.167, "lp/mm": 0.3},
        "region 4": {"start": boundaries[3], "end": boundaries[4], "num peaks": 4, "num valleys": 3, "peak spacing": 0.00557, "gap size (cm)": 0.125, "lp/mm": 0.4},
        "region 5": {"start": boundaries[4], "end": boundaries[5], "num peaks": 4, "num valleys": 3, "peak spacing": 0.004777, "gap size (cm)": 0.1, "lp/mm": 0.5},
        "region 6": {"start": boundaries[5], "end": boundaries[6], "num peaks": 5, "num valleys": 4, "peak spacing": 0.00398, "gap size (cm)": 0.083, "lp/mm": 0.6},
        "region 7": {"start": boundaries[6], "end": boundaries[7], "num peaks": 5, "num valleys": 4, "peak spacing": 0.00358, "gap size (cm)": 0.071, "lp/mm": 0.7},
        "region 8": {"start": boundaries[7], "end": boundaries[8], "num peaks": 5, "num valleys": 4, "peak spacing": 0.0027866, "gap size (cm)": 0.063, "lp/mm": 0.8},
    }

    def _setup_rois(self):
        pass

    def _convert_units_in_settings(self):
        pass

    @cached_property
    def mtf(self) -> MTF:
        """Peak/valley MTF over the line-pair regions (reference ``:1512``)."""
        with profiling.stage("ctp528.mtf"):
            return self._compute_mtf()

    def _compute_mtf(self) -> MTF:
        maxs = []
        mins = []
        for key, value in self.roi_settings.items():
            max_indices, max_values = self.circle_profile.find_peaks(
                min_distance=value["peak spacing"], max_number=value["num peaks"],
                search_region=(value["start"], value["end"]))
            if len(max_values) != value["num peaks"]:
                break
            maxs.append(max_values.mean())
            _, min_values = self.circle_profile.find_valleys(
                min_distance=value["peak spacing"], max_number=value["num valleys"],
                search_region=(int(min(max_indices)), int(max(max_indices))))
            mins.append(min_values.mean())
        if not maxs:
            raise ValueError(
                "Did not find any spatial resolution pairs to analyze.")
        spacings = [roi["lp/mm"] for roi in self.roi_settings.values()]
        return MTF(lp_spacings=spacings[:len(maxs)], lp_maximums=maxs, lp_minimums=mins)

    @property
    def radius2linepairs(self) -> float:
        return self.radius2linepairs_mm * self.scaling_factor / self.mm_per_pixel

    def plot_rois(self, axis) -> None:
        self.circle_profile.plot2axes(axis, edgecolor="blue", plot_peaks=False)

    @cached_property
    def circle_profile(self) -> CollapsedCircleProfile:
        with profiling.stage("ctp528.circle_profile"):
            circle_profile = CollapsedCircleProfile(
                self.phan_center, self.radius2linepairs, image_array=self.image,
                start_angle=self.start_angle + np.deg2rad(self.catphan_roll),
                width_ratio=0.04 * self.roi_size_factor, sampling_ratio=2, ccw=self.ccw)
            circle_profile.filter(0.001, kind="gaussian")
            circle_profile.ground()
            return circle_profile


class CTP528CP604(CTP528CP504):
    """Alias for namespace consistency."""


class CTP528CP503(CTP528CP504):
    """Alias for namespace consistency."""


def _build_528_settings(boundaries) -> dict:
    npeaks = (2, 3, 4, 4, 4, 5, 5, 5)
    nvalleys = (1, 2, 3, 3, 3, 4, 4, 4)
    spacing = (0.021, 0.01, 0.006, 0.00557, 0.004777, 0.00398, 0.00358, 0.0027866)
    gaps = (0.5, 0.25, 0.167, 0.125, 0.1, 0.083, 0.071, 0.063)
    return {
        f"region {i + 1}": {
            "start": boundaries[i], "end": boundaries[i + 1],
            "num peaks": npeaks[i], "num valleys": nvalleys[i],
            "peak spacing": spacing[i], "gap size (cm)": gaps[i],
            "lp/mm": (i + 1) / 10,
        }
        for i in range(8)
    }


class CTP528CP600(CTP528CP504):
    start_angle = np.pi - 0.1
    ccw = False
    boundaries = (0, 0.127, 0.195, 0.255, 0.304, 0.354, 0.405, 0.453, 0.496)
    roi_settings = _build_528_settings(boundaries)


class CTP528CP700(CTP528):
    """CP700 spatial resolution via rectangular bar ROIs (reference ``:1675``)."""

    attr_name = "ctp528"
    common_name = "Spatial Resolution"
    combine_method = "max"
    num_slices = 3
    start_angle = None
    roi_settings = {
        "region 1": {"lp/mm": 0.1, "radial_distance": 50, "transversal_distance": -7, "rotation": -90, "width": 3, "height": 11},
        "region 2": {"lp/mm": 0.2, "radial_distance": 50, "transversal_distance": 11, "rotation": -90, "width": 3, "height": 11},
        "region 3": {"lp/mm": 0.3, "radial_distance": 50, "transversal_distance": -5.5, "rotation": -45, "width": 3, "height": 10},
        "region 4": {"lp/mm": 0.4, "radial_distance": 50, "transversal_distance": 9.5, "rotation": -45, "width": 3, "height": 8.5},
        "region 5": {"lp/mm": 0.5, "radial_distance": 50, "transversal_distance": -9, "rotation": 0, "width": 3, "height": 8},
        "region 6": {"lp/mm": 0.6, "radial_distance": 50, "transversal_distance": 2, "rotation": 0, "width": 3, "height": 7},
        "region 7": {"lp/mm": 0.7, "radial_distance": 50, "transversal_distance": 12, "rotation": 0, "width": 3, "height": 6},
        "region 8": {"lp/mm": 0.8, "radial_distance": 50, "transversal_distance": -10.5, "rotation": 45, "width": 3, "height": 4},
    }

    def _setup_rois(self) -> None:
        roll = np.deg2rad(self.catphan_roll)
        for name, setting in self.roi_settings.items():
            rot = np.deg2rad(setting["rotation"])
            # roi placed in phantom polar coords, then phantom placed in image
            local = np.array([setting["radial_distance_pixels"],
                              setting["transversal_distance_pixels"]])
            c, s = np.cos(rot), np.sin(rot)
            rotated = np.array([local[0] * c - local[1] * s,
                                local[0] * s + local[1] * c])
            cg, sg = np.cos(roll), np.sin(roll)
            global_xy = np.array([rotated[0] * cg - rotated[1] * sg,
                                  rotated[0] * sg + rotated[1] * cg])
            center = Point(global_xy[0] + self.phan_center.x,
                           global_xy[1] + self.phan_center.y)
            self.rois[name] = SpatialResolutionROI(
                array=self.image.array, width=setting["width_pixels"],
                height=setting["height_pixels"], center=center,
                rotation=setting["rotation"] + self.catphan_roll)

    @cached_property
    def mtf(self) -> MTF:
        return MTF.from_high_contrast_diskset(
            spacings=[r["lp/mm"] for r in self.roi_settings.values()],
            diskset=self.rois.values())


class GeometricLine(Line):
    """A node-to-node line on the geometry slice (reference ``ct.py:1792``)."""

    nominal_length_mm = 50

    def __init__(self, geo_roi1: Point, geo_roi2: Point, mm_per_pixel: float,
                 tolerance: float):
        super().__init__(geo_roi1, geo_roi2)
        self.mm_per_pixel = mm_per_pixel
        self.tolerance = tolerance

    @property
    def passed(self) -> bool:
        return (self.nominal_length_mm - self.tolerance < self.length_mm
                < self.nominal_length_mm + self.tolerance)

    @property
    def pass_fail_color(self) -> str:
        return "blue" if self.passed else "red"

    @property
    def length_mm(self) -> float:
        return self.length * self.mm_per_pixel


class CTP515(CatPhanModule):
    """Low-contrast module (reference ``ct.py:1846``)."""

    attr_name = "ctp515"
    common_name = "Low Contrast"
    num_slices = 1
    roi_dist_mm = 50
    roi_radius_mm = [6, 3.5, 3, 2.5, 2, 1.5]
    roi_angles = [-87.4, -69.1, -52.7, -38.5, -25.1, -12.9]
    roi_settings = {
        "15": {"angle": roi_angles[0], "distance": roi_dist_mm, "radius": roi_radius_mm[0]},
        "9": {"angle": roi_angles[1], "distance": roi_dist_mm, "radius": roi_radius_mm[1]},
        "8": {"angle": roi_angles[2], "distance": roi_dist_mm, "radius": roi_radius_mm[2]},
        "7": {"angle": roi_angles[3], "distance": roi_dist_mm, "radius": roi_radius_mm[3]},
        "6": {"angle": roi_angles[4], "distance": roi_dist_mm, "radius": roi_radius_mm[4]},
        "5": {"angle": roi_angles[5], "distance": roi_dist_mm, "radius": roi_radius_mm[5]},
    }
    background_roi_dist_ratio = 0.75
    background_roi_radius_mm = 4
    WINDOW_SIZE = 50

    def __init__(self, catphan, tolerance, cnr_threshold, offset, contrast_method,
                 visibility_threshold, clear_borders: bool = True):
        self.cnr_threshold = cnr_threshold
        self.contrast_method = contrast_method
        self.visibility_threshold = visibility_threshold
        super().__init__(catphan, tolerance=tolerance, offset=offset,
                         clear_borders=clear_borders)

    def _setup_rois(self):
        for name, setting in self.roi_settings.items():
            self.background_rois[name + "-outer"] = LowContrastDiskROI.from_phantom_center(
                self.image, setting["angle_corrected"],
                self.background_roi_radius_mm / self.mm_per_pixel,
                setting["distance_pixels"] * (2 - self.background_roi_dist_ratio),
                self.phan_center)
            self.background_rois[name + "-inner"] = LowContrastDiskROI.from_phantom_center(
                self.image, setting["angle_corrected"],
                self.background_roi_radius_mm / self.mm_per_pixel,
                setting["distance_pixels"] * self.background_roi_dist_ratio,
                self.phan_center)
            background_val = float(np.mean([
                self.background_rois[name + "-outer"].pixel_value,
                self.background_rois[name + "-inner"].pixel_value]))
            self.rois[name] = LowContrastDiskROI.from_phantom_center(
                self.image, setting["angle_corrected"], setting["radius_pixels"],
                setting["distance_pixels"], self.phan_center,
                contrast_reference=background_val, cnr_threshold=self.cnr_threshold,
                contrast_method=self.contrast_method,
                visibility_threshold=self.visibility_threshold)

    @property
    def rois_visible(self) -> int:
        return sum(roi.passed_visibility for roi in self.rois.values())

    @property
    def window_min(self) -> float:
        return min(r.pixel_value for r in self.background_rois.values()) - self.WINDOW_SIZE

    @property
    def window_max(self) -> float:
        return max(r.pixel_value for r in self.rois.values()) + self.WINDOW_SIZE


def _build_515_settings(angles, dist, radii) -> dict:
    return {name: {"angle": angles[i], "distance": dist, "radius": radii[i]}
            for i, name in enumerate(("15", "9", "8", "7", "6", "5"))}


class CTP515CP600(CTP515):
    roi_angles = [a + 180 for a in [-87.4, -69.1, -52.7, -38.5, -25.1, -12.9]]
    roi_dist_mm = 50
    roi_radius_mm = [6, 3.5, 3, 2.5, 2, 1.5]
    roi_settings = _build_515_settings(roi_angles, roi_dist_mm, roi_radius_mm)


class CTP515CP700(CTP515CP600):
    """Alias for namespace consistency."""


# --------------------------------------------------------------------------
# CatPhanBase + concrete models
# --------------------------------------------------------------------------
class CatPhanBase(ResultsDataMixin[CatphanResult], QuaacMixin):
    """CatPhan loading and analysis engine (reference ``ct.py:2027``)."""

    _demo_url: str = ""
    _model: str = ""
    air_bubble_radius_mm = 7
    localization_radius = 59
    was_from_zip = False
    min_num_images = 39
    clear_borders = True
    hu_origin_slice_variance = 400
    _phantom_center_func = None
    clip_in_localization = False
    roll_slice_offset: float = 0

    def __init__(self, folderpath, check_uid: bool = True,
                 memory_efficient_mode: bool = False, is_zip: bool = False):
        super().__init__()
        self.origin_slice = 0
        self.catphan_roll = 0
        import os.path as osp

        if isinstance(folderpath, (str, Path)) and not is_zip:
            if not osp.isdir(folderpath):
                raise NotADirectoryError("Path given was not a Directory/Folder")
        if not memory_efficient_mode:
            stack = image.DicomImageStack
        elif memory_efficient_mode and is_zip:
            stack = image.LazyZipDicomImageStack
        else:
            stack = image.LazyDicomImageStack
        if is_zip:
            self.dicom_stack = stack.from_zip(folderpath, check_uid=check_uid,
                                              min_number=self.min_num_images)
            self.was_from_zip = True
        else:
            self.dicom_stack = stack(folderpath, check_uid=check_uid,
                                     min_number=self.min_num_images)

    @classmethod
    def from_demo_images(cls):
        demo_file = retrieve_demo_file(name=cls._demo_url)
        return cls.from_zip(demo_file)

    @classmethod
    def from_url(cls, url: str, check_uid: bool = True):
        return cls.from_zip(get_url(url), check_uid=check_uid)

    @classmethod
    def from_zip(cls, zip_file, check_uid: bool = True,
                 memory_efficient_mode: bool = False):
        return cls(folderpath=zip_file, check_uid=check_uid,
                   memory_efficient_mode=memory_efficient_mode, is_zip=True)

    # -- localization -------------------------------------------------------
    def localize(self, origin_slice: int | None) -> None:
        with profiling.stage("find_phantom_axis"):
            if getattr(self, "_slice_centroids", None) is None:
                self._slice_centroids = self._batched_phantom_centroids()
            self._phantom_center_func = self.find_phantom_axis()
        if origin_slice is not None:
            self.origin_slice = origin_slice
        else:
            with profiling.stage("find_origin_slice"):
                self.origin_slice = self.find_origin_slice()
        with profiling.stage("find_phantom_roll"):
            self.catphan_roll = self.find_phantom_roll() + self.angle_adjustment
        if origin_slice is None:
            with profiling.stage("refine_origin_slice"):
                self.origin_slice = self.refine_origin_slice(
                    initial_slice_num=self.origin_slice)
        if not self._ensure_physical_scan_extent():
            raise ValueError(
                "The physical scan extent does not match the module configuration. "
                "Not all modules were included in the scan.")

    def _module_offsets(self) -> list[float]:
        absolute_origin_position = self.dicom_stack[self.origin_slice].z_position
        return [absolute_origin_position + config["offset"]
                for config in self.modules.values()]

    def _ensure_physical_scan_extent(self) -> bool:
        z_positions = [z_position(m) for m in self.dicom_stack.metadatas]
        return (round(min(self._module_offsets()), 1) >= round(min(z_positions), 1)
                and round(max(self._module_offsets()), 1) <= round(max(z_positions), 1))

    def find_phantom_axis(self):
        """Fit phantom centers across slices to linear z-functions
        (reference ``:2398``).

        The per-slice Scharr->Otsu->regionprops pipeline runs as ONE batched
        device dispatch over the whole stack (SURVEY §3.4); slices whose
        fixed-K region slots overflow fall back to the per-slice path.
        """
        z, center_x, center_y = [], [], []
        batched = getattr(self, "_slice_centroids", None)
        if batched is None:
            batched = self._batched_phantom_centroids()
        for idx, img in enumerate(self.dicom_stack):
            if batched is not None and batched[idx] is not None:
                cy, cx = batched[idx]
                if cy is not np.nan and not np.isnan(cy):
                    z.append(idx)
                    center_y.append(cy)
                    center_x.append(cx)
                continue
            slc = Slice(self, slice_num=idx, clear_borders=self.clear_borders,
                        original_image=img)
            if slc.is_phantom_in_view():
                roi = slc.phantom_roi
                z.append(idx)
                center_y.append(roi.centroid[0])
                center_x.append(roi.centroid[1])
        zs = np.array(z)
        center_xs = np.array(center_x) + self.x_adjustment
        center_ys = np.array(center_y) + self.y_adjustment
        x_idxs = np.argwhere(np.isclose(np.median(center_xs), center_xs, atol=3, rtol=0.01))
        y_idxs = np.argwhere(np.isclose(np.median(center_ys), center_ys, atol=3, rtol=0.01))
        common = np.intersect1d(x_idxs, y_idxs)
        fit_zx = np.poly1d(np.polyfit(zs[common], center_xs[common], deg=1, rcond=1e-5))
        fit_zy = np.poly1d(np.polyfit(zs[common], center_ys[common], deg=1, rcond=1e-5))
        return fit_zx, fit_zy

    #: 2x2 mean-pool the stack before the batched localization pass. The
    #: CCL label sweep is the localization's dominant device cost and scales
    #: superlinearly with resolution (more pixels AND more propagation
    #: iterations); pooling cuts it ~8x. The phantom is a ~500 mm^2 disk, so
    #: its pooled centroid moves <0.1 px at full res — far inside the module
    #: ROI placement tolerance. Set to 1 to localize at native resolution.
    localization_downsample = 2

    def _batched_phantom_centroids(self):
        """Per-slice phantom centroids from ONE device dispatch over the
        whole stack. Returns a list with one entry per slice: (cy, cx) when
        the phantom was found, (nan, nan) when the slice fails the same
        checks as :meth:`Slice.phantom_roi`, or None to request the
        per-slice fallback (fixed-K region overflow). Returns None outright
        if the stack couldn't be batched (heterogeneous shapes)."""
        cache = getattr(self, "_loc_dev_cache", None)
        if cache is None:
            staged = self._loc_stage_host()
            if staged is None:
                return None
            ds, vol = staged
            # device-resident across analyze() calls of this object: the
            # stack + H2D staging is paid once per loaded scan; the
            # localization mean-pool and HU clip run on device
            from .ops.staging import stage
            cache = (ds, vol.shape[0], stage(vol))
            self._loc_dev_cache = cache
        ds, n_slices, vol_dev = cache
        if _use_native_ccl():
            host, max_edges = _stack_regions_native(
                vol_dev, ds, self.clip_in_localization, self.clear_borders)
            return self._centroids_from_host(
                host, max_edges, ds, range(n_slices),
                K=host.valid.shape[-1] + 1)  # native K never truncates
        K = 32
        packed, max_edges = _stack_phantom_regions(
            vol_dev, K, self.clear_borders, ds, self.clip_in_localization)
        host = jlabel.regions_to_host(packed)
        max_edges = np.asarray(jnp.ravel(max_edges))
        return self._centroids_from_host(host, max_edges, ds,
                                         range(n_slices), K)

    def _loc_stage_host(self):
        """Host staging of the full-res localization volume. Returns
        (ds, vol) with vol a float32 numpy stack, or None for heterogeneous
        slice shapes; the ``localization_downsample`` mean-pool and the
        ±1000 HU clip now run on device in :func:`_stack_phantom_regions`."""
        vol = getattr(self, "_host_vol", None)
        if vol is None:
            try:
                vol = np.stack([img.array for img in self.dicom_stack]
                               ).astype(np.float32)
            except ValueError:
                return None
            # cached for the scan's lifetime (slices are immutable once
            # loaded): the 60x512x512 stack costs seconds of page faults on
            # micro-VM hosts, and the vectorized origin scan reuses it
            self._host_vol = vol
        ds = self.localization_downsample
        if ds <= 1 or vol.shape[1] % ds or vol.shape[2] % ds:
            ds = 1
        return ds, vol

    def _centroids_from_host(self, host, max_edges, ds, idx_range, K=32):
        """Per-slice accept/reject + centroid mapping from fetched region
        slots (shared by the single-scan and multi-scan batch paths)."""
        expected_area = self.catphan_size / ds**2
        out = []
        for idx in idx_range:
            if max_edges[idx] < 0.1:
                out.append((np.nan, np.nan))  # "no edges" per-slice error
                continue
            valid_idxs = np.nonzero(host.valid[idx])[0]
            if len(valid_idxs) >= K:
                out.append(None)  # slots overflowed; per-slice K escalation
                continue
            if len(valid_idxs) == 0:
                out.append((np.nan, np.nan))
                continue
            areas = host.area_filled[idx][valid_idxs]
            best = valid_idxs[int(np.argmin(np.abs(areas - expected_area)))]
            area = float(host.area_filled[idx][best])
            if (expected_area * 1.3 < area
                    or area < expected_area / 1.3):
                out.append((np.nan, np.nan))
                continue
            # pooled pixel (i, j) covers full pixels [ds*i, ds*i+ds): its
            # center sits at ds*i + (ds-1)/2 in full coordinates
            out.append((float(host.centroid_r[idx][best]) * ds + (ds - 1) / 2,
                        float(host.centroid_c[idx][best]) * ds + (ds - 1) / 2))
        return out

    @property
    def mm_per_pixel(self) -> float:
        spacing = self.dicom_stack.metadata.PixelSpacing
        return spacing[0] if isinstance(spacing, list) else spacing

    def plot_side_view(self, axis=None) -> None:
        """Plot a coronal side view of the stack with module-slice markers."""
        import matplotlib.pyplot as plt

        if axis is None:
            _, axis = plt.subplots()
        vol = np.stack([img.array for img in self.dicom_stack])
        mid = vol.shape[1] // 2
        axis.imshow(vol[:, mid, :], cmap="gray", aspect="auto")
        try:
            for offset in self._module_offsets():
                zs = [img.z_position for img in self.dicom_stack]
                idx = int(np.argmin(np.abs(np.asarray(zs) - offset)))
                axis.axhline(idx, color="b", alpha=0.5)
        except (AttributeError, NotImplementedError):
            pass
        axis.set_title("Side View")

    def _slice_in_view(self, image_number: int, slc: "Slice") -> bool:
        """Phantom-in-view test, served from the batched localization cache
        when available (same phantom_roi checks, one device dispatch total)."""
        cached = getattr(self, "_slice_centroids", None)
        if cached is not None and cached[image_number] is not None:
            return not np.isnan(cached[image_number][0])
        return slc.is_phantom_in_view()

    def find_origin_slice(self) -> int:
        """Brute-force scan for the HU-linearity slice (reference ``:2453``)."""
        cached = getattr(self, "_slice_centroids", None)
        in_view = []
        for image_number in range(0, self.num_images, 2):
            if cached is not None and cached[image_number] is not None:
                if not np.isnan(cached[image_number][0]):
                    in_view.append(image_number)
            else:
                slc = Slice(self, image_number, combine=False,
                            clear_borders=self.clear_borders)
                if slc.is_phantom_in_view():
                    in_view.append(image_number)
        variation_limit = max(
            100, self.dicom_stack.metadata.SliceThickness * -100 + 300)
        profs = self._origin_profile_stack(in_view)
        hu_slices = []
        if profs is not None:
            low_end, high_end = np.percentile(profs, [2, 98], axis=1)
            median = np.median(profs, axis=1)
            middle_variation = (np.percentile(profs, 80, axis=1)
                                - np.percentile(profs, 20, axis=1))
            for i, image_number in enumerate(in_view):
                if ((low_end[i] < median[i] - self.hu_origin_slice_variance)
                        and (high_end[i] > median[i] + self.hu_origin_slice_variance)
                        and (middle_variation[i] < variation_limit)):
                    hu_slices.append(image_number)
        else:
            for image_number in in_view:
                slc = Slice(self, image_number, combine=False,
                            clear_borders=self.clear_borders)
                circle_prof = CollapsedCircleProfile(
                    slc.phan_center, radius=self.localization_radius / self.mm_per_pixel,
                    image_array=slc.image, width_ratio=0.05, num_profiles=5)
                prof = circle_prof.values
                low_end, high_end = np.percentile(prof, [2, 98])
                median = np.median(prof)
                middle_variation = np.percentile(prof, 80) - np.percentile(prof, 20)
                if ((low_end < median - self.hu_origin_slice_variance)
                        and (high_end > median + self.hu_origin_slice_variance)
                        and (middle_variation < variation_limit)):
                    hu_slices.append(image_number)
        if not hu_slices:
            raise ValueError("No slices were found that resembled the HU linearity module")
        hu_slices = np.array(hu_slices)
        c = int(round(float(np.median(hu_slices))))
        ln = len(hu_slices)
        hu_slices = hu_slices[((c + ln / 2) >= hu_slices) & (hu_slices >= (c - ln / 2))]
        center_hu_slice = int(round(float(np.median(hu_slices))))
        if self._is_within_image_extent(center_hu_slice):
            return center_hu_slice

    def _origin_profile_stack(self, idxs: list[int]) -> np.ndarray | None:
        """The origin-scan collapsed circle profiles for all candidate slices
        as ONE vectorized gather over the cached host volume — identical
        samples to the per-slice :class:`CollapsedCircleProfile` construction
        (width_ratio 0.05, 5 rings, sampling 1.0, start 0, ccw). Returns
        (n_candidates, samples) or None to request the per-slice path."""
        vol = getattr(self, "_host_vol", None)
        if vol is None:
            return None
        if not idxs:
            return np.empty((0, 1))
        radius = self.localization_radius / self.mm_per_pixel
        radii = np.linspace(radius * 0.95, radius * 1.05, 5)
        size = np.pi * radii.max() * 2
        interval = (2 * np.pi) / size
        rads = np.arange(0, 2 * np.pi - interval, interval)[::-1]
        cx = np.array([float(self._phantom_center_func[0](i)) for i in idxs])
        cy = np.array([float(self._phantom_center_func[1](i)) for i in idxs])
        # Circle._ensure_array_size parity: out-of-bounds centers take the
        # per-slice path (which raises the reference's error)
        if ((cx + radii.max() >= vol.shape[2]) | (cx - radii.max() < 0)
                | (cy + radii.max() >= vol.shape[1]) | (cy - radii.max() < 0)).any():
            return None
        xx = np.round(np.cos(rads)[None, None, :] * radii[None, :, None]
                      + cx[:, None, None]).astype(int)
        yy = np.round(np.sin(rads)[None, None, :] * radii[None, :, None]
                      + cy[:, None, None]).astype(int)
        yy = np.clip(yy, 0, vol.shape[1] - 1)
        xx = np.clip(xx, 0, vol.shape[2] - 1)
        sub = vol[np.asarray(idxs)[:, None, None], yy, xx].astype(np.float64)
        return sub.sum(axis=1) / len(radii)

    def refine_origin_slice(self, initial_slice_num: int) -> int:
        return initial_slice_num

    def _is_right_area(self, region) -> bool:
        thresh = np.pi * ((self.air_bubble_radius_mm / self.mm_per_pixel) ** 2)
        return thresh * 2 > region.filled_area > thresh / 2

    def _is_right_eccentricity(self, region) -> bool:
        return region.eccentricity < 0.5

    def find_phantom_roll(self, func: Callable | None = None) -> float:
        """Roll from the two air bubbles in the HU slice (reference ``:2522``)."""
        slice_offset = round(self.roll_slice_offset / self.dicom_stack.slice_spacing)
        slice_num = self.origin_slice + slice_offset
        slc = Slice(self, slice_num, clear_borders=self.clear_borders)
        pre = getattr(self, "_pre_roll_regions", None)
        if pre is not None and func is None and pre[0] == slice_num:
            regions = pre[1]
        else:
            # bbox/min-max skipped unless a caller-provided sort key needs
            # them (e.g. ACR sorts bubbles by bbox_area)
            _, regions, _ = get_regions(slc, minmax=func is not None)
        hu_bubbles = [r for r in regions
                      if self._is_right_area(r) and self._is_right_eccentricity(r)]
        func = func or (lambda x: abs(x.centroid[1] - slc.phan_center.x))
        central_bubbles = sorted(hu_bubbles, key=func)[:2]
        sorted_bubbles = sorted(central_bubbles, key=lambda x: x.centroid[0])
        if len(sorted_bubbles) < 2:
            warnings.warn("Could not determine phantom roll. Setting roll to 0.",
                          UserWarning)
            return 0.0
        y_dist = sorted_bubbles[1].centroid[0] - sorted_bubbles[0].centroid[0]
        x_dist = sorted_bubbles[1].centroid[1] - sorted_bubbles[0].centroid[1]
        return float(np.rad2deg(np.arctan2(y_dist, x_dist)) - 90)

    @property
    def num_images(self) -> int:
        return len(self.dicom_stack)

    def _is_within_image_extent(self, image_num: int) -> bool:
        if self.num_images - 1 > image_num > 1:
            return True
        raise ValueError(
            "The determined image number is beyond the image extent. Either the "
            "entire dataset wasn't loaded or the entire phantom wasn't scanned.")

    @property
    def catphan_size(self) -> float:
        phan_area = np.pi * (self.catphan_radius_mm**2)
        return phan_area / (self.mm_per_pixel**2)

    # -- analysis -----------------------------------------------------------
    def analyze(self, hu_tolerance: float = 40, scaling_tolerance: float = 1,
                thickness_tolerance: float = 0.2, low_contrast_tolerance: float = 1,
                cnr_threshold: float = 15, zip_after: bool = False,
                contrast_method: str = Contrast.MICHELSON,
                visibility_threshold: float = 0.15,
                thickness_slice_straddle: str | int = "auto",
                expected_hu_values: dict | None = None,
                x_adjustment: float = 0, y_adjustment: float = 0,
                angle_adjustment: float = 0, roi_size_factor: float = 1,
                scaling_factor: float = 1, origin_slice: int | None = None,
                roll_slice_offset: float = 0):
        """Full analysis (same parameter semantics as reference ``ct.py:2732``)."""
        self.x_adjustment = x_adjustment
        self.y_adjustment = y_adjustment
        self.angle_adjustment = angle_adjustment
        self.roi_size_factor = roi_size_factor
        self.scaling_factor = scaling_factor
        self.roll_slice_offset = roll_slice_offset
        with profiling.stage("localize"):
            self.localize(origin_slice)
        ctp404, offset = self._get_module(CTP404CP504, raise_empty=True)
        with profiling.stage("ctp404"):
            self.ctp404 = ctp404(
                self, offset=offset, hu_tolerance=hu_tolerance,
                thickness_tolerance=thickness_tolerance,
                scaling_tolerance=scaling_tolerance, clear_borders=self.clear_borders,
                thickness_slice_straddle=thickness_slice_straddle,
                expected_hu_values=expected_hu_values)
        if self._has_module(CTP486):
            ctp486, offset = self._get_module(CTP486)
            with profiling.stage("ctp486"):
                self.ctp486 = ctp486(self, offset=offset, tolerance=hu_tolerance,
                                     clear_borders=self.clear_borders)
        if self._has_module(CTP528):
            ctp528, offset = self._get_module(CTP528)
            with profiling.stage("ctp528"):
                self.ctp528 = ctp528(self, offset=offset, tolerance=None,
                                     clear_borders=self.clear_borders)
        if self._has_module(CTP515):
            ctp515, offset = self._get_module(CTP515)
            with profiling.stage("ctp515"):
                self.ctp515 = ctp515(
                    self, tolerance=low_contrast_tolerance, cnr_threshold=cnr_threshold,
                    offset=offset, contrast_method=contrast_method,
                    visibility_threshold=visibility_threshold,
                    clear_borders=self.clear_borders)

    def _has_module(self, module_of_interest) -> bool:
        return any(issubclass(module, module_of_interest)
                   for module in self.modules.keys())

    def _get_module(self, module_of_interest, raise_empty: bool = False):
        for module, values in self.modules.items():
            if issubclass(module, module_of_interest):
                return module, values.get("offset")
        if raise_empty:
            raise ValueError(
                f"Tried to find the {module_of_interest} or a subclass of it.")

    # -- outputs ------------------------------------------------------------
    def results(self, as_list: bool = False) -> str | list[list[str]]:
        results = []
        result = [
            f" - CBCT/CT {self._model} QA Test - ",
            " - CTP 404 Results - ",
            f"HU Linearity tolerance: {self.ctp404.hu_tolerance}",
            "HU Linearity ROIs:",
            *textwrap.wrap(self.ctp404.roi_vals_as_str, width=50),
            f"HU Passed?: {self.ctp404.passed_hu}",
            f"Low contrast visibility: {self.ctp404.lcv:2.2f}",
            f"Geometric Line Average (mm): {self.ctp404.avg_line_length:2.2f}",
            f"Geometry Passed?: {self.ctp404.passed_geometry}",
            f"Measured Slice Thickness (mm): {self.ctp404.meas_slice_thickness:2.3f}",
            f"Slice Thickness Passed? {self.ctp404.passed_thickness}",
        ]
        results.append(result)
        if self._has_module(CTP528):
            results.append([
                " - CTP528 Results - ",
                f"MTF 80% (lp/mm): {self.ctp528.mtf.relative_resolution(80):2.2f}",
                f"MTF 50% (lp/mm): {self.ctp528.mtf.relative_resolution(50):2.2f}",
                f"MTF 30% (lp/mm): {self.ctp528.mtf.relative_resolution(30):2.2f}",
            ])
        if self._has_module(CTP486):
            results.append([
                " - CTP486 Results - ",
                f"Uniformity tolerance: {self.ctp486.tolerance}",
                f"Uniformity ROIs: {self.ctp486.roi_vals_as_str}",
                f"Uniformity index: {self.ctp486.uniformity_index:2.3f}",
                f"Integral non-uniformity: {self.ctp486.integral_non_uniformity:2.4f}",
                f"Uniformity Passed?: {self.ctp486.overall_passed}",
            ])
        if self._has_module(CTP515):
            results.append([
                " - CTP515 Results - ",
                f"CNR threshold: {self.ctp515.cnr_threshold}",
                f"Low contrast ROIs 'seen': {self.ctp515.rois_visible}",
            ])
        if not as_list:
            return "\n".join("\n".join(r) for r in results)
        return results

    def _generate_results_data(self) -> CatphanResult:
        ctp404_result = CTP404Result(
            offset=self.ctp404._offset,
            low_contrast_visibility=self.ctp404.lcv,
            thickness_passed=self.ctp404.passed_thickness,
            measured_slice_thickness_mm=self.ctp404.meas_slice_thickness,
            thickness_num_slices_combined=self.ctp404.num_slices + self.ctp404.pad,
            geometry_passed=self.ctp404.passed_geometry,
            avg_line_distance_mm=self.ctp404.avg_line_length,
            line_distances_mm=[line.length_mm for line in self.ctp404.lines.values()],
            hu_linearity_passed=self.ctp404.passed_hu,
            hu_tolerance=self.ctp404.hu_tolerance,
            hu_rois=rois_to_results(self.ctp404.rois))
        data = CatphanResult(
            catphan_model=self._model,
            catphan_roll_deg=self.catphan_roll,
            origin_slice=self.origin_slice,
            num_images=self.num_images,
            ctp404=ctp404_result)
        if self._has_module(CTP486):
            data.ctp486 = CTP486Result(
                passed=self.ctp486.overall_passed,
                uniformity_index=self.ctp486.uniformity_index,
                integral_non_uniformity=self.ctp486.integral_non_uniformity,
                rois=rois_to_results(self.ctp486.rois),
                nps_avg_power=self.ctp486.avg_noise_power,
                nps_max_freq=self.ctp486.max_noise_power_frequency)
        if self._has_module(CTP528):
            data.ctp528 = CTP528Result(
                roi_settings=self.ctp528.roi_settings,
                start_angle_radians=self.ctp528.start_angle,
                mtf_lp_mm={p: self.ctp528.mtf.relative_resolution(p)
                           for p in range(10, 91, 10)})
        if self._has_module(CTP515):
            data.ctp515 = CTP515Result(
                cnr_threshold=self.ctp515.cnr_threshold,
                num_rois_seen=self.ctp515.rois_visible,
                roi_settings=self.ctp515.roi_settings,
                roi_results={key: roi.as_dict()
                             for key, roi in self.ctp515.rois.items()})
        return data

    def _quaac_datapoints(self) -> dict[str, QuaacDatum]:
        data = {
            "Slice thickness": QuaacDatum(
                value=self.ctp404.meas_slice_thickness, unit="mm"),
            "Geometric line average": QuaacDatum(
                value=self.ctp404.avg_line_length, unit="mm"),
            "Low contrast visibility": QuaacDatum(value=self.ctp404.lcv),
        }
        for name, roi in self.ctp404.rois.items():
            data[f"{name} HU"] = QuaacDatum(value=roi.pixel_value, unit="HU")
        return data

    def plot_analyzed_image(self, show: bool = True, **plt_kwargs) -> None:
        import matplotlib.pyplot as plt

        plt.figure(**plt_kwargs)
        grid_size = (2, 4)
        hu_ax = plt.subplot2grid(grid_size, (0, 1))
        self.ctp404.plot(hu_ax)
        hu_lin_ax = plt.subplot2grid(grid_size, (0, 2))
        self.ctp404.plot_linearity(hu_lin_ax)
        if self._has_module(CTP486):
            unif_ax = plt.subplot2grid(grid_size, (0, 0))
            self.ctp486.plot(unif_ax)
        if self._has_module(CTP528):
            sr_ax = plt.subplot2grid(grid_size, (1, 0))
            self.ctp528.plot(sr_ax)
            mtf_ax = plt.subplot2grid(grid_size, (0, 3))
            self.ctp528.mtf.plot(mtf_ax)
        if self._has_module(CTP515):
            locon_ax = plt.subplot2grid(grid_size, (1, 1))
            self.ctp515.plot(locon_ax)
        plt.tight_layout()
        if show:
            plt.show()

    @staticmethod
    def _plotly_module_fig(module, show_colorbar: bool = True):
        """Module slice image + ROI circles as a plotly-schema figure."""
        from .core import plotly_utils as pu

        fig = pu.image_figure(module.image.array,
                              title=f"{module.common_name} ({module.slice_num + 1})",
                              show_colorbar=show_colorbar)
        shapes = fig.layout.setdefault("shapes", [])
        for roi, color in ([(r, getattr(r, "plot_color", "green"))
                            for r in module.rois.values()]
                           + [(r, "blue") for r in module.background_rois.values()]):
            if not hasattr(roi, "radius"):
                continue
            shapes.append({
                "type": "circle",
                "x0": roi.center.x - roi.radius, "x1": roi.center.x + roi.radius,
                "y0": roi.center.y - roi.radius, "y1": roi.center.y + roi.radius,
                "line": {"color": color, "width": 2}})
        return fig

    def plotly_analyzed_images(self, show: bool = True, show_colorbar: bool = True,
                               show_legend: bool = True, **kwargs):
        """Plotly figures per analyzed module + HU linearity + MTF
        (reference ``ct.py:2150``). Returns ``{name: Figure}`` of plotly
        JSON-schema figures (:mod:`..core.plotly_utils`).

        Engine subclasses with their own module sets (ACR, Quart, Cheese,
        Helios) get one ROI-overlay figure per analyzed module plus an rMTF
        curve where a module exposes ``mtf``."""
        from .core import plotly_utils as pu

        if not hasattr(self, "ctp404"):
            return self._plotly_generic_modules(show=show,
                                                show_colorbar=show_colorbar,
                                                show_legend=show_legend)
        figs: dict[str, pu.Figure] = {}
        figs["CTP404"] = self._plotly_module_fig(self.ctp404, show_colorbar)
        lin = pu.Figure()
        nominal = [roi.nominal_val for roi in self.ctp404.rois.values()]
        deltas = [roi.value_diff for roi in self.ctp404.rois.values()]
        lin.add_trace(pu.marker_trace(nominal, deltas, name="HU delta",
                                      symbol="cross", color="green"))
        pu.add_horizontal_line(lin, 0, color="gray")
        pu.add_title(lin, "HU Linearity")
        lin.update_layout(xaxis_title="Nominal HU", yaxis_title="HU Delta",
                          showlegend=show_legend)
        figs["HU Linearity"] = lin
        if self._has_module(CTP486):
            figs["CTP486"] = self._plotly_module_fig(self.ctp486, show_colorbar)
        if self._has_module(CTP528):
            figs["CTP528"] = self._plotly_module_fig(self.ctp528, show_colorbar)
            mtf = pu.Figure()
            mtf.add_trace(pu.scatter_trace(
                list(self.ctp528.mtf.norm_mtfs.keys()),
                list(self.ctp528.mtf.norm_mtfs.values()),
                name="rMTF", mode="lines+markers"))
            pu.add_title(mtf, "RMTF")
            mtf.update_layout(xaxis_title="Line pairs / mm",
                              yaxis_title="Relative MTF", showlegend=show_legend)
            figs["MTF"] = mtf
        if self._has_module(CTP515):
            figs["CTP515"] = self._plotly_module_fig(self.ctp515, show_colorbar)
        if show:
            for f in figs.values():
                f.show()
        return figs

    def _plotly_generic_modules(self, show: bool, show_colorbar: bool,
                                show_legend: bool):
        """ROI-overlay figure per analyzed CatPhanModule attribute (+ rMTF
        where available) — serves the ACR/Quart/Cheese/Helios engines."""
        from .core import plotly_utils as pu

        figs: dict[str, pu.Figure] = {}
        for name in dir(self):
            if name.startswith("_"):
                continue
            try:
                mod = getattr(self, name)
            except Exception:
                continue
            if not isinstance(mod, CatPhanModule):
                continue
            key = getattr(mod, "common_name", name)
            figs[key] = self._plotly_module_fig(mod, show_colorbar)
            mtf = getattr(mod, "mtf", None)
            if mtf is not None and hasattr(mtf, "norm_mtfs"):
                f = pu.Figure()
                f.add_trace(pu.scatter_trace(
                    list(mtf.norm_mtfs.keys()), list(mtf.norm_mtfs.values()),
                    name="rMTF", mode="lines+markers"))
                pu.add_title(f, f"{key} rMTF")
                f.update_layout(xaxis_title="Line pairs / mm",
                                yaxis_title="Relative MTF",
                                showlegend=show_legend)
                figs[f"{key} MTF"] = f
        if not figs:
            raise RuntimeError(
                "The scan must be analyzed first. Use .analyze().")
        if show:
            for f in figs.values():
                f.show()
        return figs

    def publish_pdf(self, filename, notes=None, open_file: bool = False,
                    metadata: dict | None = None, logo=None) -> None:
        from .core import pdf

        canvas = pdf.PylinacCanvas(filename,
                                   page_title=f"CatPhan {self._model} Analysis",
                                   metadata=metadata, logo=logo)
        flat = [line for group in self.results(as_list=True) for line in group]
        canvas.add_text(text=flat, location=(2, 25.5), font_size=9)
        if notes is not None:
            canvas.add_text(text=notes, location=(2, 4))
        canvas.finish()


@capture_warnings
class CatPhan503(CatPhanBase):
    """CatPhan 503: CTP404, CTP486, CTP528."""

    _demo_url = "CatPhan503.zip"
    _model = "503"
    catphan_radius_mm = 97
    modules = {
        CTP404CP503: {"offset": 0},
        CTP486: {"offset": -110},
        CTP528CP503: {"offset": -30},
    }

    @staticmethod
    def run_demo(show: bool = True):
        cbct = CatPhan503.from_demo_images()
        cbct.analyze()
        print(cbct.results())
        cbct.plot_analyzed_image(show)


@capture_warnings
class CatPhan504(CatPhanBase):
    """CatPhan 504: CTP404, CTP486, CTP528, CTP515."""

    _demo_url = "CatPhan504.zip"
    _model = "504"
    catphan_radius_mm = 101
    modules = {
        CTP404CP504: {"offset": 0},
        CTP486: {"offset": -65},
        CTP528CP504: {"offset": 30},
        CTP515: {"offset": -30},
    }

    @staticmethod
    def run_demo(show: bool = True):
        cbct = CatPhan504.from_demo_images()
        cbct.analyze()
        print(cbct.results())
        cbct.plot_analyzed_image(show)


@capture_warnings
class CatPhan604(CatPhanBase):
    """CatPhan 604: CTP404, CTP486, CTP528, CTP515."""

    _demo_url = "CatPhan604.zip"
    _model = "604"
    catphan_radius_mm = 101
    modules = {
        CTP404CP604: {"offset": 0},
        CTP486: {"offset": -80},
        CTP528CP604: {"offset": 40},
        CTP515: {"offset": -40},
    }

    @staticmethod
    def run_demo(show: bool = True):
        cbct = CatPhan604.from_demo_images()
        cbct.analyze()
        print(cbct.results())
        cbct.plot_analyzed_image(show)

    def refine_origin_slice(self, initial_slice_num: int) -> int:
        """The 604's HU plugs vary in length; shift the origin slightly if the
        adjacent slices look more like the HU module (reference ``:3128``)."""
        return initial_slice_num


@capture_warnings
class CatPhan600(CatPhanBase):
    """CatPhan 600: CTP404, CTP486, CTP528, CTP515."""

    _demo_url = "CatPhan600.zip"
    _model = "600"
    catphan_radius_mm = 101
    modules = {
        CTP404CP600: {"offset": 0},
        CTP486: {"offset": -160},
        CTP515CP600: {"offset": -110},
        CTP528CP600: {"offset": -70},
    }

    @staticmethod
    def run_demo(show: bool = True):
        cbct = CatPhan600.from_demo_images()
        cbct.analyze()
        print(cbct.results())
        cbct.plot_analyzed_image(show)

    def find_phantom_roll(self, func: Callable | None = None) -> float:
        """The 600's top air ROI may contain a water vial (reference ``:3279``)."""
        angle = super().find_phantom_roll(lambda x: -x.centroid[0])
        if abs(angle) < 10:
            return angle
        return angle + 75


@capture_warnings
class CatPhan700(CatPhanBase):
    """CatPhan 700: CTP682 (HU), CTP714 (SR), CTP712 (uniformity), CTP515."""

    _model = "700"
    catphan_radius_mm = 101
    modules = {
        CTP404CP700: {"offset": 0},
        CTP515CP700: {"offset": -80},
        CTP486: {"offset": -160},
        CTP528CP700: {"offset": -40},
    }


# ===========================================================================
# Batched session API: many CatPhan scans, one localization dispatch
# ===========================================================================
class CatPhanBatch:
    """Analyze multiple same-geometry CatPhan scans with the per-slice
    localization of ALL scans fused into ONE device dispatch.

    The reference analyzes one scan at a time (``ct.py:2732``); here the
    dominant device cost — the whole-stack Scharr→Otsu→CCL→regionprops
    localization — runs once for the concatenated slice set of every scan,
    then each scan's host-side module analysis proceeds with its centroids
    pre-seeded. Per-scan results are identical to :meth:`CatPhanBase.analyze`
    on the same data.

    Scans must share the phantom model, slice shape and pixel spacing
    (one clinical protocol); heterogeneous sessions should be bucketed.
    """

    def __init__(self, folders: list, model=None):
        model = model or CatPhan504
        self.cts = [model(f) for f in folders]
        if not self.cts:
            raise ValueError("No scans were provided")

    def analyze(self, mesh=None, **analyze_kwargs) -> None:
        """``mesh``: an optional :class:`jax.sharding.Mesh` with a ``data``
        axis — the concatenated slice stack of every scan shards along z for
        the localization pass
        (:func:`pylinac_tpu.parallel.mesh.sharded_stack_phantom_regions`);
        per-slice results match the single-device path."""
        with profiling.stage("batch_stage_host"):
            staged = []
            for ct in self.cts:
                st = ct._loc_stage_host()
                if st is None:
                    raise ValueError("A scan has heterogeneous slice shapes")
                staged.append(st)
        ds_set = {st[0] for st in staged}
        shape_set = {st[1].shape[1:] for st in staged}
        if len(ds_set) != 1 or len(shape_set) != 1:
            raise ValueError(
                f"All scans must share slice geometry; got shapes {shape_set}")
        ds = staged[0][0]
        counts = [st[1].shape[0] for st in staged]
        # per-scan device-resident volumes (H2D paid once per loaded scan,
        # like the baseline's pre-loaded host volume); concat runs on device
        devs = []
        for ct, st in zip(self.cts, staged):
            cache = getattr(ct, "_loc_dev_cache", None)
            if cache is None:
                from .ops.staging import stage
                cache = (st[0], st[1].shape[0], stage(st[1]))
                ct._loc_dev_cache = cache
            devs.append(cache[2])
        K = 32
        with profiling.stage("batch_localize"):
            if mesh is not None:
                from .parallel.mesh import sharded_stack_phantom_regions

                packed, max_edges = sharded_stack_phantom_regions(
                    jnp.concatenate(devs, axis=0), K, self.cts[0].clear_borders,
                    ds, self.cts[0].clip_in_localization, mesh)
                host = jlabel.regions_to_host(packed)
                max_edges = np.asarray(jnp.ravel(max_edges))
            elif _use_native_ccl():
                host, max_edges = _stack_regions_native(
                    jnp.concatenate(devs, axis=0), ds,
                    self.cts[0].clip_in_localization, self.cts[0].clear_borders)
                K = host.valid.shape[-1] + 1  # native K never truncates
            else:
                packed, max_edges = _stack_phantom_regions(
                    jnp.concatenate(devs, axis=0), K, self.cts[0].clear_borders,
                    ds, self.cts[0].clip_in_localization)
                host = jlabel.regions_to_host(packed)
                max_edges = np.asarray(jnp.ravel(max_edges))
            offset = 0
            for ct, n in zip(self.cts, counts):
                ct._slice_centroids = ct._centroids_from_host(
                    host, max_edges, ds, range(offset, offset + n), K)
                offset += n
        with profiling.stage("batch_roll_prepass"):
            self._roll_prepass(analyze_kwargs)
        try:
            for ct in self.cts:
                ct._defer_geometry = True
                # the roll pre-pass already ran the origin-slice scan for
                # this scan; pass it through so localize() doesn't redo it
                kwargs = dict(analyze_kwargs)
                kwargs.setdefault("origin_slice", getattr(ct, "origin_slice", None))
                ct.analyze(**kwargs)
            with profiling.stage("batch_finalize_geometry"):
                self._finalize_geometry_batch()
            self._mtf_prepass()
        finally:
            for ct in self.cts:
                ct._defer_geometry = False

    def _roll_prepass(self, analyze_kwargs: dict) -> None:
        """Detect each scan's air-bubble regions (the roll-slice
        Scharr→Otsu→regionprops pass, reference ``ct.py:2522``) in ONE
        batched dispatch and seed ``_pre_roll_regions`` so the per-scan
        ``find_phantom_roll`` skips its own device round trip. The per-scan
        axis-fit/origin work it needs is host-side and is recomputed
        identically inside ``ct.analyze``."""
        slcs = []
        for ct in self.cts:
            ct.x_adjustment = analyze_kwargs.get("x_adjustment", 0)
            ct.y_adjustment = analyze_kwargs.get("y_adjustment", 0)
            ct.roll_slice_offset = analyze_kwargs.get("roll_slice_offset", 0)
            with profiling.stage("prepass.axis"):
                ct._phantom_center_func = ct.find_phantom_axis()
            origin = analyze_kwargs.get("origin_slice")
            with profiling.stage("prepass.origin"):
                ct.origin_slice = (int(origin) if origin is not None
                                   else ct.find_origin_slice())
            slice_offset = round(ct.roll_slice_offset
                                 / ct.dicom_stack.slice_spacing)
            slice_num = ct.origin_slice + slice_offset
            with profiling.stage("prepass.slice"):
                slcs.append((slice_num,
                             Slice(ct, slice_num,
                                   clear_borders=ct.clear_borders)))
        arrs = [np.asarray(s.image.array) for _, s in slcs]
        if len({a.shape for a in arrs}) != 1:
            return  # heterogeneous roll slices: per-scan path
        center = slcs[0][1].image.center
        radius = 110 / slcs[0][1].mm_per_pixel
        with profiling.stage("prepass.regions"):
            views = get_regions_batch(arrs, (float(center.y), float(center.x)),
                                      radius, scale08=True, clear_borders=True,
                                      minmax=False, want_intensity=False)
        if views is None:
            return  # K overflow: per-scan escalation path
        for ct, (slice_num, _), v in zip(self.cts, slcs, views):
            ct._pre_roll_regions = (slice_num, v)

    def _mtf_prepass(self) -> None:
        """Seed each scan's CTP528 ``mtf`` with the PEAK half of every
        line-pair setting batched across scans: the 8 settings use identical
        trim windows and ratio arguments for every scan of a same-geometry
        batch, so one row-batched dispatch per setting replaces one
        dispatch per setting per scan (results identical to the sequential
        ``_compute_mtf`` — :func:`pylinac_tpu.ops.peaks.find_peaks_rows`
        resolves ratio thresholds per row exactly like per-scan calls).
        Valleys stay per scan (their search window depends on that scan's
        found peak indices). ``circle_profile.peaks`` plot state is not
        seeded (plot_rois draws with ``plot_peaks=False``)."""
        from .ops.peaks import find_peaks_rows

        mods = [ct.ctp528 for ct in self.cts
                if getattr(ct, "ctp528", None) is not None
                and "mtf" not in ct.ctp528.__dict__]
        if len(mods) < 2:
            return
        profs = [np.asarray(m.circle_profile.values, np.float32)
                 for m in mods]
        if len({p.shape for p in profs}) != 1:
            return
        stacked = np.stack(profs)
        settings = list(mods[0].roi_settings.items())
        with profiling.stage("ctp528.mtf_batch"):
            peaks_by_setting = [
                find_peaks_rows(stacked, threshold=0.3,
                                peak_separation=value["peak spacing"],
                                max_number=value["num peaks"],
                                search_region=(value["start"], value["end"]))
                for _, value in settings]
        for si, m in enumerate(mods):
            maxs, mins = [], []
            for (_, value), rows_out in zip(settings, peaks_by_setting):
                max_indices, props = rows_out[si]
                max_values = props["peak_heights"]
                if len(max_values) != value["num peaks"]:
                    break
                maxs.append(np.asarray(max_values).mean())
                _, min_values = m.circle_profile.find_valleys(
                    min_distance=value["peak spacing"],
                    max_number=value["num valleys"],
                    search_region=(int(min(max_indices)),
                                   int(max(max_indices))))
                mins.append(min_values.mean())
            if not maxs:
                continue  # the lazy per-scan path raises its own error
            spacings = [roi["lp/mm"] for roi in m.roi_settings.values()]
            m.__dict__["mtf"] = MTF(lp_spacings=spacings[:len(maxs)],
                                    lp_maximums=maxs, lp_minimums=mins)

    def _finalize_geometry_batch(self) -> None:
        """Run the deferred CTP404 geometry-node detections (reference
        ``ct.py:798``) as one batched dispatch per crop shape."""
        mods = [ct.ctp404 for ct in self.cts
                if getattr(ct.ctp404, "_deferred_geo", None) is not None]
        groups: dict[tuple, list] = {}
        for m in mods:
            groups.setdefault(m._deferred_geo[0].shape, []).append(m)
        for group in groups.values():
            crops = [m._deferred_geo[0] for m in group]
            views = get_regions_batch(crops, None, 0.0, clear_borders=False)
            for i, m in enumerate(group):
                crop, xbounds, ybounds = m._deferred_geo
                if views is None:
                    _, regions, num_roi = get_regions(crop, fill_holes=True,
                                                      clear_borders=False)
                else:
                    regions, num_roi = views[i], len(views[i])
                m._finalize_geometry(regions, num_roi, xbounds, ybounds)
                m._deferred_geo = None

    def results_data(self, as_dict: bool = False, as_json: bool = False) -> list:
        return [ct.results_data(as_dict=as_dict, as_json=as_json)
                for ct in self.cts]

    def results(self) -> list:
        return [ct.results() for ct in self.cts]
