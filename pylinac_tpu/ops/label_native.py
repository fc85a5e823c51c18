"""Host-native (C++) CCL + regionprops backend for host-consumed regions.

The CT localization family (``ct.py`` ``get_regions`` paths) always reads
its region properties on the host — the device's only irreplaceable job is
the edge mask (Scharr→Gaussian→Otsu must stay bit-identical across
backends). This backend keeps the mask stage on device, ships ONE
bit-packed buffer over the tunnel, and computes exact union-find CCL +
property sums in C++ (:mod:`pylinac_tpu.native` ``ccl.cpp``): ~40 ms
end-to-end for a 240-slice localization batch vs ~500 ms for the
on-device min-propagation sweeps + one-hot matmul reductions + multi-array
fetches it replaces (measured through the 31 ms/round-trip tunnel,
PERF_BUDGET.json).

Semantics are identical to :mod:`pylinac_tpu.ops.label` (root-index labels,
ascending slot order, border-excluded 4-conn holes assigned to the region
above their root pixel) — parity is pinned by ``tests/ops/test_ccl_native``.
Not computed here: Freeman perimeter and the hull estimate (``perimeter``
returns 0, ``convex_area`` = ``area_filled``, matching ``hull=False``); no
routed caller reads either (the metrics plugin path keeps the device
kernels).
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..native import load_library
from .label import Regions

_lib = None
_lib_checked = False


def _get_lib():
    global _lib, _lib_checked
    if not _lib_checked:
        _lib_checked = True
        lib = load_library("ccl")
        if lib is not None:
            lib.ccl_props_batch.restype = ctypes.c_int
            lib.ccl_props_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
        _lib = lib
    return _lib


def available() -> bool:
    """True when the C++ CCL compiled (g++ present, not disabled)."""
    return _get_lib() is not None


def packed_width(w: int) -> int:
    """Halfwords per row for a mask of width ``w``."""
    return -(-w // 16)


@functools.partial(jax.jit, static_argnames=())
def pack_mask16(bw: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack a (B, H, W) bool mask into exact-integer float32 halfwords
    (B, H, ceil(W/16)), LSB-first.

    float32 carries integers ≤ 2^24 exactly; 16 bits per element keeps the
    wire format transport-safe (the tunnel moves float32 in bulk but
    integer arrays element-wise — see ``ops.label.pack_regions``).
    """
    b, h, w = bw.shape
    pad = (-w) % 16
    if pad:
        bw = jnp.pad(bw, ((0, 0), (0, 0), (0, pad)))
    r = bw.reshape(b, h, (w + pad) // 16, 16).astype(jnp.float32)
    weights = jnp.asarray(2.0 ** np.arange(16), jnp.float32)
    return r @ weights


def regions_from_packed(
    packed16: np.ndarray,
    width: int,
    intensity: np.ndarray | None = None,
    connectivity: int = 2,
    K: int = 32,
) -> tuple[Regions, np.ndarray]:
    """Exact CCL + regionprops from a host bit-packed mask batch.

    Parameters
    ----------
    packed16 : (B, H, Wwords) uint16 (or float32 exact integers from
        :func:`pack_mask16`, converted here)
    width : true mask width W (≤ Wwords*16)
    intensity : optional (B, H, W) float32 for the intensity properties
    K : initial slot count; escalated automatically to the true region
        count (the C++ pass reports it — no silent truncation)

    Returns (Regions with (B, K) numpy fields, n_regions (B,) int32).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native CCL unavailable (no g++ or disabled)")
    pk = np.ascontiguousarray(packed16.astype(np.uint16)
                              if packed16.dtype != np.uint16 else packed16)
    B, H, Wwords = pk.shape
    W = width
    inten = None
    if intensity is not None:
        inten = np.ascontiguousarray(intensity, dtype=np.float32)
        assert inten.shape == (B, H, W), (inten.shape, (B, H, W))

    while True:
        sums = np.zeros((B, K, 10), np.float64)
        bbox = np.zeros((B, K, 4), np.int32)
        touches = np.zeros((B, K), np.uint8)
        minmax = np.zeros((B, K, 2), np.float32)
        label_id = np.zeros((B, K), np.int32)
        valid = np.zeros((B, K), np.uint8)
        n_regions = np.zeros(B, np.int32)
        lib.ccl_props_batch(
            pk.ctypes.data_as(ctypes.c_void_p), B, H, W, Wwords,
            inten.ctypes.data_as(ctypes.c_void_p) if inten is not None else None,
            connectivity, K,
            sums.ctypes.data_as(ctypes.c_void_p),
            bbox.ctypes.data_as(ctypes.c_void_p),
            touches.ctypes.data_as(ctypes.c_void_p),
            minmax.ctypes.data_as(ctypes.c_void_p),
            label_id.ctypes.data_as(ctypes.c_void_p),
            valid.ctypes.data_as(ctypes.c_void_p),
            n_regions.ctypes.data_as(ctypes.c_void_p))
        top = int(n_regions.max(initial=0))
        if top <= K:
            break
        K = max(top, 2 * K)

    ok = valid.astype(bool)
    if inten is None:
        # the C++ pass initializes minmax to ±INF and only updates it when an
        # intensity plane is supplied; zero it so the no-intensity route
        # reports 0 like the device backend does
        minmax[:] = 0.0
    area = np.where(ok, sums[..., 0], 0.0).astype(np.float32)
    safe_area = np.maximum(sums[..., 0], 1.0)
    centroid_r = (sums[..., 1] / safe_area).astype(np.float32)
    centroid_c = (sums[..., 2] / safe_area).astype(np.float32)
    area_filled = (sums[..., 0] + sums[..., 6]).astype(np.float32)
    area_filled = np.where(ok, area_filled, 0.0)
    # unfilled central moments → axes/ecc/orientation (skimage convention;
    # same formulas as ops.label._props_from_label)
    mu20 = sums[..., 3] / safe_area - centroid_r.astype(np.float64) ** 2
    mu02 = sums[..., 4] / safe_area - centroid_c.astype(np.float64) ** 2
    mu11 = (sums[..., 5] / safe_area
            - centroid_r.astype(np.float64) * centroid_c.astype(np.float64))
    common = np.sqrt(np.maximum((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
    l1 = (mu20 + mu02 + common) / 2
    l2 = (mu20 + mu02 - common) / 2
    major = (4.0 * np.sqrt(np.maximum(l1, 0.0))).astype(np.float32)
    minor = (4.0 * np.sqrt(np.maximum(l2, 0.0))).astype(np.float32)
    ecc = np.sqrt(np.maximum(1.0 - l2 / np.maximum(l1, 1e-20), 0.0)
                  ).astype(np.float32)
    orientation = (0.5 * np.arctan2(2 * mu11, mu02 - mu20)).astype(np.float32)
    safe_si = np.where(np.abs(sums[..., 7]) > 1e-20, sums[..., 7], 1e-20)
    wc_r = np.where(ok, sums[..., 8] / safe_si, 0.0).astype(np.float32)
    wc_c = np.where(ok, sums[..., 9] / safe_si, 0.0).astype(np.float32)
    mean_i = np.where(ok, sums[..., 7] / safe_area, 0.0).astype(np.float32)
    max_i = np.where(ok, minmax[..., 1], 0.0).astype(np.float32)
    min_i = np.where(ok, minmax[..., 0], 0.0).astype(np.float32)
    bbox = np.where(ok[..., None], bbox, 0)

    return Regions(
        valid=ok, area=area, area_filled=area_filled,
        centroid_r=np.where(ok, centroid_r, 0.0).astype(np.float32),
        centroid_c=np.where(ok, centroid_c, 0.0).astype(np.float32),
        weighted_centroid_r=wc_r, weighted_centroid_c=wc_c,
        bbox_rmin=bbox[..., 0], bbox_cmin=bbox[..., 1],
        bbox_rmax=bbox[..., 2], bbox_cmax=bbox[..., 3],
        perimeter=np.zeros((B, K), np.float32),
        touches_border=touches.astype(bool),
        convex_area=area_filled,
        major_axis_length=np.where(ok, major, 0.0).astype(np.float32),
        minor_axis_length=np.where(ok, minor, 0.0).astype(np.float32),
        eccentricity=np.where(ok, ecc, 0.0).astype(np.float32),
        orientation=np.where(ok, orientation, 0.0).astype(np.float32),
        mean_intensity=mean_i, max_intensity=max_i, min_intensity=min_i,
        label_id=label_id,
    ), n_regions
