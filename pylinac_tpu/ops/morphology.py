"""Binary morphology kernels (skimage.morphology equivalents).

Replaces the reference's skimage calls in the nuclear-medicine suite
(``/root/reference/pylinac/nuclear.py:19-25``). All ops are expressed as
convolutions / labeling passes that XLA fuses; disk radii are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .label import label as _label


def _disk_kernel(radius: float) -> np.ndarray:
    r = int(np.ceil(radius))
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    # strict inequality: survivors have distance >= radius to background,
    # matching skimage's distance_transform_edt(image) >= radius
    return (yy**2 + xx**2 < radius**2).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("radius",))
def isotropic_erosion(mask: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Erode with a Euclidean disk: a pixel survives iff no background
    pixel lies within ``radius`` (skimage.morphology.isotropic_erosion)."""
    if radius <= 0:
        return mask.astype(bool)
    k = jnp.asarray(_disk_kernel(radius))
    bg = (~mask.astype(bool)).astype(jnp.float32)
    # count background pixels within the disk; borders count as background
    pad = (k.shape[0] - 1) // 2
    bg_padded = jnp.pad(bg, pad, constant_values=1.0)
    hits = jax.lax.conv_general_dilated(
        bg_padded[None, None], k[None, None], window_strides=(1, 1),
        padding="VALID")[0, 0]
    return mask.astype(bool) & (hits == 0)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def find_boundaries(mask: jnp.ndarray, connectivity: int = 1,
                    mode: str = "inner") -> jnp.ndarray:
    """Inner boundaries: mask pixels with a background neighbor
    (skimage.segmentation.find_boundaries, mode='inner')."""
    mask = mask.astype(bool)
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    any_bg = jnp.zeros_like(mask)
    for dy, dx in shifts:
        neigh = jnp.roll(mask, (dy, dx), (0, 1))
        # rolled-in borders count as background
        if dy > 0:
            neigh = neigh.at[:dy, :].set(False)
        elif dy < 0:
            neigh = neigh.at[dy:, :].set(False)
        if dx > 0:
            neigh = neigh.at[:, :dx].set(False)
        elif dx < 0:
            neigh = neigh.at[:, dx:].set(False)
        any_bg = any_bg | ~neigh
    return mask & any_bg


@functools.partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_objects(mask: jnp.ndarray, min_size: int = 64,
                         connectivity: int = 1) -> jnp.ndarray:
    """Drop connected components smaller than ``min_size`` pixels."""
    mask = mask.astype(bool)
    h, w = mask.shape
    lab = _label(mask, connectivity=connectivity)
    flat = lab.ravel()
    idx = jnp.where(flat >= 0, flat, h * w)
    counts = jnp.zeros(h * w + 1, jnp.int32).at[idx].add(1)
    keep = counts >= min_size
    return mask & keep[idx].reshape(h, w)


@functools.partial(jax.jit, static_argnames=("area_threshold", "connectivity"))
def remove_small_holes(mask: jnp.ndarray, area_threshold: int = 64,
                       connectivity: int = 1) -> jnp.ndarray:
    """Fill holes (background components not touching the border) smaller
    than ``area_threshold`` pixels."""
    mask = mask.astype(bool)
    h, w = mask.shape
    bg_lab = _label(~mask, connectivity=connectivity)
    flat = bg_lab.ravel()
    idx = jnp.where(flat >= 0, flat, h * w)
    counts = jnp.zeros(h * w + 1, jnp.int32).at[idx].add(1)
    rr = jnp.arange(h)[:, None]
    cc = jnp.arange(w)[None, :]
    on_border = (rr == 0) | (rr == h - 1) | (cc == 0) | (cc == w - 1)
    border_flags = jnp.zeros(h * w + 1, dtype=bool).at[
        jnp.where((on_border & (bg_lab >= 0)).ravel(), flat, h * w)].max(True)
    is_hole = (bg_lab >= 0) & ~border_flags[jnp.clip(bg_lab, 0, h * w)]
    small = counts < area_threshold
    fill = is_hole & small[idx].reshape(h, w)
    return mask | fill


def block_reduce(arr: np.ndarray, block_size: tuple[int, int],
                 func=np.sum) -> np.ndarray:
    """skimage.measure.block_reduce with zero-padding to a block multiple."""
    by, bx = block_size
    h, w = arr.shape
    ph = (-h) % by
    pw = (-w) % bx
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)))
    h2, w2 = arr.shape
    view = arr.reshape(h2 // by, by, w2 // bx, bx)
    return func(func(view, axis=3), axis=1)


def _conv_binary(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Count of true pixels under the kernel at each position (SAME pad)."""
    k = jnp.asarray(np.asarray(kernel, np.float32))
    return jax.lax.conv_general_dilated(
        mask.astype(jnp.float32)[None, None], k[None, None],
        window_strides=(1, 1), padding="SAME")[0, 0]


def binary_dilation(mask: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    """Dilation with an arbitrary footprint (flipped for correlation parity)."""
    fp = np.asarray(footprint, np.float32)[::-1, ::-1]
    return _conv_binary(jnp.asarray(mask), fp) > 0


def binary_erosion(mask: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    """Erosion with an arbitrary footprint; borders count as background."""
    fp = np.asarray(footprint, np.float32)
    return _conv_binary(jnp.asarray(mask), fp) >= fp.sum()


def binary_closing(mask: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    """Dilation then erosion (skimage.morphology.binary_closing)."""
    return binary_erosion(binary_dilation(mask, footprint), footprint)


def rotate_footprint(footprint: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate a small binary footprint (nearest-neighbor, resized) —
    skimage.transform.rotate(resize=True) for structuring elements."""
    fp = np.asarray(footprint, float)
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    h, w = fp.shape
    # output size contains the rotated rectangle
    H = int(np.ceil(abs(h * c) + abs(w * s)))
    W = int(np.ceil(abs(h * s) + abs(w * c)))
    yy, xx = np.mgrid[:H, :W]
    cy_o, cx_o = (H - 1) / 2, (W - 1) / 2
    cy_i, cx_i = (h - 1) / 2, (w - 1) / 2
    # inverse-rotate output coords into input space
    ys = (yy - cy_o) * c - (xx - cx_o) * s + cy_i
    xs = (yy - cy_o) * s + (xx - cx_o) * c + cx_i
    yi = np.round(ys).astype(int)
    xi = np.round(xs).astype(int)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    out = np.zeros((H, W))
    out[valid] = fp[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)][valid]
    return out > 0.5
