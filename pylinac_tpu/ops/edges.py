"""Canny edge detection as a single fused XLA graph.

Replaces the reference's ``skimage.feature.canny`` call in the planar-phantom
finder (``/root/reference/pylinac/planar_imaging.py:578``). Fully
vectorized and jittable:

* normalized-convolution Gaussian smoothing (constant-mode blur divided by
  the blurred all-ones image — skimage's edge-bleed compensation);
* scipy-style Sobel gradients;
* non-maximum suppression with the classic bilinear neighbor interpolation,
  expressed as masked ``jnp.where`` selections over rolled copies (no
  per-pixel control flow — maps to pure VPU work);
* double threshold (optionally from quantiles, computed in-graph);
* hysteresis via the connected-component labeller (``ops/label.py``):
  a weak-edge component survives iff a ``segment-max`` over its label slot
  sees a strong pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_kernel1d
from .label import label as _label


def _constant_correlate1d(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Correlate along one axis with zero (constant) boundary."""
    k = np.asarray(kernel, dtype=np.float32)
    pad = (len(k) - 1) // 2
    axis = axis % x.ndim
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad, pad)
    xp = jnp.pad(x.astype(jnp.float32), pads)
    xp = jnp.moveaxis(xp, axis, -1)
    n = x.shape[axis]
    out = jnp.zeros(xp.shape[:-1] + (n,), dtype=jnp.float32)
    for i, w in enumerate(k):
        out = out + w * jax.lax.slice_in_dim(xp, i, i + n, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def _smooth(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Masked gaussian: blur(image)/blur(ones) with constant-mode boundaries."""
    k = gaussian_kernel1d(sigma)
    num = _constant_correlate1d(_constant_correlate1d(image, k, 0), k, 1)
    ones = jnp.ones_like(image, dtype=jnp.float32)
    den = _constant_correlate1d(_constant_correlate1d(ones, k, 0), k, 1)
    return num / den


def _sobel(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """scipy.ndimage.sobel with reflect boundary folded into rolls.

    Border rows/cols are excluded from NMS anyway (eroded mask), so simple
    edge clamping suffices.
    """
    d = jnp.roll(x, -1, axis) - jnp.roll(x, 1, axis)
    other = 1 - axis
    s = jnp.roll(d, 1, other) + 2 * d + jnp.roll(d, -1, other)
    return s


@functools.partial(jax.jit, static_argnames=("sigma", "use_quantiles"))
def canny(
    image: jnp.ndarray,
    sigma: float = 1.0,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
    use_quantiles: bool = False,
) -> jnp.ndarray:
    """Boolean edge map (skimage.feature.canny semantics)."""
    image = image.astype(jnp.float32)
    h, w = image.shape
    smoothed = _smooth(image, sigma)
    isobel = _sobel(smoothed, 0)  # d/drow
    jsobel = _sobel(smoothed, 1)  # d/dcol
    magnitude = jnp.hypot(isobel, jsobel)

    # --- non-maximum suppression with bilinear neighbor interpolation ------
    abs_i = jnp.abs(isobel)
    abs_j = jnp.abs(jsobel)
    eps = 1e-12
    same_sign = (isobel * jsobel) >= 0

    def nbr(dr, dc):
        return jnp.roll(magnitude, (-dr, -dc), (0, 1))

    # mostly-horizontal gradient (|j| >= |i|): interpolate between the
    # horizontal neighbor and the diagonal neighbor
    w_h = abs_i / jnp.maximum(abs_j, eps)
    diag_r = jnp.where(same_sign, 1, -1)
    c1_plus = nbr(0, 1)
    c2_plus = jnp.where(same_sign, nbr(1, 1), nbr(-1, 1))
    c1_minus = nbr(0, -1)
    c2_minus = jnp.where(same_sign, nbr(-1, -1), nbr(1, -1))
    horiz_max = (magnitude >= c1_plus * (1 - w_h) + c2_plus * w_h) & (
        magnitude >= c1_minus * (1 - w_h) + c2_minus * w_h)

    # mostly-vertical gradient (|i| > |j|)
    w_v = abs_j / jnp.maximum(abs_i, eps)
    d1_plus = nbr(1, 0)
    d2_plus = jnp.where(same_sign, nbr(1, 1), nbr(1, -1))
    d1_minus = nbr(-1, 0)
    d2_minus = jnp.where(same_sign, nbr(-1, -1), nbr(-1, 1))
    vert_max = (magnitude >= d1_plus * (1 - w_v) + d2_plus * w_v) & (
        magnitude >= d1_minus * (1 - w_v) + d2_minus * w_v)

    is_horizontal = abs_j >= abs_i
    local_maxima = jnp.where(is_horizontal, horiz_max, vert_max)
    local_maxima = local_maxima & (magnitude > 0)

    # exclude the 1-px border (skimage's eroded mask)
    rr = jnp.arange(h)[:, None]
    cc = jnp.arange(w)[None, :]
    interior = (rr > 0) & (rr < h - 1) & (cc > 0) & (cc < w - 1)
    local_maxima = local_maxima & interior

    # --- double threshold --------------------------------------------------
    if use_quantiles:
        low, high = jnp.percentile(
            magnitude, jnp.asarray([low_threshold * 100, high_threshold * 100]))
    else:
        low, high = low_threshold, high_threshold
    weak = local_maxima & (magnitude >= low)
    strong = local_maxima & (magnitude >= high)

    # --- hysteresis: keep weak components touching a strong pixel ----------
    labels = _label(weak, connectivity=2)  # root linear indices; bg = -1
    labels_flat = jnp.where(labels.reshape(-1) < 0, h * w, labels.reshape(-1))
    has_strong = jnp.zeros(h * w + 1, dtype=jnp.bool_).at[labels_flat].max(
        strong.reshape(-1))
    return weak & has_strong[labels_flat].reshape(h, w)
