"""Thresholding kernels: Otsu, percentile (JAX, jit/vmap-friendly).

Replaces skimage.filters.threshold_otsu (used in reference
``ct.py:393,3315``) and np.percentile-based cutoffs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def otsu_threshold(image: jnp.ndarray, nbins: int = 256) -> jnp.ndarray:
    """Otsu's threshold (skimage.filters.threshold_otsu semantics: histogram
    over [min, max] with `nbins` bins; returns the bin *center*)."""
    flat = image.ravel().astype(jnp.float32)
    vmin = jnp.min(flat)
    vmax = jnp.max(flat)
    span = jnp.maximum(vmax - vmin, 1e-20)
    # histogram
    idx = jnp.clip(((flat - vmin) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jax.ops.segment_sum(jnp.ones_like(flat), idx, num_segments=nbins)
    bin_centers = vmin + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * span / nbins

    w1 = jnp.cumsum(hist)
    w2 = w1[-1] - w1
    mu_cum = jnp.cumsum(hist * bin_centers)
    mu1 = mu_cum / jnp.maximum(w1, 1e-20)
    mu2 = (mu_cum[-1] - mu_cum) / jnp.maximum(w2, 1e-20)
    between_var = w1 * w2 * (mu1 - mu2) ** 2
    # invalid splits (empty side) get -inf
    between_var = jnp.where((w1 > 0) & (w2 > 0), between_var, -jnp.inf)
    return bin_centers[jnp.argmax(between_var)]


def percentile(values: jnp.ndarray, q: float | jnp.ndarray) -> jnp.ndarray:
    """np.percentile (linear interpolation) on the flattened array."""
    return jnp.percentile(values.ravel().astype(jnp.float32), q)
