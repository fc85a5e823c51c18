"""Thresholding kernels: Otsu, percentile (JAX, jit/vmap-friendly).

Replaces skimage.filters.threshold_otsu (used in reference
``ct.py:393,3315``) and np.percentile-based cutoffs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def otsu_threshold(image: jnp.ndarray, nbins: int = 256,
                   mask: jnp.ndarray | None = None,
                   host: bool | None = None) -> jnp.ndarray:
    """Otsu's threshold (skimage.filters.threshold_otsu semantics: histogram
    over [min, max] with `nbins` bins; returns the bin *center*).

    ``mask`` (same shape, bool) restricts the histogram to selected pixels
    — equivalent to ``otsu_threshold(image[mask])`` but jit-friendly.

    ``host`` picks the histogram strategy: scatter (``segment_sum``) is
    fast on CPU but serializes on the TPU scalar unit; the one-hot matmul
    rides the MXU but materializes an N×nbins operand that costs ~600 ms
    per 512² slice on CPU. Callers that route small inputs to the
    in-process CPU backend (``ops.route.put(small=True)``) MUST pass
    ``host=True`` — the default infers from ``jax.default_backend()``,
    which reflects where *uncommitted* arrays run, not where a
    CPU-committed input actually executes."""
    flat = image.ravel().astype(jnp.float32)
    if mask is not None:
        m = mask.ravel()
        big = jnp.inf
        vmin = jnp.min(jnp.where(m, flat, big))
        vmax = jnp.max(jnp.where(m, flat, -big))
        weights = m.astype(jnp.float32)
    else:
        vmin = jnp.min(flat)
        vmax = jnp.max(flat)
        weights = jnp.ones_like(flat)
    span = jnp.maximum(vmax - vmin, 1e-20)
    # histogram
    idx = jnp.clip(((flat - vmin) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    if host is None:
        host = jax.default_backend() not in ("tpu", "axon")
    if not host:
        # scatters serialize on the TPU scalar unit; ride the MXU instead:
        # hist = onehot(idx)^T @ weights in one matmul
        onehot = (idx[:, None] == jnp.arange(nbins, dtype=idx.dtype)[None, :]
                  ).astype(jnp.float32)
        hist = jax.lax.dot_general(
            onehot, weights[:, None],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0]
    else:
        hist = jax.ops.segment_sum(weights, idx, num_segments=nbins)
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


def threshold_li(image, tolerance: float | None = None) -> float:
    """Li's iterative minimum cross-entropy threshold
    (skimage.filters.threshold_li semantics).

    Host-side scalar iteration — converges in a handful of steps; used for
    binarizing MR images where Otsu over-segments."""
    import numpy as np

    arr = np.asarray(image, dtype=float).ravel()
    arr = arr[np.isfinite(arr)]
    offset = arr.min()
    arr = arr - offset  # means must be positive for the log
    eps = arr[arr > 0].min() / 2 if np.any(arr > 0) else 1e-6
    arr = arr + eps
    tolerance = tolerance or np.ptp(arr) / 2 ** 10
    t_next = arr.mean()
    t_curr = -2 * tolerance
    while abs(t_next - t_curr) > tolerance:
        t_curr = t_next
        fore = arr > t_curr
        if not np.any(fore) or np.all(fore):
            break
        mean_fore = arr[fore].mean()
        mean_back = arr[~fore].mean()
        t_next = ((mean_back - mean_fore)
                  / (np.log(mean_back) - np.log(mean_fore)))
    return float(t_next - eps + offset)


def threshold_yen(image, nbins: int = 256) -> float:
    """Yen's maximum-correlation threshold (skimage.filters.threshold_yen).

    Host-side histogram math; used to binarize vesselness maps."""
    import numpy as np

    arr = np.asarray(image, dtype=float).ravel()
    arr = arr[np.isfinite(arr)]
    counts, bin_edges = np.histogram(arr, bins=nbins)
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    pmf = counts.astype(float) / max(counts.sum(), 1)
    p1 = np.cumsum(pmf)
    p1_sq = np.cumsum(pmf**2)
    p2_sq = np.cumsum(pmf[::-1] ** 2)[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        crit = np.log(((p1_sq[:-1] * p2_sq[1:]) ** -1)
                      * (p1[:-1] * (1.0 - p1[:-1])) ** 2)
    crit = np.where(np.isfinite(crit), crit, -np.inf)
    return float(bin_centers[:-1][np.argmax(crit)])
