"""Device filtering kernels (JAX/XLA): Gaussian, median, uniform, edge filters.

These replace the reference's scipy.ndimage / skimage.filters calls
(``/root/reference/pylinac/core/array_utils.py:106``,
``/root/reference/pylinac/ct.py:393``) with pure, jit/vmap-friendly JAX
functions. Semantics match scipy's defaults (mode='reflect', truncate=4.0)
so results are oracle-testable against scipy on CPU.

All kernel sizes / sigmas are static Python values — callers derive them on
host before tracing (ratio-based sizes are resolved by the host wrappers in
:mod:`pylinac_tpu.core.array_utils`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _reflect_pad(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """scipy 'reflect' mode: (d c b a | a b c d | d c b a)."""
    if pad == 0:
        return x
    n = x.shape[axis]
    if pad <= n:
        left = jnp.flip(jax.lax.slice_in_dim(x, 0, pad, axis=axis), axis=axis)
        right = jnp.flip(jax.lax.slice_in_dim(x, n - pad, n, axis=axis), axis=axis)
        return jnp.concatenate([left, x, right], axis=axis)
    # pad wider than the array: build index map on host-free path
    idx = np.arange(-pad, n + pad)
    period = 2 * n
    idx = np.mod(idx, period)
    idx = np.where(idx >= n, period - 1 - idx, idx)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """The 1D Gaussian kernel scipy.ndimage uses (order 0)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def correlate1d(x: jnp.ndarray, kernel: np.ndarray, axis: int = -1) -> jnp.ndarray:
    """Correlate along one axis with 'reflect' boundary (scipy semantics)."""
    k = np.asarray(kernel, dtype=np.float32)
    pad = (len(k) - 1) // 2
    axis = axis % x.ndim
    xp = _reflect_pad(x.astype(jnp.float32), pad, axis)
    # move target axis last, correlate via stacked shifts (small kernels) —
    # XLA fuses this into a single pass over memory.
    xp = jnp.moveaxis(xp, axis, -1)
    n = x.shape[axis]
    out = jnp.zeros(xp.shape[:-1] + (n,), dtype=jnp.float32)
    for i, w in enumerate(k):
        out = out + w * jax.lax.slice_in_dim(xp, i, i + n, axis=-1)
    return jnp.moveaxis(out, -1, axis)


@functools.partial(jax.jit, static_argnames=("sigma", "axis", "truncate"))
def gaussian_filter1d(x: jnp.ndarray, sigma: float, axis: int = -1,
                      truncate: float = 4.0) -> jnp.ndarray:
    if sigma <= 0:
        return x.astype(jnp.float32)
    return correlate1d(x, gaussian_kernel1d(sigma, truncate), axis=axis)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Separable N-D Gaussian (scipy.ndimage.gaussian_filter semantics)."""
    out = x.astype(jnp.float32)
    for ax in range(x.ndim):
        out = gaussian_filter1d(out, sigma, axis=ax, truncate=truncate)
    return out


def _window_stack(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Stack `size` shifted copies along a new leading axis (reflect-padded)."""
    pad_left = size // 2
    n = x.shape[axis]
    xp = _reflect_pad(x, size - 1, axis)  # generous pad; slice windows from it
    start0 = (size - 1) - pad_left
    slices = [
        jax.lax.slice_in_dim(xp, start0 + i, start0 + i + n, axis=axis)
        for i in range(size)
    ]
    return jnp.stack(slices, axis=0)


def _platform_of(x) -> str:
    """Platform an eager input is committed to (default backend otherwise)."""
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        try:
            return next(iter(x.devices())).platform
        except Exception:
            pass
    return jax.default_backend()


def median_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """N-D median filter with a square footprint (scipy.ndimage.median_filter).

    ``size`` is static. The 3x3 TPU case uses the fused Pallas selection
    network; otherwise a vectorized stack+sort that XLA maps onto the VPU —
    suitable for the small (3–9) kernels QA uses.
    """
    if size <= 1:
        return x
    if size == 3 and x.ndim == 2 and _platform_of(x) == "tpu":
        from .pallas_median import median3x3, median3x3_supported

        if median3x3_supported(x):
            return median3x3(x)
    return _median_general(x, size)


@functools.partial(jax.jit, static_argnames=("size",))
def _median_general(x: jnp.ndarray, size: int) -> jnp.ndarray:
    windows = x[None]
    for ax in range(x.ndim):
        parts = []
        for w in windows:
            parts.append(_window_stack(w, size, ax))
        windows = jnp.concatenate(parts, axis=0)
    # scipy.ndimage.median_filter is a rank filter with rank = W//2 (a single
    # order statistic, not the two-sample mean numpy's median would take)
    w = windows.shape[0]
    return jnp.sort(windows, axis=0)[w // 2].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """N-D uniform (mean) filter, reflect boundary."""
    if size <= 1:
        return x
    k = np.full(size, 1.0 / size, dtype=np.float32)
    out = x.astype(jnp.float32)
    for ax in range(x.ndim):
        out = correlate1d(out, k, axis=ax)
    return out


# --- Edge filters ----------------------------------------------------------
_SOBEL_D = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
_SOBEL_S = np.array([1.0, 2.0, 1.0], dtype=np.float32)
_SCHARR_D = np.array([1.0, 0.0, -1.0], dtype=np.float32)
_SCHARR_S = np.array([3.0, 10.0, 3.0], dtype=np.float32) / 16.0


@functools.partial(jax.jit, static_argnames=("axis",))
def sobel(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """scipy.ndimage.sobel along one axis (derivative on `axis`, smoothing on others)."""
    out = x.astype(jnp.float32)
    axis = axis % x.ndim
    for ax in range(x.ndim):
        out = correlate1d(out, _SOBEL_D if ax == axis else _SOBEL_S, axis=ax)
    return out


def scharr_component(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    out = x.astype(jnp.float32)
    for ax in range(x.ndim):
        out = correlate1d(out, _SCHARR_D / 2.0 if ax == axis else _SCHARR_S, axis=ax)
    return out


@jax.jit
def scharr(x: jnp.ndarray) -> jnp.ndarray:
    """Scharr gradient magnitude (skimage.filters.scharr-like) for 2D images."""
    h = scharr_component(x, 0)
    v = scharr_component(x, 1)
    return jnp.sqrt(h * h + v * v) / math.sqrt(2.0)


@functools.partial(jax.jit, static_argnames=("size", "kind"))
def filter_image(arr: jnp.ndarray, size: int = 3, kind: str = "median") -> jnp.ndarray:
    """Dispatching image filter mirroring the reference's
    ``array_utils.filter`` (``core/array_utils.py:106``) with a static size."""
    if kind == "median":
        return median_filter(arr, size)
    elif kind == "gaussian":
        return gaussian_filter(arr, size)
    raise ValueError(f"Unknown filter kind: {kind}")
