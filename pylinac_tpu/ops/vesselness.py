"""Frangi vesselness filter (skimage.filters.frangi equivalent).

Used by the ACR mammography fiber detector
(``/root/reference/pylinac/planar_imaging.py:3668``). Multi-scale Hessian
via gaussian-derivative convolutions — each scale is one fused XLA graph;
the 2x2 eigen-decomposition is closed-form elementwise VPU math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import correlate1d


def _gaussian_derivative_kernels(sigma: float, truncate: float = 4.0):
    radius = max(int(truncate * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    d1 = -x / sigma**2 * g
    d2 = (x**2 - sigma**2) / sigma**4 * g
    return (g.astype(np.float32), d1.astype(np.float32), d2.astype(np.float32))


def _hessian(image: jnp.ndarray, sigma: float):
    """(Hrr, Hrc, Hcc) scaled by sigma^2 (gamma-normalized, skimage style)."""
    g, d1, d2 = _gaussian_derivative_kernels(sigma)
    hrr = correlate1d(correlate1d(image, d2, axis=0), g, axis=1)
    hcc = correlate1d(correlate1d(image, g, axis=0), d2, axis=1)
    hrc = correlate1d(correlate1d(image, d1, axis=0), d1, axis=1)
    s2 = sigma**2
    return hrr * s2, hrc * s2, hcc * s2


@functools.partial(jax.jit, static_argnames=("sigmas", "black_ridges",
                                             "beta", "gamma"))
def frangi(image: jnp.ndarray, sigmas: tuple[float, ...],
           black_ridges: bool = False, beta: float = 0.5,
           gamma: float | None = None) -> jnp.ndarray:
    """Vesselness: max over scales of exp(-Rb^2/2b^2)(1-exp(-S^2/2g^2)).

    ``gamma=None`` uses half the max structureness per scale (skimage)."""
    image = image.astype(jnp.float32)
    if black_ridges:
        image = -image
    out = jnp.zeros_like(image)
    for sigma in sigmas:
        hrr, hrc, hcc = _hessian(image, float(sigma))
        # closed-form symmetric 2x2 eigenvalues
        tr_half = (hrr + hcc) / 2
        disc = jnp.sqrt(jnp.maximum(((hrr - hcc) / 2) ** 2 + hrc**2, 0.0))
        e1 = tr_half + disc
        e2 = tr_half - disc
        # order by |magnitude|: lam1 smaller
        swap = jnp.abs(e1) > jnp.abs(e2)
        lam1 = jnp.where(swap, e2, e1)
        lam2 = jnp.where(swap, e1, e2)
        lam2_safe = jnp.where(lam2 == 0, 1e-10, lam2)
        rb2 = (lam1 / lam2_safe) ** 2
        s2 = lam1**2 + lam2**2
        if gamma is None:
            g2 = jnp.maximum(jnp.max(s2) / 4, 1e-10)  # (max S / 2)^2
        else:
            g2 = gamma**2
        v = jnp.exp(-rb2 / (2 * beta**2)) * (1 - jnp.exp(-s2 / (2 * g2)))
        # bright ridges: lam2 must be negative
        v = jnp.where(lam2 < 0, v, 0.0)
        out = jnp.maximum(out, v)
    return out
