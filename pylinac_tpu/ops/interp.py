"""Interpolation & resampling kernels (JAX): linear/cubic interp, B-spline
map_coordinates, and scipy-compatible ``zoom``.

Replaces the reference's scipy.interpolate / scipy.ndimage surface
(``core/profile.py:249-292, 373, 1312``): ``interp1d``, ``UnivariateSpline
(k=1, s=0)``, ``zoom(order=3, grid_mode=False, mode='nearest')`` and
``map_coordinates``.  The cubic path implements the exact B-spline prefilter
(causal/anticausal IIR, mirror init) so results are oracle-testable against
scipy to float32 precision.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

CUBIC_POLE = math.sqrt(3.0) - 2.0


def interp_linear(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation (scipy interp1d kind='linear' inside the domain)."""
    return jnp.interp(x, xp, fp)


# --------------------------------------------------------------------------
# Cubic B-spline prefilter (scipy.ndimage.spline_filter1d order=3)
# --------------------------------------------------------------------------
def spline_filter1d(x: jnp.ndarray, axis: int = -1, mode: str = "mirror") -> jnp.ndarray:
    """Cubic B-spline coefficient prefilter along one axis.

    Matches scipy.ndimage.spline_filter1d(order=3) with 'mirror' boundary
    (scipy's default and what zoom uses for interior equivalence).
    """
    x = x.astype(jnp.float32)
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n == 1:
        return jnp.moveaxis(x, -1, axis)
    p = CUBIC_POLE
    gain = (1.0 - p) * (1.0 - 1.0 / p)
    y = x * gain

    if mode == "mirror":
        # causal init (mirror): exact formula. The power series is computed on
        # host in float64 (n is static) — float32 underflow of p**k would
        # otherwise produce 0/0 NaNs for n ≳ 60.
        k64 = np.arange(1, n - 1, dtype=np.float64)
        zn64 = np.float64(p) ** (n - 1)
        powers = jnp.asarray(
            (np.float64(p) ** k64 + zn64 * zn64 / np.float64(p) ** k64).astype(np.float32)
        )
        zn = jnp.float32(zn64)
        c0 = (y[..., 0] + zn * y[..., n - 1] + jnp.sum(powers * y[..., 1:n - 1], axis=-1)) / (
            jnp.float32(1.0 - zn64 * zn64)
        )
    elif mode == "nearest":
        # nearest extension: infinite run of x[0] to the left → geometric sum
        c0 = y[..., 0] / (1.0 - p)
    else:
        raise ValueError(f"Unsupported prefilter mode {mode}")

    # causal pass: c[i] = y[i] + p*c[i-1]
    def causal(carry, yi):
        c = yi + p * carry
        return c, c

    _, cs = jax.lax.scan(causal, c0, jnp.moveaxis(y[..., 1:], -1, 0))
    c = jnp.concatenate([c0[..., None], jnp.moveaxis(cs, 0, -1)], axis=-1)

    if mode == "mirror":
        # anticausal init (mirror): c[n-1] = p/(p^2-1) * (p*c[n-2] + c[n-1])
        last = p / (p * p - 1.0) * (p * c[..., n - 2] + c[..., n - 1])
    else:
        # nearest: causal output beyond the edge follows c[n-1+j] = L + p^j (c[n-1]-L)
        # with L = gain*x[n-1]/(1-p); the anticausal recursion summed to
        # infinity gives the closed form below.
        L = y[..., n - 1] / (1.0 - p)
        d = c[..., n - 1] - L
        last = -p * L / (1.0 - p) - p * d / (1.0 - p * p)

    # anticausal pass: c[i] = p*(c[i+1] - c[i])
    def anticausal(carry, ci):
        c_new = p * (carry - ci)
        return c_new, c_new

    _, rs = jax.lax.scan(anticausal, last, jnp.moveaxis(jnp.flip(c[..., : n - 1], -1), -1, 0))
    out = jnp.concatenate(
        [jnp.flip(jnp.moveaxis(rs, 0, -1), -1), last[..., None]], axis=-1
    )
    return jnp.moveaxis(out, -1, axis)


def _cubic_bspline_weights(f: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """B-spline basis weights for taps at offsets (-1, 0, 1, 2) from floor."""
    f2 = f * f
    f3 = f2 * f
    w0 = (1.0 - 3.0 * f + 3.0 * f2 - f3) / 6.0
    w1 = (4.0 - 6.0 * f2 + 3.0 * f3) / 6.0
    w2 = (1.0 + 3.0 * f + 3.0 * f2 - 3.0 * f3) / 6.0
    w3 = f3 / 6.0
    return w0, w1, w2, w3


def _index_mode(idx: jnp.ndarray, n: int, mode: str) -> jnp.ndarray:
    if mode == "nearest":
        return jnp.clip(idx, 0, n - 1)
    if mode == "mirror":  # (d c b | a b c d | c b a)
        if n == 1:
            return jnp.zeros_like(idx)
        period = 2 * n - 2
        idx = jnp.mod(idx, period)
        return jnp.where(idx >= n, period - idx, idx)
    if mode == "reflect":  # (d c b a | a b c d | d c b a)
        period = 2 * n
        idx = jnp.mod(idx, period)
        return jnp.where(idx >= n, period - 1 - idx, idx)
    raise ValueError(f"Unsupported mode {mode}")


def map_coordinates1d_cubic(coeffs: jnp.ndarray, coords: jnp.ndarray,
                            mode: str = "nearest") -> jnp.ndarray:
    """Evaluate prefiltered cubic B-spline coefficients at float coordinates."""
    n = coeffs.shape[-1]
    i = jnp.floor(coords).astype(jnp.int32)
    f = coords - i
    w = _cubic_bspline_weights(f)
    out = jnp.zeros_like(coords, dtype=jnp.float32)
    for tap, wt in zip((-1, 0, 1, 2), w):
        idx = _index_mode(i + tap, n, mode)
        out = out + wt * coeffs[..., idx]
    return out


def zoom1d(values: jnp.ndarray, zoom_factor: float, order: int = 3,
           mode: str = "nearest") -> jnp.ndarray:
    """scipy.ndimage.zoom for 1D arrays with grid_mode=False.

    Output length = round(n * zoom); output index i maps to input coordinate
    i*(n-1)/(m-1).  Matches the reference's ``as_resampled``
    (``core/profile.py:355-398``).
    """
    n = values.shape[-1]
    m = int(round(n * zoom_factor))
    if m == n and zoom_factor == 1:
        return values.astype(jnp.float32)
    denom = (m - 1) if m > 1 else 1
    coords = jnp.arange(m, dtype=jnp.float32) * (float(n - 1) / float(denom))
    if order == 0:
        idx = jnp.clip(jnp.round(coords).astype(jnp.int32), 0, n - 1)
        return values[..., idx].astype(jnp.float32)
    if order == 1:
        return jnp.interp(coords, jnp.arange(n, dtype=jnp.float32), values.astype(jnp.float32))
    if order == 3:
        if mode == "nearest":
            # scipy pre-pads 12 edge samples for 'nearest' before prefiltering
            # (scipy/ndimage/_interpolation.py::_prepad_for_spline_filter)
            npad = 12
            left = jnp.repeat(values[..., :1], npad, axis=-1)
            right = jnp.repeat(values[..., -1:], npad, axis=-1)
            padded = jnp.concatenate([left, values, right], axis=-1)
            coeffs = spline_filter1d(padded, axis=-1, mode="nearest")
            return map_coordinates1d_cubic(coeffs, coords + npad, mode="nearest")
        coeffs = spline_filter1d(values, axis=-1, mode=mode)
        return map_coordinates1d_cubic(coeffs, coords, mode=mode)
    raise ValueError(f"Unsupported spline order {order}")


def map_coordinates(image: jnp.ndarray, coords: jnp.ndarray, order: int = 1,
                    mode: str = "constant", cval: float = 0.0) -> jnp.ndarray:
    """N-D map_coordinates for orders 0/1 (delegates to jax.scipy)."""
    return jax.scipy.ndimage.map_coordinates(image, list(coords), order=order,
                                             mode=mode, cval=cval)


# --------------------------------------------------------------------------
# Cubic interpolating spline through data points (scipy interp1d kind='cubic')
# --------------------------------------------------------------------------
def _solve_tridiagonal(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Thomas algorithm (sequential scan — systems here are tiny)."""
    n = b.shape[0]

    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = abcd
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    _, (cps, dps) = jax.lax.scan(fwd, (jnp.zeros(()), jnp.zeros(())), (a, b, c, d))

    def bwd(carry, cd):
        cp, dp = cd
        xi = dp - cp * carry
        return xi, xi

    _, xs = jax.lax.scan(bwd, jnp.zeros(()), (cps, dps), reverse=True)
    # note: proper back substitution needs x[n-1] = dp[n-1]; the reverse scan
    # with zero init achieves this since cp[n-1] is multiplied by carry=0 first.
    return xs


def cubic_spline_interp(xp: jnp.ndarray, fp: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Natural-boundary-free (not-a-knot) cubic interpolating spline, evaluated
    at ``x``.  Matches scipy interp1d(kind='cubic') / CubicSpline(bc='not-a-knot')
    to float32 precision for n >= 4."""
    xp = xp.astype(jnp.float64) if jax.config.read("jax_enable_x64") else xp.astype(jnp.float32)
    fp = fp.astype(xp.dtype)
    n = xp.shape[0]
    h = jnp.diff(xp)
    # build the tridiagonal system for interior second-derivative continuity
    # with not-a-knot end conditions (third derivative continuity at x1, xn-2)
    a = jnp.zeros(n, xp.dtype)
    b = jnp.zeros(n, xp.dtype)
    c = jnp.zeros(n, xp.dtype)
    d = jnp.zeros(n, xp.dtype)
    slope = jnp.diff(fp) / h
    # interior equations: h[i-1] s[i-1] + 2(h[i-1]+h[i]) s[i] + h[i] s[i+1] = 3(...)
    a = a.at[1:n - 1].set(h[1: n - 1])
    b = b.at[1:n - 1].set(2.0 * (h[: n - 2] + h[1: n - 1]))
    c = c.at[1:n - 1].set(h[: n - 2])
    d = d.at[1:n - 1].set(3.0 * (slope[1: n - 1] * h[: n - 2] + slope[: n - 2] * h[1: n - 1]))
    # not-a-knot at the left: x0 row
    b = b.at[0].set(h[1])
    c = c.at[0].set(xp[2] - xp[0])
    d0 = ((h[0] + 2.0 * (xp[2] - xp[0])) * h[1] * slope[0] + h[0] ** 2 * slope[1]) / (xp[2] - xp[0])
    d = d.at[0].set(d0)
    # not-a-knot at the right
    a = a.at[n - 1].set(xp[n - 1] - xp[n - 3])
    b = b.at[n - 1].set(h[n - 3])
    dn = (h[n - 2] ** 2 * slope[n - 3] + (2.0 * (xp[n - 1] - xp[n - 3]) + h[n - 2]) * h[n - 3] * slope[n - 2]) / (xp[n - 1] - xp[n - 3])
    d = d.at[n - 1].set(dn)
    s = _solve_tridiagonal(a, b, c, d)  # first derivatives at knots

    # evaluate: locate interval, Hermite form
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, n - 2)
    x0 = xp[idx]
    hi = h[idx]
    t = (x - x0) / hi
    f0 = fp[idx]
    f1 = fp[idx + 1]
    s0 = s[idx]
    s1 = s[idx + 1]
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return h00 * f0 + h10 * hi * s0 + h01 * f1 + h11 * hi * s1
