"""Fully-fused batched field-analysis pipeline (FieldAnalysis parity).

The reference analyzes one open-field image at a time through a chain of
host scipy calls (``/root/reference/pylinac/field_analysis.py:565`` →
``core/profile.py:1119``'s SingleProfile).  Here the ENTIRE analysis —
beam-center centering, strip extraction, the BMF half-pixel resample,
grounding/normalization, FWXM & inflection-derivative edge finding,
penumbra, field windows with their three masked polynomial fits,
flatness/symmetry protocol calculations, and the central-ROI statistics —
is one jitted XLA computation, vmapped over an image batch so a QA
session's worth of field images runs in a single device dispatch.

Numerics mirror ``pylinac_tpu.core.profile.SingleProfile`` query by query
(same peak kernel, same rounding, same window selection) so batch results
match the single-image host path to float32 precision.  Supported edge
methods: FWHM, INFLECTION_DERIVATIVE, and INFLECTION_HILL (the per-edge
4-param sigmoid fits run as masked fixed-slot Levenberg-Marquardt solves
vmapped over edges × images; reference ``core/profile.py:682``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .peaks import (
    MainPeak as _MainPeak,
    _distance_filter,
    _local_maxima,
    main_peak as _main_peak,
    main_peak_ips as _ips_at,
)

# slots for ABOVE-THRESHOLD extrema of the smoothed derivative (strong 0.8
# relative threshold keeps only the field edges, so a few slots suffice)
K_DERIV = 32


class FAParams(NamedTuple):
    """Traced per-batch analysis parameters."""

    dpmm: jnp.ndarray                  # scalar f32 (original-pixel dpmm)
    in_field_ratio: jnp.ndarray
    slope_exclusion_ratio: jnp.ndarray
    pen_lower: jnp.ndarray             # e.g. 20.
    pen_upper: jnp.ndarray             # e.g. 80.
    vert_position: jnp.ndarray         # ratio along W (MANUAL centering)
    horiz_position: jnp.ndarray        # ratio along H
    vert_width: jnp.ndarray            # ratio of W
    horiz_width: jnp.ndarray           # ratio of H


# ---------------------------------------------------------------------------
# profile building blocks
# ---------------------------------------------------------------------------
def _resample_linear(v: jnp.ndarray, samples: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linear resample with the reference's half-pixel ('BMF') offset
    (``core/profile.py:1312-1360`` semantics): new x spans
    [-offset, n-1+offset] with ``samples`` points; linear extrapolation at
    the two ends rides the terminal segments.

    Returns (values, x0, dx) where x_indices[k] = x0 + k*dx (original-pixel
    coordinates).
    """
    n = v.shape[0]
    f = samples / n
    offset = 0.5 - 1.0 / (2.0 * f)
    x0 = -offset
    dx = (n - 1.0 + 2.0 * offset) / (samples - 1)
    t = x0 + dx * jnp.arange(samples)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    y = v[i] + (v[i + 1] - v[i]) * (t - i)
    return y.astype(jnp.float32), jnp.float32(x0), jnp.float32(dx)


def _y_at_frac(v: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Linear interp of ``v`` at fractional array index with linear
    extrapolation along the terminal segments."""
    n = v.shape[0]
    i = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n - 2)
    return v[i] + (v[i + 1] - v[i]) * (idx - i)


def _first_thresholded_peak(sig: jnp.ndarray, distance: float, first: bool) -> jnp.ndarray:
    """Index of the first (or last) peak above the reference's 0.8 relative
    threshold (``MultiProfile.find_peaks(threshold=0.8)`` semantics).

    The height filter is applied BEFORE slot collection so noisy signals
    with many sub-threshold maxima cannot overflow the K budget (the host
    path handles this by adaptively escalating K)."""
    n = sig.shape[0]
    thresh = jnp.min(sig) + 0.8 * (jnp.max(sig) - jnp.min(sig))
    is_pk = _local_maxima(sig) & (sig >= thresh)
    pos = jnp.nonzero(is_pk, size=K_DERIV, fill_value=-1)[0].astype(jnp.int32)
    valid = pos >= 0
    val = sig[jnp.maximum(pos, 0)]
    valid = _distance_filter(
        pos, val, valid, jnp.ceil(jnp.asarray(distance, jnp.float32)), K_DERIV)
    if first:
        return jnp.min(jnp.where(valid, pos, n)).astype(jnp.float32)
    return jnp.max(jnp.where(valid, pos, 0)).astype(jnp.float32)


def _masked_linear_fit(x: jnp.ndarray, y: jnp.ndarray, m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """0/1-masked least-squares line ``y = a x + b`` (np.polyfit deg-1 on
    the masked points; computed centered for f32 stability)."""
    w = m.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    xm = jnp.sum(w * x) / cnt
    ym = jnp.sum(w * y) / cnt
    dxc = jnp.where(m, x - xm, 0.0)
    var = jnp.sum(dxc * dxc)
    cov = jnp.sum(dxc * (y - ym))
    a = cov / jnp.maximum(var, 1e-20)
    return a, ym - a * xm


def _masked_quadratic_fit(x: jnp.ndarray, y: jnp.ndarray, m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """0/1-masked least-squares parabola ``y = a x² + b x + c`` via a
    scaled-basis 3×3 normal solve (np.polyfit deg-2 parity at f32)."""
    w = m.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    xm = jnp.sum(w * x) / cnt
    hw = jnp.maximum(jnp.max(jnp.where(m, jnp.abs(x - xm), 0.0)), 1e-6)
    u = jnp.where(m, (x - xm) / hw, 0.0)
    u2 = u * u
    g = jnp.stack([
        jnp.stack([jnp.sum(w), jnp.sum(u), jnp.sum(u2)]),
        jnp.stack([jnp.sum(u), jnp.sum(u2), jnp.sum(u2 * u)]),
        jnp.stack([jnp.sum(u2), jnp.sum(u2 * u), jnp.sum(u2 * u2)]),
    ])
    rhs = jnp.stack([jnp.sum(w * y), jnp.sum(u * y), jnp.sum(u2 * y)])
    c0, c1, c2 = jnp.linalg.solve(g, rhs)
    # back to unscaled x: y = a x² + b x + c with x replaced by (x-xm)/hw
    a = c2 / (hw * hw)
    b = c1 / hw - 2.0 * c2 * xm / (hw * hw)
    c = c0 - c1 * xm / hw + c2 * xm * xm / (hw * hw)
    return a, b, c


def _hill_fit_masked(x: jnp.ndarray, y: jnp.ndarray, m: jnp.ndarray,
                     n_iter: int = 60) -> jnp.ndarray:
    """Masked fixed-slot Hill fit — same solver + initial guess as
    :func:`pylinac_tpu.ops.optimize.hill_fit` (reference ``core/hill.py:22``)
    but over a contiguous run of valid slots so the window length can stay
    a traced value."""
    from .optimize import hill_func, levenberg_marquardt

    big = jnp.float32(1e30)
    n_valid = jnp.maximum(jnp.sum(m), 2)
    first = jnp.argmax(m)
    last = first + n_valid - 1
    mid = first + n_valid // 2
    ymin = jnp.min(jnp.where(m, y, big))
    ymax = jnp.max(jnp.where(m, y, -big))
    slope_up = y[last] > y[first]
    p0 = jnp.stack([ymin, ymax, x[mid], jnp.where(slope_up, 10.0, -10.0)])
    xs = jnp.where(m, x, 1.0)  # masked-out x may be <=0: guard the power

    def residual(p):
        return jnp.where(m, hill_func(xs, p[0], p[1], p[2], p[3]) - y, 0.0)

    return levenberg_marquardt(residual, p0, n_iter=n_iter)


def _hill_edges(v: jnp.ndarray, x0: jnp.ndarray, dx: jnp.ndarray,
                seed_left: jnp.ndarray, seed_right: jnp.ndarray,
                half_window: jnp.ndarray, samples: int, K: int):
    """Fit the left and right Hill sigmoids around the derivative-seeded
    edges and return (params_l, params_r, infl_l, infl_r) in original-pixel
    coordinates (``SingleProfile._inflection_data`` Hill branch,
    ``core/profile.py:840-859``): window x = arange(seed−hw, seed+hw) at unit
    original-pixel steps, left filtered to x≥0, right to x<len(interp)."""
    from .optimize import hill_inflection

    k = jnp.arange(K, dtype=jnp.float32)

    def fit(seed, lo, hi):
        x = seed - half_window + k
        m = (k < 2.0 * half_window) & (x >= lo) & (x < hi)
        y = _y_at_frac(v, (x - x0) / dx)
        return _hill_fit_masked(x, y, m)

    params_l = fit(seed_left, 0.0, jnp.inf)
    params_r = fit(seed_right, -jnp.inf, float(samples))
    return params_l, params_r, hill_inflection(params_l), hill_inflection(params_r)


# ---------------------------------------------------------------------------
# the per-profile analysis
# ---------------------------------------------------------------------------
def analyze_field_profile(
    values: jnp.ndarray,
    params: FAParams,
    *,
    samples: int,
    edge: str,                 # "FWHM" | "Inflection Derivative" | "Inflection Hill"
    centering: str,            # "Beam center" | "Geometric center" | "manual"
    normalization: str,        # "Beam center" | "Max" | "None" | "Geometric center"
    flatness: str,             # "difference" | "ratio" | "none"
    symmetry: str,             # "point difference" | "pdq" | "area" | "none"
    ground: bool = True,
    edge_smoothing_ratio: float = 0.003,
    hill_window_ratio: float = 0.15,
) -> dict:
    """All FieldAnalysis scalar metrics of ONE 1D profile; pure jax.

    Mirrors ``SingleProfile`` + the module-level protocol functions
    (``pylinac_tpu/field_analysis.py``); reference semantics at
    ``/root/reference/pylinac/field_analysis.py:37-233,565``.
    """
    n_orig = values.shape[0]
    v, x0, dx = _resample_linear(values.astype(jnp.float32), samples)
    if ground:
        v = v - jnp.min(v)

    def to_orig(ip):
        return x0 + ip * dx

    def y_at_orig(xo):
        return _y_at_frac(v, (xo - x0) / dx)

    # main peak structure (scale- and shift-invariant selection)
    pk = _main_peak(v)
    l50, r50 = _ips_at(v, pk, jnp.float32(0.5))
    fwhm_center = (to_orig(l50) + to_orig(r50)) / 2.0
    fwhm_width = to_orig(r50) - to_orig(l50)

    # inflection-derivative edges (index results are normalization-invariant)
    if edge in ("Inflection Derivative", "Inflection Hill"):
        from .filters import gaussian_filter1d

        sigma = edge_smoothing_ratio * samples
        d1 = jnp.gradient(gaussian_filter1d(v, sigma=sigma))
        sep = float(max(int(0.05 * samples), 1))
        infl_left = _first_thresholded_peak(d1, sep, first=True)
        infl_right = _first_thresholded_peak(-d1, sep, first=False)
        infl_left_orig = to_orig(infl_left)
        infl_right_orig = to_orig(infl_right)
        beam_center_idx = infl_left_orig + (infl_right_orig - infl_left_orig) / 2.0
        full_width = infl_right_orig - infl_left_orig
    else:
        infl_left_orig = to_orig(l50)
        infl_right_orig = to_orig(r50)
        beam_center_idx = fwhm_center
        full_width = fwhm_width

    if edge == "Inflection Hill":
        # fixed slot budget: window length = 2·hw ≤ ratio·(n_orig + 1) + 1
        k_hill = int(hill_window_ratio * (n_orig + 2)) + 4
        seed_left, seed_right = infl_left_orig, infl_right_orig
        hill_hw = jnp.round(
            hill_window_ratio * jnp.abs(seed_right - seed_left) / 2.0)
        if normalization == "Beam center":
            # the host path computes the normalization scale from a Hill fit
            # on the GROUNDED values, then re-fits after normalizing
            _, _, il0, ir0 = _hill_edges(
                v, x0, dx, seed_left, seed_right, hill_hw, samples, k_hill)
            beam_center_idx = il0 + (ir0 - il0) / 2.0

    # normalization (reference Normalization enum semantics)
    bc_val_rounded = y_at_orig(jnp.round(beam_center_idx))
    if normalization == "Beam center":
        scale = bc_val_rounded
    elif normalization == "Max":
        scale = jnp.max(v)
    elif normalization == "Geometric center":
        mid = samples // 2
        scale = (v[mid] + v[mid - 1]) / 2.0 if samples % 2 == 0 else v[(samples - 1) // 2]
    else:
        scale = jnp.float32(1.0)
    v = v / scale
    pk = pk._replace(val=pk.val / scale, prom=pk.prom / scale)
    bc_val_rounded = bc_val_rounded / scale

    if edge == "Inflection Hill":
        # final fits on the normalized values (the host path's memo cache is
        # invalidated by normalization, so inflection_data re-fits there too)
        hill_l, hill_r, infl_left_orig, infl_right_orig = _hill_edges(
            v, x0, dx, seed_left, seed_right, hill_hw, samples, k_hill)
        beam_center_idx = infl_left_orig + (infl_right_orig - infl_left_orig) / 2.0
        full_width = infl_right_orig - infl_left_orig
        bc_val_rounded = y_at_orig(jnp.round(beam_center_idx))

    geometric_center_idx = to_orig((samples - 1) / 2.0)
    cax_idx = geometric_center_idx
    center_idx = cax_idx if centering == "Geometric center" else beam_center_idx

    # ---- penumbra ----------------------------------------------------------
    hill_grads = None
    if edge == "FWHM":
        lo_l, lo_r = _ips_at(v, pk, 1.0 - params.pen_lower / 100.0)
        hi_l, hi_r = _ips_at(v, pk, 1.0 - params.pen_upper / 100.0)
        pen_left = jnp.abs(to_orig(hi_l) - to_orig(lo_l))
        pen_right = jnp.abs(to_orig(hi_r) - to_orig(lo_r))
    elif edge == "Inflection Hill":
        # analytic from the fitted sigmoids (``SingleProfile.penumbra`` Hill
        # branch, ``core/profile.py:916-948``)
        from .optimize import hill_func, hill_gradient, hill_x_at_y

        left_val = hill_func(infl_left_orig, *hill_l)
        right_val = hill_func(infl_right_orig, *hill_r)
        pen_left = jnp.abs(
            hill_x_at_y(hill_l, left_val * params.pen_upper / 50.0)
            - hill_x_at_y(hill_l, left_val * params.pen_lower / 50.0))
        pen_right = jnp.abs(
            hill_x_at_y(hill_r, right_val * params.pen_upper / 50.0)
            - hill_x_at_y(hill_r, right_val * params.pen_lower / 50.0))
        hill_grads = (hill_gradient(hill_l, infl_left_orig),
                      hill_gradient(hill_r, infl_right_orig))
    else:
        vmax = jnp.max(v)
        left_val = y_at_orig(infl_left_orig)
        right_val = y_at_orig(infl_right_orig)
        ll_pct = jnp.maximum(left_val / vmax * params.pen_lower / 50.0 * 100.0, 1.0)
        ul_pct = jnp.minimum(left_val / vmax * params.pen_upper / 50.0 * 100.0, 99.0)
        lr_pct = jnp.maximum(right_val / vmax * params.pen_lower / 50.0 * 100.0, 1.0)
        ur_pct = jnp.minimum(right_val / vmax * params.pen_upper / 50.0 * 100.0, 99.0)
        ll, _ = _ips_at(v, pk, 1.0 - ll_pct / 100.0)
        ul, _ = _ips_at(v, pk, 1.0 - ul_pct / 100.0)
        _, lr = _ips_at(v, pk, 1.0 - lr_pct / 100.0)
        _, ur = _ips_at(v, pk, 1.0 - ur_pct / 100.0)
        pen_left = jnp.abs(to_orig(ul) - to_orig(ll))
        pen_right = jnp.abs(to_orig(ur) - to_orig(lr))

    # ---- field data (at in_field_ratio and at 1.0) -------------------------
    x_idx = x0 + dx * jnp.arange(samples)

    def field_data(ratio):
        f_left = center_idx - ratio * full_width / 2.0
        f_right = center_idx + ratio * full_width / 2.0
        f_width = f_right - f_left
        in_left = center_idx - params.slope_exclusion_ratio * f_width / 2.0
        in_right = center_idx + params.slope_exclusion_ratio * f_width / 2.0

        lmask = (x_idx >= f_left) & (x_idx <= in_left)
        rmask = (x_idx >= in_right) & (x_idx <= f_right)
        tmask = (x_idx >= in_left) & (x_idx <= in_right)
        lslope, _ = _masked_linear_fit(x_idx, v, lmask)
        rslope, _ = _masked_linear_fit(x_idx, v, rmask)
        qa, qb, _qc = _masked_quadratic_fit(x_idx, v, tmask)

        t_lo = jnp.min(jnp.where(tmask, x_idx, jnp.inf))
        t_hi = jnp.max(jnp.where(tmask, x_idx, -jnp.inf))
        vertex = jnp.where(qa != 0.0, -qb / (2.0 * qa), (t_lo + t_hi) / 2.0)
        y_lo = qa * t_lo * t_lo + qb * t_lo
        y_hi = qa * t_hi * t_hi + qb * t_hi
        top_idx = jnp.where(
            qa < 0.0,
            jnp.clip(vertex, t_lo, t_hi),
            jnp.where(y_lo >= y_hi, t_lo, t_hi),
        )

        # shifted in-field window (reference field values extraction)
        off = center_idx - jnp.round(center_idx)
        kmin = jnp.clip(jnp.round((f_left - off - x0) / dx), 0, samples - 1).astype(jnp.int32)
        kmax = jnp.clip(jnp.round((f_right - off - x0) / dx), 0, samples - 1).astype(jnp.int32)
        return {
            "f_left": f_left, "f_right": f_right, "width": f_width,
            "left_slope": lslope, "right_slope": rslope, "top_idx": top_idx,
            "kmin": kmin, "kmax": kmax, "shift_frac": off / dx,
        }

    fd_full = field_data(jnp.float32(1.0))
    fd_in = field_data(params.in_field_ratio)

    # field values of the in-field window (gathered, masked)
    ks = jnp.arange(samples)
    nf = fd_in["kmax"] - fd_in["kmin"] + 1
    fmask = ks < nf
    fvals = _y_at_frac(v, (fd_in["kmin"] + ks + fd_in["shift_frac"]).astype(jnp.float32))
    fvals_rev = _y_at_frac(v, (fd_in["kmin"] + (nf - 1 - ks) + fd_in["shift_frac"]).astype(jnp.float32))

    # ---- protocol: flatness ------------------------------------------------
    fmax = jnp.max(jnp.where(fmask, fvals, -jnp.inf))
    fmin = jnp.min(jnp.where(fmask, fvals, jnp.inf))
    if flatness == "ratio":
        flat = 100.0 * fmax / fmin
    else:
        flat = 100.0 * jnp.abs(fmax - fmin) / (fmax + fmin)

    # ---- protocol: symmetry ------------------------------------------------
    if symmetry == "pdq":
        s1 = fvals / fvals_rev
        s2 = fvals_rev / fvals
        sign = jnp.where(jnp.abs(s1) > jnp.abs(s2), jnp.sign(s1), jnp.sign(s2))
        svals = jnp.maximum(jnp.abs(s1), jnp.abs(s2)) * sign
        svals = jnp.where(fmask, svals, 0.0)
        sym = svals[jnp.argmax(jnp.abs(svals))]
    elif symmetry == "area":
        half_lo = jnp.floor(nf / 2.0)
        area_left = jnp.sum(jnp.where(ks < half_lo, fvals, 0.0))
        area_right = jnp.sum(jnp.where((ks >= jnp.ceil(nf / 2.0)) & fmask, fvals, 0.0))
        sym = 100.0 * (area_left - area_right) / (area_left + area_right)
    else:  # point difference (Varian)
        svals = jnp.where(fmask, 100.0 * (fvals - fvals_rev) / bc_val_rounded, 0.0)
        sym = svals[jnp.argmax(jnp.abs(svals))]

    mm = params.dpmm
    out = {
        "penumbra_left_mm": pen_left / mm,
        "penumbra_right_mm": pen_right / mm,
        "geometric_center_idx": geometric_center_idx,
        "beam_center_idx": beam_center_idx,
        "field_size_mm": fd_full["width"] / mm,
        "bc_to_left_mm": jnp.abs(beam_center_idx - fd_full["f_left"]) / mm,
        "bc_to_right_mm": jnp.abs(fd_full["f_right"] - beam_center_idx) / mm,
        "cax_to_left_mm": jnp.abs(cax_idx - fd_full["f_left"]) / mm,
        "cax_to_right_mm": jnp.abs(cax_idx - fd_full["f_right"]) / mm,
        "top_idx": fd_in["top_idx"],
        "top_to_cax_mm": jnp.abs(fd_in["top_idx"] - cax_idx) / mm,
        "top_to_bc_mm": (fd_in["top_idx"] - beam_center_idx) / mm,
        "left_slope_pct_mm": fd_in["left_slope"] * mm * 100.0,
        "right_slope_pct_mm": fd_in["right_slope"] * mm * 100.0,
        "flatness": flat,
        "symmetry": sym,
    }
    if hill_grads is not None:
        out["penumbra_left_grad_pct_mm"] = jnp.abs(hill_grads[0] * mm * 100.0)
        out["penumbra_right_grad_pct_mm"] = jnp.abs(hill_grads[1] * mm * 100.0)
    return out


def _beam_center_ratio(sums: jnp.ndarray) -> jnp.ndarray:
    """Beam-center position ratio of a row/column-sum profile — the
    reference's ``_determine_center`` on a default SingleProfile (LINEAR ×10
    interp, FWHM edge); index results are ground/normalization-invariant."""
    n = sums.shape[0]
    samples = int(round(n * 10))
    v, x0, dx = _resample_linear(sums.astype(jnp.float32), samples)
    v = v - jnp.min(v)
    pk = _main_peak(v)
    l50, r50 = _ips_at(v, pk, jnp.float32(0.5))
    center = x0 + dx * (l50 + r50) / 2.0
    return center / n


# ---------------------------------------------------------------------------
# whole-image / batch entry points
# ---------------------------------------------------------------------------
def field_analysis_image(
    img: jnp.ndarray,
    params: FAParams,
    *,
    samples_v: int,
    samples_h: int,
    edge: str,
    centering: str,
    normalization: str,
    flatness: str,
    symmetry: str,
    ground: bool = True,
    edge_smoothing_ratio: float = 0.003,
    hill_window_ratio: float = 0.15,
) -> dict:
    """One open-field EPID image → every FieldResult scalar; pure jax."""
    H, W = img.shape
    img = img.astype(jnp.float32)

    if centering == "Beam center":
        vert_position = _beam_center_ratio(jnp.sum(img, axis=0))
        horiz_position = _beam_center_ratio(jnp.sum(img, axis=1))
    elif centering == "Geometric center":
        vert_position = jnp.float32(((W - 1) / 2.0) / W)
        horiz_position = jnp.float32(((H - 1) / 2.0) / H)
    else:
        vert_position = params.vert_position
        horiz_position = params.horiz_position

    # strip extraction (masked means; reference rounding semantics)
    left_v = jnp.maximum(jnp.round(W * vert_position - W * params.vert_width / 2.0), 0)
    right_v = jnp.minimum(jnp.round(W * vert_position + W * params.vert_width / 2.0) + 1, W)
    cols = jnp.arange(W)
    vmask = (cols >= left_v) & (cols < right_v)
    vert_values = jnp.sum(jnp.where(vmask[None, :], img, 0.0), axis=1) / jnp.maximum(jnp.sum(vmask), 1)

    upper_h = jnp.maximum(jnp.round(H * horiz_position - H * params.horiz_width / 2.0), 0)
    lower_h = jnp.minimum(jnp.round(H * horiz_position + H * params.horiz_width / 2.0) + 1, H)
    rows = jnp.arange(H)
    hmask = (rows >= upper_h) & (rows < lower_h)
    horiz_values = jnp.sum(jnp.where(hmask[:, None], img, 0.0), axis=0) / jnp.maximum(jnp.sum(hmask), 1)

    kw = dict(edge=edge, centering=centering, normalization=normalization,
              flatness=flatness, symmetry=symmetry, ground=ground,
              edge_smoothing_ratio=edge_smoothing_ratio,
              hill_window_ratio=hill_window_ratio)
    vert = analyze_field_profile(vert_values, params, samples=samples_v, **kw)
    horiz = analyze_field_profile(horiz_values, params, samples=samples_h, **kw)

    # central ROI (reference: rectangle between the strip lines)
    roi_w = jnp.maximum(jnp.abs(left_v - right_v), 2)
    roi_h = jnp.maximum(jnp.abs(upper_h - lower_h), 2)
    cx = roi_w / 2.0 + left_v
    cy = roi_h / 2.0 + upper_h
    # polygon rasterization excludes the bottom/right boundary row & column
    # (RectangleROI.pixels_flat semantics)
    rmask = ((cols[None, :] >= jnp.round(cx - roi_w / 2.0))
             & (cols[None, :] < jnp.round(cx + roi_w / 2.0) - 1)
             & (rows[:, None] >= jnp.round(cy - roi_h / 2.0))
             & (rows[:, None] < jnp.round(cy + roi_h / 2.0) - 1))
    cnt = jnp.maximum(jnp.sum(rmask), 1)
    rmean = jnp.sum(jnp.where(rmask, img, 0.0)) / cnt
    rvar = jnp.sum(jnp.where(rmask, (img - rmean) ** 2, 0.0)) / cnt
    central_roi = {
        "mean": rmean,
        "std": jnp.sqrt(rvar),
        "max": jnp.max(jnp.where(rmask, img, -jnp.inf)),
        "min": jnp.min(jnp.where(rmask, img, jnp.inf)),
    }
    return {
        "vert": vert, "horiz": horiz, "central_roi": central_roi,
        "strip_edges": jnp.stack([left_v, right_v, upper_h, lower_h]),
    }


_FA_STATICS = ("samples_v", "samples_h", "edge", "centering",
               "normalization", "flatness", "symmetry", "ground",
               "edge_smoothing_ratio", "hill_window_ratio")


def _field_analysis_batch(images: jnp.ndarray, params: FAParams, **static) -> dict:
    single = functools.partial(field_analysis_image, params=params, **static)
    return jax.vmap(lambda im: single(im))(images.astype(jnp.float32))


field_analysis_batch = functools.partial(jax.jit, static_argnames=_FA_STATICS)(
    _field_analysis_batch)
field_analysis_batch.__doc__ = (
    "(B, H, W) batch → per-image FieldResult scalars in ONE dispatch.")


@functools.partial(jax.jit, static_argnames=_FA_STATICS)
def field_analysis_batch_packed(images: jnp.ndarray, params: FAParams, **static) -> jnp.ndarray:
    """Same as :func:`field_analysis_batch` but returns ONE packed f32
    vector so remote hosts pay a single device→host fetch
    (``ops.pack.unpack_tree`` restores the dict)."""
    from .pack import pack_tree

    return pack_tree(_field_analysis_batch(images, params, **static))


_FA_STRIP_STATICS = ("samples_v", "samples_h", "edge", "centering",
                     "normalization", "flatness", "symmetry", "ground",
                     "edge_smoothing_ratio", "hill_window_ratio")


def _field_analysis_strips_batch(vert_strips: jnp.ndarray,
                                 horiz_strips: jnp.ndarray,
                                 params: FAParams, *, samples_v: int,
                                 samples_h: int, **static) -> dict:
    """Per-profile analysis of pre-extracted (B, H) vertical and (B, W)
    horizontal strips — the transfer-lean batch entry: centering, strip
    extraction, and the central ROI run host-side
    (:mod:`pylinac_tpu.ops.field_host`), so only ~2·(H+W) floats per image
    cross the link instead of the H×W frame."""
    vert = jax.vmap(
        lambda s: analyze_field_profile(s, params, samples=samples_v, **static)
    )(vert_strips.astype(jnp.float32))
    horiz = jax.vmap(
        lambda s: analyze_field_profile(s, params, samples=samples_h, **static)
    )(horiz_strips.astype(jnp.float32))
    return {"vert": vert, "horiz": horiz}


field_analysis_strips_batch = functools.partial(
    jax.jit, static_argnames=_FA_STRIP_STATICS)(_field_analysis_strips_batch)


@functools.partial(jax.jit, static_argnames=_FA_STRIP_STATICS)
def field_analysis_strips_batch_packed(vert_strips: jnp.ndarray,
                                       horiz_strips: jnp.ndarray,
                                       params: FAParams, **static) -> jnp.ndarray:
    """Packed single-fetch variant of :func:`field_analysis_strips_batch`."""
    from .pack import pack_tree

    return pack_tree(_field_analysis_strips_batch(
        vert_strips, horiz_strips, params, **static))


_FA_WIRE_STATICS = _FA_STRIP_STATICS + ("B", "H", "W")

N_FA_PARAMS = len(FAParams._fields)


@functools.partial(jax.jit, static_argnames=_FA_WIRE_STATICS)
def field_analysis_wire_packed(wire: jnp.ndarray, *, B: int, H: int, W: int,
                               **static) -> jnp.ndarray:
    """One-wire batch entry: the ENTIRE host→device payload — (B, H) vertical
    strips, (B, W) horizontal strips, and the 9 :class:`FAParams` scalars —
    arrives as ONE flat float32 vector, so a tunneled device pays exactly one
    H2D transfer, one dispatch, and (via the packed return) one D2H fetch per
    batch (reference per-image loop: /root/reference/pylinac/field_analysis.py:565).
    Params ride the wire as traced values, so changing tolerances/penumbra
    does not retrigger compilation."""
    from .pack import pack_tree

    vert = wire[: B * H].reshape(B, H)
    horiz = wire[B * H: B * H + B * W].reshape(B, W)
    p = wire[B * H + B * W:]
    params = FAParams(*(p[i] for i in range(N_FA_PARAMS)))
    return pack_tree(_field_analysis_strips_batch(vert, horiz, params, **static))
