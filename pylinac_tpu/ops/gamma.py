"""Gamma index kernels (JAX): 2D Low-2004 table-I gamma, 1D gamma, Ju et al.
geometric gamma, and the Bakai approximation.

TPU-native rewrite of the reference ``core/gamma.py``: the per-pixel
DTA-disk search becomes a static unrolled min-reduction over shifted copies
of the evaluation array — one fused XLA computation over the whole image
(batchable with vmap) instead of a Python double loop
(``core/gamma.py:287-327``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _disk_offsets(radius: int) -> list[tuple[int, int]]:
    """Offsets of skimage.draw.disk((0,0), radius+1) — the reference's search
    neighborhood (``core/gamma.py:293``), exclusive of the outer edge."""
    offs = []
    r = radius + 1
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy * dy + dx * dx < r * r:  # skimage disk is exclusive of radius
                offs.append((dy, dx))
    return offs


@functools.partial(jax.jit, static_argnames=("distance_to_agreement", "global_dose"))
def gamma_2d(
    reference: jnp.ndarray,
    evaluation: jnp.ndarray,
    dose_to_agreement: float = 1.0,
    distance_to_agreement: int = 1,
    gamma_cap_value: float = 2.0,
    global_dose: bool = True,
    dose_threshold: float = 5.0,
    fill_value: float = jnp.nan,
) -> jnp.ndarray:
    """2D gamma per Low 2004 Table I (reference parity: ``core/gamma.py:229``).

    ``distance_to_agreement`` is in *elements* and must be static.
    """
    reference = reference.astype(jnp.float32)
    evaluation = evaluation.astype(jnp.float32)
    dta = distance_to_agreement

    if global_dose:
        dose_ta = dose_to_agreement / 100.0 * jnp.max(reference)
    else:
        dose_ta = dose_to_agreement / 100.0 * reference
    ref_n = reference / dose_ta
    eval_n = evaluation / dose_ta
    threshold_n = dose_threshold / 100.0

    # edge-pad evaluation so shifted reads stay in bounds
    eval_p = jnp.pad(eval_n, dta, mode="edge")
    h, w = reference.shape

    def xla_form(args):
        ref_l, eval_l = args
        min_gamma2 = jnp.full((h, w), jnp.float32(gamma_cap_value) ** 2)
        for dy, dx in _disk_offsets(dta):
            shifted = jax.lax.dynamic_slice(eval_l, (dta + dy, dta + dx), (h, w))
            dist2 = (dy * dy + dx * dx) / (dta * dta)
            dd = shifted - ref_l
            cand = dist2 + dd * dd
            # reference uses nanmin over the disk
            min_gamma2 = jnp.minimum(
                min_gamma2, jnp.where(jnp.isnan(cand), jnp.inf, cand))
        gamma = jnp.minimum(jnp.sqrt(min_gamma2), gamma_cap_value)
        # below-threshold or NaN reference points get the fill value
        skip = jnp.isnan(ref_l) | (ref_l < threshold_n)
        return jnp.where(skip, fill_value, gamma)

    import os

    from .pallas_gamma import gamma2d_pallas, gamma2d_pallas_supported

    if (gamma2d_pallas_supported((h, w), dta)
            and os.environ.get("PYLINAC_TPU_GAMMA") != "xla"):
        # VMEM-resident offset loop: the XLA form re-reads the padded
        # evaluation from HBM once per disk offset (~300x for DTA=9)
        def pallas_form(args):
            ref_l, eval_l = args
            return gamma2d_pallas(ref_l, eval_l, dta=dta,
                                  cap=gamma_cap_value,
                                  threshold_n=threshold_n, fill=fill_value)

        return jax.lax.platform_dependent(
            (ref_n, eval_p), tpu=pallas_form, default=xla_form)
    return xla_form((ref_n, eval_p))


def gamma_2d_batch(
    references,
    evaluations,
    dose_to_agreement: float = 1.0,
    distance_to_agreement: int = 1,
    gamma_cap_value: float = 2.0,
    global_dose: bool = True,
    dose_threshold: float = 5.0,
    fill_value: float = jnp.nan,
    mesh=None,
) -> jnp.ndarray:
    """Batched 2D gamma over (B, H, W) reference/evaluation pairs.

    The product entry for gamma at batch scale: host arrays are staged in
    link-friendly chunks (:mod:`pylinac_tpu.ops.staging` — a single 48 MB
    ``device_put`` runs at ~1/4 of the tunnel's small-transfer rate), the
    native dtype rides the wire (u16 halves the bytes; conversion happens
    on device), and the whole batch computes in ONE dispatch.
    ``mesh``: optional :class:`jax.sharding.Mesh` with a ``data`` axis to
    shard the batch across devices
    (:func:`pylinac_tpu.parallel.mesh.sharded_gamma_2d`).
    Per-pair semantics match :func:`gamma_2d` (reference
    ``core/gamma.py:229``).
    """
    from .staging import stage

    if mesh is not None:
        from ..parallel.mesh import sharded_gamma_2d

        return sharded_gamma_2d(
            references, evaluations, mesh,
            dose_to_agreement=dose_to_agreement,
            distance_to_agreement=distance_to_agreement,
            gamma_cap_value=gamma_cap_value, global_dose=global_dose,
            dose_threshold=dose_threshold, fill_value=fill_value)
    refs = stage(references)
    evals = stage(evaluations)
    return _gamma_2d_batch_jit(
        refs, evals, dose_to_agreement, distance_to_agreement,
        gamma_cap_value, global_dose, dose_threshold, fill_value)


# cap/threshold/fill stay traced (the pallas kernel reads them from SMEM;
# a static NaN fill would defeat the jit cache since nan != nan)
@functools.partial(jax.jit, static_argnums=(3, 5))
def _gamma_2d_batch_jit(refs, evals, dose_to_agreement,
                        distance_to_agreement, gamma_cap_value, global_dose,
                        dose_threshold, fill_value):
    def one(r, e):
        return gamma_2d(r.astype(jnp.float32), e.astype(jnp.float32),
                        dose_to_agreement=dose_to_agreement,
                        distance_to_agreement=distance_to_agreement,
                        gamma_cap_value=gamma_cap_value,
                        global_dose=global_dose,
                        dose_threshold=dose_threshold,
                        fill_value=fill_value)

    return jax.vmap(one)(refs, evals)


def _interp_extrap(x, xp, fp):
    """Linear interpolation with linear extrapolation beyond the ends
    (scipy interp1d fill_value='extrapolate' semantics)."""
    inner = jnp.interp(x, xp, fp)
    left_slope = (fp[1] - fp[0]) / (xp[1] - xp[0])
    right_slope = (fp[-1] - fp[-2]) / (xp[-1] - xp[-2])
    out = jnp.where(x < xp[0], fp[0] + (x - xp[0]) * left_slope, inner)
    out = jnp.where(x > xp[-1], fp[-1] + (x - xp[-1]) * right_slope, out)
    return out


def gamma_1d(
    reference: jnp.ndarray,
    evaluation: jnp.ndarray,
    reference_coordinates: jnp.ndarray | None = None,
    evaluation_coordinates: jnp.ndarray | None = None,
    dose_to_agreement: float = 1.0,
    distance_to_agreement: float = 1,
    gamma_cap_value: float = 2.0,
    global_dose: bool = True,
    dose_threshold: float = 5.0,
    resolution_factor: int = 3,
    fill_value: float = jnp.nan,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Low Table-I 1D gamma with coordinate support — parity with the
    reference (``core/gamma.py:333``): for each reference point, evaluate the
    linearly-interpolated evaluation profile at ``2·DTA·rf + 1`` points in
    the DTA window and min-reduce the capital gamma.

    Returns (gamma, eval_interp_values, eval_interp_x) like the reference.
    """
    reference = jnp.asarray(reference, jnp.float32)
    evaluation = jnp.asarray(evaluation, jnp.float32)
    n = reference.shape[0]
    if reference_coordinates is None:
        reference_coordinates = jnp.arange(n, dtype=jnp.float32)
    if evaluation_coordinates is None:
        evaluation_coordinates = jnp.arange(evaluation.shape[0], dtype=jnp.float32)

    threshold = jnp.max(reference) / 100.0 * dose_threshold
    dose_ta_global = dose_to_agreement / 100.0 * jnp.max(reference)

    num = int(distance_to_agreement * resolution_factor * 2 + 1)
    offsets = jnp.linspace(-distance_to_agreement, distance_to_agreement, num)
    eval_xs = reference_coordinates[:, None] + offsets[None, :]  # (n, num)
    eval_vals = _interp_extrap(eval_xs, evaluation_coordinates, evaluation)

    dist = jnp.abs(offsets)[None, :]
    dose = reference[:, None] - eval_vals
    dose_ta = dose_ta_global if global_dose else dose_to_agreement / 100.0 * reference[:, None]
    capital_gamma = jnp.sqrt(dist**2 / distance_to_agreement**2 + dose**2 / dose_ta**2)
    gamma = jnp.minimum(jnp.min(capital_gamma, axis=1), gamma_cap_value)
    gamma = jnp.where(reference < threshold, fill_value, gamma)
    return gamma, eval_vals.ravel(), eval_xs.ravel()


def _point_segment_distance2(px, py, x1, y1, x2, y2):
    """Squared distance from point to a segment (vectorized)."""
    vx = x2 - x1
    vy = y2 - y1
    wx = px - x1
    wy = py - y1
    seg_len2 = vx * vx + vy * vy
    t = jnp.clip((wx * vx + wy * vy) / jnp.maximum(seg_len2, 1e-20), 0.0, 1.0)
    dx = wx - t * vx
    dy = wy - t * vy
    return dx * dx + dy * dy


def gamma_geometric(
    reference: jnp.ndarray,
    evaluation: jnp.ndarray,
    reference_coordinates: jnp.ndarray | None = None,
    evaluation_coordinates: jnp.ndarray | None = None,
    dose_to_agreement: float = 1.0,
    distance_to_agreement: float = 1.0,
    gamma_cap_value: float = 2.0,
    dose_threshold: float = 5.0,
    fill_value: float = jnp.nan,
) -> jnp.ndarray:
    """Ju et al. geometric 1D gamma (reference ``core/gamma.py:105``).

    Vectorized: distance of every (x, D) reference point to every evaluation
    polyline segment inside the DTA window, min-reduced — O(N·M) fused math
    instead of the reference's per-point Python loop.
    """
    reference = jnp.asarray(reference, jnp.float32)
    evaluation = jnp.asarray(evaluation, jnp.float32)
    n = reference.shape[0]
    m = evaluation.shape[0]
    if reference_coordinates is None:
        reference_coordinates = jnp.arange(n, dtype=jnp.float32)
    if evaluation_coordinates is None:
        evaluation_coordinates = jnp.arange(m, dtype=jnp.float32)

    threshold = dose_threshold / dose_to_agreement
    ref_max = jnp.max(reference)
    ref_n = reference * 100.0 / (ref_max * dose_to_agreement)
    eval_n = evaluation * 100.0 / (ref_max * dose_to_agreement)
    ref_x = reference_coordinates / distance_to_agreement
    eval_x = evaluation_coordinates / distance_to_agreement

    # same vertex windowing as the reference: argmin of |eval_x - (ref_x ∓ DTA)|,
    # expanded by one on each side; for descending coordinates the window
    # bounds swap in index space — select with where so it traces under jit
    desc = eval_x[-1] < eval_x[0]
    lo_target = ref_x[:, None] - distance_to_agreement
    hi_target = ref_x[:, None] + distance_to_agreement
    lo_diffs = jnp.abs(eval_x[None, :] - lo_target)
    hi_diffs = jnp.abs(eval_x[None, :] - hi_target)
    left_diffs = jnp.where(desc, hi_diffs, lo_diffs)
    right_diffs = jnp.where(desc, lo_diffs, hi_diffs)
    left_idx = jnp.maximum(jnp.argmin(left_diffs, axis=1) - 1, 0)
    right_idx = jnp.minimum(jnp.argmin(right_diffs, axis=1) + 1, m - 1)

    seg_ids = jnp.arange(m - 1)
    seg_mask = (seg_ids[None, :] >= left_idx[:, None]) & (seg_ids[None, :] <= right_idx[:, None] - 1)
    d2 = _point_segment_distance2(
        ref_x[:, None], ref_n[:, None],
        eval_x[None, :-1], eval_n[None, :-1],
        eval_x[None, 1:], eval_n[None, 1:],
    )
    d2 = jnp.where(seg_mask, d2, jnp.inf)
    gamma = jnp.minimum(jnp.sqrt(jnp.min(d2, axis=1)), gamma_cap_value)
    return jnp.where(ref_n < threshold, fill_value, gamma)


def gamma_bakai(
    reference: jnp.ndarray,
    evaluation: jnp.ndarray,
    dpmm: float,
    doseTA: float = 1.0,
    distTA: float = 1.0,
    threshold: float = 0.1,
    ground: bool = True,
    normalize: bool = True,
) -> jnp.ndarray:
    """Bakai et al. 2003 gamma approximation on images — parity with the
    reference's ``BaseImage.gamma`` (``core/image.py:929-1018``):
    Sobel-filter gradient, distTA converted to pixels, below-threshold
    reference pixels NaN'd *before* the gradient.
    """
    from .filters import sobel

    ref = jnp.asarray(reference, jnp.float32)
    ev = jnp.asarray(evaluation, jnp.float32)
    if ground:
        ref = ref - jnp.min(ref)
        ev = ev - jnp.min(ev)
    if normalize:
        ref = ref / jnp.max(ref)
        ev = ev / jnp.max(ev)

    ref = jnp.where(ref < threshold * jnp.max(ref), jnp.nan, ref)
    distTA_pixels = dpmm * distTA
    img_x = sobel(ref, axis=1)
    img_y = sobel(ref, axis=0)
    grad_img = jnp.hypot(img_x, img_y)
    denominator = jnp.sqrt((doseTA / 100.0) ** 2 + (distTA_pixels**2) * grad_img**2)
    return jnp.abs(ev - ref) / denominator
