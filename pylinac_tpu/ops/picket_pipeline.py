"""Fully-jitted picket fence pipeline: whole-image-batch MLC analysis.

The reference analyzes one image at a time with a Python loop of scipy calls
per leaf-kiss window (``/root/reference/pylinac/picketfence.py:636,1605``).
Here the ENTIRE analysis — picket peak finding on the mean profile, window
extraction for every (leaf, picket) kiss, masked median profiles, validity
tests, FWXM positions, per-picket line fits, and leaf errors — is one jitted
XLA computation mapped over an image batch. A QA session's worth of picket
fence images runs in a single device dispatch.

Canonical orientation is UP-DOWN (pickets along columns, leaves along rows);
the host API transposes LEFT-RIGHT images before staging the batch.

Numerics mirror ``pylinac_tpu.picketfence.PicketFence.analyze`` step for
step (same peak kernel, same window truncation arithmetic, same zero-pad
normalization) so batch results match the single-image path to float32
precision.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .peaks import (
    compact_slots,
    main_peak,
    main_peak_ips,
    peak_analysis,
    select_top,
)


class PFLeafConfig(NamedTuple):
    """Static-per-batch leaf window geometry (device arrays, shared by every
    image in the batch — same shape, dpmm, and MLC model)."""

    tops: jnp.ndarray         # (L,) int32 window top row (incl.)
    heights: jnp.ndarray      # (L,) int32 window row count
    centers_px: jnp.ndarray   # (L,) f32 leaf center row (px)
    widths_px: jnp.ndarray    # (L,) f32 leaf width (px)


class PFParams(NamedTuple):
    """Traced analysis parameters (shared across the batch)."""

    height_threshold: jnp.ndarray   # scalar f32
    edge_threshold: jnp.ndarray
    required_prominence: jnp.ndarray
    fwxm: jnp.ndarray               # e.g. 50.0
    dpmm: jnp.ndarray
    cax_col: jnp.ndarray            # image center column ((W/2) - 0.5)
    analysis_ratio: jnp.ndarray     # leaf_analysis_width_ratio
    nominal_gap_px: jnp.ndarray     # nominal_gap_mm / 2 * dpmm (separate leaves)
    invert: jnp.ndarray = np.False_  # explicit user inversion (bool scalar)


def preprocess_pf_image(img: jnp.ndarray, *, despike: bool = True,
                        extra_filter: int = 0,
                        invert=False) -> jnp.ndarray:
    """In-kernel PF image conditioning — the device equivalent of the host
    preprocessing the reference does eagerly per image
    (``picketfence.py:204-238`` de-spiking, corner inversion check;
    ``:405`` ground+normalize; explicit ``invert`` from ``analyze``).

    Equivalences used (all exact): median and value-inversion commute;
    ground+normalize after inversion equals inversion after
    ground+normalize; a second inversion cancels the first, so the explicit
    user flag XORs with the corner-sample decision.
    """
    from .filters import _median_general

    img = img.astype(jnp.float32)
    H, W = img.shape

    def has_noise(a):
        from .stats import percentile_exact

        vmin, vmax = jnp.min(a), jnp.max(a)
        # exact np.percentile semantics via bit-search order statistics:
        # the sort form costs ~4.2 ms per 1280x1280 frame on a v5e (~270 ms
        # of a 64-image batch's ~1 s warm analyze); the search form ~1 ms
        near = percentile_exact(a, (0.5, 99.5))
        near_min, near_max = near[0], near[1]
        max_is_extreme = vmax > near_max * 1.25
        min_is_extreme = (vmin < near_min * 0.75) & (
            jnp.abs(vmin - near_min) > 0.1 * (near_max - near_min))
        return max_is_extreme | min_is_extreme

    if despike:
        def cond(state):
            a, i = state
            return (i < 5) & has_noise(a)

        def body(state):
            a, i = state
            return _median_general(a, 3), i + 1

        img, _ = jax.lax.while_loop(cond, body, (img, jnp.int32(0)))

    # corner-sample inversion check (box_size=10, position=(0.01, 0.01))
    rp, cp, b = max(int(0.01 * H), 1), max(int(0.01 * W), 1), 10
    corners = jnp.stack([
        img[rp:rp + b, cp:cp + b], img[rp:rp + b, W - cp - b:W - cp],
        img[H - rp - b:H - rp, cp:cp + b],
        img[H - rp - b:H - rp, W - cp - b:W - cp]])
    do_inv = jnp.mean(corners) > jnp.mean(img)
    do_inv = do_inv ^ jnp.asarray(invert, bool)
    vmin, vmax = jnp.min(img), jnp.max(img)
    img = jnp.where(do_inv, -img + vmax + vmin, img)

    if extra_filter > 1:
        img = _median_general(img, extra_filter)

    img = img - jnp.min(img)
    return img / jnp.max(img)


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """np.median over the masked entries along the LAST axis
    (count-dependent middle pair, matching numpy)."""
    big = jnp.asarray(jnp.inf, values.dtype)
    filled = jnp.where(mask, values, big)
    s = jnp.sort(filled, axis=-1)
    cnt = jnp.sum(mask, axis=-1)
    lo = jnp.maximum((cnt - 1) // 2, 0)
    hi = jnp.maximum(cnt // 2, 0)
    a = jnp.take_along_axis(s, lo[..., None], axis=-1)[..., 0]
    b = jnp.take_along_axis(s, hi[..., None], axis=-1)[..., 0]
    return (a + b) / 2.0


def _compact_valid(values: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Move valid entries to the front preserving order; tail is +inf."""
    K = values.shape[0]
    big = jnp.asarray(jnp.inf, values.dtype)
    key = jnp.where(valid, jnp.arange(K), K + jnp.arange(K))
    order = jnp.argsort(key)
    n = jnp.sum(valid)
    out = jnp.where(jnp.arange(K) < n, values[order], big)
    return out, n


def _fit_line(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted least-squares line y = a*x + b (centered for f32 stability).
    Returns (a, b); zero-weight-safe."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    xm = jnp.sum(w * x) / wsum
    ym = jnp.sum(w * y) / wsum
    dx = x - xm
    var = jnp.sum(w * dx * dx)
    cov = jnp.sum(w * dx * (y - ym))
    a = jnp.where(var > 1e-12, cov / jnp.maximum(var, 1e-12), 0.0)
    return jnp.stack([a, ym - a * xm])


def picket_fence_image(
    img: jnp.ndarray,
    cfg: PFLeafConfig,
    params: PFParams,
    *,
    K_P: int,
    W_MAX: int,
    H_MAX: int,
    KISS_K: int = 8,
    num_pickets: int | None = None,
    peak_sort: str = "peak_heights",
    separate_leaves: bool = False,
    min_distance_frac: float = 0.02,
    preprocess: bool = False,
    extra_filter: int = 0,
) -> dict:
    """Analyze ONE picket-fence image; pure jax, jit/vmap/map-friendly.

    Returns fixed-shape arrays; invalid kiss/picket slots carry masks.
    """
    H, W = img.shape
    L = cfg.tops.shape[0]
    img = img.astype(jnp.float32)
    if preprocess:
        img = preprocess_pf_image(img, despike=True, extra_filter=extra_filter,
                                  invert=params.invert)

    # ---- picket peaks on the normalized mean leaf profile ------------------
    leaf_prof = jnp.mean(img, axis=0)
    leaf_prof = leaf_prof / jnp.max(leaf_prof)
    vmin, vmax = jnp.min(leaf_prof), jnp.max(leaf_prof)
    height_abs = vmin + params.height_threshold * (vmax - vmin)
    sep = max(int(min_distance_frac * W), 1)
    # analyze with a generous slot count (noise maxima above the height
    # threshold, e.g. on picket tops, may outnumber the pickets), then
    # compact the surviving peaks into the K_P working slots
    res = peak_analysis(leaf_prof, K=4 * K_P, rel_height=0.5, height=height_abs,
                        distance=float(sep),
                        required_prominence=params.required_prominence)
    res = select_top(res, num_pickets, peak_sort)
    res = compact_slots(res, K_P)
    fwxm_idx = jnp.round(res.left_ips + (res.right_ips - res.left_ips) / 2
                         ).astype(jnp.int32)
    fwxm_idx = jnp.clip(fwxm_idx, 0, W - 1)
    picket_valid = res.valid
    picket_vals = leaf_prof[fwxm_idx]
    n_pickets = jnp.sum(picket_valid)

    # picket spacing: median diff of the sorted valid fwxm indices
    sorted_idx, n_valid = _compact_valid(fwxm_idx.astype(jnp.float32), picket_valid)
    diffs = sorted_idx[1:] - sorted_idx[:-1]
    diff_ok = jnp.arange(K_P - 1) < (n_valid - 1)
    spacing = _masked_median(jnp.where(diff_ok, diffs, 0.0), diff_ok)
    spacing = jnp.where(n_valid > 1, spacing, jnp.float32(W_MAX))

    # ---- kiss windows: (L, K_P) grid ---------------------------------------
    approx = fwxm_idx.astype(jnp.float32)                       # (K_P,)
    left_edge = jnp.maximum((approx - spacing / 2).astype(jnp.int32), 0)
    right_edge = jnp.minimum((approx + spacing / 2).astype(jnp.int32), W)
    offset = jnp.maximum(approx - spacing / 2, 0.0)             # float, host parity

    col_ar = jnp.arange(W_MAX)
    cols = left_edge[:, None] + col_ar[None, :]                 # (K_P, W_MAX)
    cmask = cols < right_edge[:, None]
    cols_safe = jnp.clip(cols, 0, W - 1)

    row_ar = jnp.arange(H_MAX)
    rows = cfg.tops[:, None] + row_ar[None, :]                  # (L, H_MAX)
    rmask = row_ar[None, :] < cfg.heights[:, None]
    rows_safe = jnp.clip(rows, 0, H - 1)

    # gather all windows: (L, K_P, H_MAX, W_MAX). The gather is SEPARABLE
    # (rows depend only on the leaf, cols only on the picket): two staged
    # 1-axis gathers lower to fast row/column moves, where a fused pointwise
    # 4D gather would lower to a ~60M-element scalar gather (~44x slower on
    # TPU, measured).
    row_slab = img[rows_safe]                                   # (L, H_MAX, W)
    win = jnp.swapaxes(row_slab[:, :, cols_safe], 1, 2)         # (L, K_P, H_MAX, W_MAX)
    wmask = rmask[:, None, :, None] & cmask[None, :, None, :]

    # validity (reference _is_mlc_peak_in_window): per-ROW std across window
    # columns; max(std) < edge_thr * median(std); max(win) > h_thr * peak_val
    cnt_c = jnp.maximum(jnp.sum(cmask, axis=1), 1)              # (K_P,)
    win_c = jnp.where(wmask, win, 0.0)
    mean_r = jnp.sum(win_c, axis=3) / cnt_c[None, :, None]      # (L, K_P, H_MAX)
    var_r = jnp.sum(jnp.where(wmask, (win - mean_r[..., None]) ** 2, 0.0),
                    axis=3) / cnt_c[None, :, None]
    std_r = jnp.sqrt(var_r)
    max_std = jnp.max(jnp.where(rmask[:, None, :], std_r, -jnp.inf), axis=2)
    med_std = _masked_median(std_r, jnp.broadcast_to(rmask[:, None, :], std_r.shape))
    win_max = jnp.max(jnp.where(wmask, win, -jnp.inf), axis=(2, 3))
    in_window = ((win_max > params.height_threshold * picket_vals[None, :])
                 & (max_std < params.edge_threshold * med_std))
    kiss_valid = in_window & picket_valid[None, :]

    # ---- kiss profiles: masked median over rows, ground, normalize ---------
    prof = _masked_median(
        jnp.swapaxes(win, 2, 3),                                 # (L,K_P,W_MAX,H_MAX)
        jnp.broadcast_to(rmask[:, None, None, :], (L, K_P, W_MAX, H_MAX)))
    pmin = jnp.min(jnp.where(cmask[None], prof, jnp.inf), axis=2, keepdims=True)
    prof = jnp.where(cmask[None], prof - pmin, 0.0)
    pmax = jnp.max(prof, axis=2, keepdims=True)
    prof = jnp.where(pmax > 0, prof / jnp.maximum(pmax, 1e-20), prof)

    # ---- FWXM of the most prominent peak per kiss ---------------------------
    # the most prominent peak is the global-max plateau: computed directly,
    # immune to fixed-K slot overflow on noisy profiles
    def kiss_peak(v):
        pk = main_peak(v)
        return main_peak_ips(v, pk, 1 - params.fwxm / 100.0)

    l_ips, r_ips = jax.vmap(kiss_peak)(prof.reshape(L * K_P, W_MAX))
    l_ips = l_ips.reshape(L, K_P)
    r_ips = r_ips.reshape(L, K_P)
    width_px = r_ips - l_ips

    if separate_leaves:
        pos = jnp.stack([l_ips, r_ips], axis=-1) + offset[None, :, None]
    else:
        pos = ((l_ips + r_ips) / 2 + offset[None, :])[..., None]  # (L,K_P,1)
    n_lines = pos.shape[-1]

    # ---- leaf filtering: keep leaves with the median number of kisses ------
    counts = jnp.sum(kiss_valid, axis=1)
    leaf_has = counts > 0
    med_count = _masked_median(counts.astype(jnp.float32), leaf_has)
    leaf_kept = leaf_has & (counts.astype(jnp.float32) == med_count)
    any_dropped = jnp.any(leaf_has & ~leaf_kept)
    kiss_valid = kiss_valid & leaf_kept[:, None]

    # ---- per-picket line fit (reference Picket.get_fit: x=upper marker row,
    # y=MLC position) ---------------------------------------------------------
    upper = cfg.centers_px - cfg.widths_px / 2 * params.analysis_ratio  # (L,)
    x_pts = jnp.broadcast_to(upper[:, None], (L, n_lines))              # (L,n)
    w_kiss = kiss_valid.astype(jnp.float32)                             # (L,K_P)

    def fit_picket(p):
        return _fit_line(x_pts.ravel(), pos[:, p, :].ravel(),
                         jnp.broadcast_to(w_kiss[:, p, None], (L, n_lines)).ravel())

    fits = jax.vmap(fit_picket)(jnp.arange(K_P))                        # (K_P,2)

    # ---- errors: (pos - fit(marker-line center row)) / dpmm ----------------
    center_row = cfg.centers_px                                          # (L,)
    picket_at = fits[None, :, 0] * center_row[:, None] + fits[None, :, 1]
    if separate_leaves:
        signs = jnp.asarray([-1.0, 1.0])
        picket_at = picket_at[..., None] + signs * params.nominal_gap_px
    else:
        picket_at = picket_at[..., None]
    errors_mm = (pos - picket_at) / params.dpmm                          # (L,K_P,n)

    # ---- picket summary: skew + distance to CAX ----------------------------
    mid_idx = int(round(H / 2))
    dist2cax_mm = (params.cax_col - (fits[:, 0] * mid_idx + fits[:, 1])) / params.dpmm

    return {
        "n_pickets": n_pickets,
        "picket_valid": picket_valid,
        "fwxm_idx": fwxm_idx,
        "spacing": spacing,
        "kiss_valid": kiss_valid,
        "leaf_kept": leaf_kept,
        "any_dropped": any_dropped,
        "width_px": width_px,
        "positions_px": pos,
        "errors_mm": errors_mm,
        "fits": fits,
        "dist2cax_mm": dist2cax_mm,
    }


_PF_STATICS = ("K_P", "W_MAX", "H_MAX", "KISS_K", "num_pickets",
               "peak_sort", "separate_leaves", "chunk", "preprocess",
               "extra_filter")


@functools.partial(jax.jit, static_argnames=_PF_STATICS)
def picket_fence_batch(
    images: jnp.ndarray,
    cfg: PFLeafConfig,
    params: PFParams,
    *,
    K_P: int = 16,
    W_MAX: int = 256,
    H_MAX: int = 64,
    KISS_K: int = 8,
    num_pickets: int | None = None,
    peak_sort: str = "peak_heights",
    separate_leaves: bool = False,
    chunk: int = 32,
    preprocess: bool = False,
    extra_filter: int = 0,
) -> dict:
    """Analyze a (B, H, W) batch in ONE device dispatch.

    Images are processed in vmapped chunks of ``chunk`` under ``lax.map`` to
    bound the (L·K_P·H_MAX·W_MAX) window workspace in HBM while keeping the
    device busy.
    """
    B = images.shape[0]
    single = functools.partial(
        picket_fence_image, cfg=cfg, params=params, K_P=K_P, W_MAX=W_MAX,
        H_MAX=H_MAX, KISS_K=KISS_K, num_pickets=num_pickets,
        peak_sort=peak_sort, separate_leaves=separate_leaves,
        preprocess=preprocess, extra_filter=extra_filter)
    pad = (-B) % chunk
    if pad:
        images = jnp.concatenate([images, images[:pad]], axis=0)
    chunked = images.reshape(-1, chunk, *images.shape[1:])
    out = jax.lax.map(jax.vmap(single), chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[2:])[:B], out)


@functools.partial(jax.jit, static_argnames=_PF_STATICS)
def picket_fence_batch_packed(images, cfg, params, **static) -> jnp.ndarray:
    """Same as :func:`picket_fence_batch` but returns ONE packed f32 vector
    so remote hosts pay a single device→host fetch
    (``ops.pack.unpack_tree`` restores the dict)."""
    from .pack import pack_tree

    return pack_tree(picket_fence_batch.__wrapped__(images, cfg, params, **static))
