"""Fully-jitted starshot pipeline: whole-image-batch wobble analysis.

The reference analyzes one starshot at a time with a host retry ladder of
scipy calls (``/root/reference/pylinac/starshot.py:230,306``): polar
profile -> spoke peaks -> line pairing -> Nelder-Mead wobble, retried over
a (radius, peak-height) grid until sane. Here the ENTIRE analysis is one
jitted XLA computation per batch: the retry ladder becomes a
``lax.while_loop`` over the same combo sequence (almost always one
iteration), and every stage — inversion check, FW80M start point, 20-ring
collapsed polar sampling, rolled+filtered profile, fixed-K FWXM spokes,
opposite-peak pairing, and the jitted Nelder-Mead minimax — runs on
device. A batch of starshots is a single dispatch.

Parity note: the single-image path sizes its angular grid from the
detected radius (``pi*2*R*3`` samples); fixed shapes require a static
count here, so the batch uses ``n_ang`` samples (host-sized from the
first image, same order of density). Spoke angles quantize to the sample
grid exactly as the reference does (nearest-sample mapping,
``core/profile.py:1123``), so wobble results agree to the sample spacing
(<0.1 px at default density); ground-truth accuracy is pinned in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_filter1d
from .optimize import nelder_mead
from .peaks import peak_analysis

K_PK = 32      # spoke-peak slots (>= 2x max expected spokes)


class StarParams(NamedTuple):
    """Traced per-batch analysis parameters."""

    radius: jnp.ndarray              # initial radius fraction (0.85)
    min_peak_height: jnp.ndarray     # initial relative height (0.25)
    max_wobble_mm: jnp.ndarray       # sanity diameter (2.0)
    dpmm: jnp.ndarray
    invert: jnp.ndarray = np.False_  # explicit user inversion


def _combo_table(radius: float, min_peak_height: float) -> np.ndarray:
    """The reference's retry sequence: the initial pair, then the full
    (radius x height) product grid (starshot.py:334-337)."""
    heights = np.append(min_peak_height, np.linspace(0.05, 0.95, 10))
    radii = np.append(radius, np.linspace(0.95, 0.1, 10))
    grid = [(radius, min_peak_height)]
    for r in radii:
        for h in heights:
            grid.append((r, h))
    return np.asarray(grid, np.float32)


def starshot_image(
    img: jnp.ndarray,
    params: StarParams,
    combos: jnp.ndarray,
    *,
    n_ang: int,
    n_rings: int = 20,
    recursive: bool = True,
    fwhm: bool = True,
    nm_iters: int = 400,
) -> dict:
    """Analyze ONE starshot image; pure jax, jit/vmap-friendly."""
    H, W = img.shape
    img = img.astype(jnp.float32)

    # ---- inversion check by histogram + ground (starshot.py:214) ----------
    p = jnp.percentile(img, jnp.asarray([4.0, 50.0, 96.0]))
    do_inv = (jnp.abs(p[1] - p[0]) > jnp.abs(p[1] - p[2])) ^ jnp.asarray(
        params.invert, bool)
    vmin, vmax = jnp.min(img), jnp.max(img)
    img = jnp.where(do_inv, -img + vmax + vmin, img)
    img = img - jnp.min(img)

    # ---- FW80M start point of central-third max-profiles (:197) ------------
    t3, l3 = H // 3, W // 3
    central = img[t3:2 * t3, l3:2 * l3]
    from .peaks import main_peak, main_peak_ips

    def fw80m_center(v):
        pk = main_peak(v)
        l_ip, r_ip = main_peak_ips(v, pk, 1 - 0.8)
        return jnp.round((l_ip + r_ip) / 2)

    fx = fw80m_center(jnp.max(central, axis=0)) + l3
    fy = fw80m_center(jnp.max(central, axis=1)) + t3
    local_max = jnp.percentile(central, 90.0)
    dist_edge = jnp.minimum(jnp.minimum(H - fy, W - fx), jnp.minimum(fy, fx))

    # ---- one (radius, height) combo evaluation ----------------------------
    interval = 2 * np.pi / n_ang
    base_rads = (interval * (n_ang - 1 - jnp.arange(n_ang))).astype(jnp.float32)
    sigma = max(int(round(n_ang * 0.003)), 1)
    sep = 0.02 * n_ang

    def eval_combo(r_frac, h_frac):
        radius_px = dist_edge * r_frac
        height_abs = h_frac * local_max
        # 20-ring nearest-neighbor collapsed polar profile (profile.py:1174)
        ring_radii = jnp.linspace(radius_px * 0.9, radius_px * 1.1, n_rings)
        cos, sin = jnp.cos(base_rads), jnp.sin(base_rads)
        xx = jnp.round(cos[None, :] * ring_radii[:, None] + fx).astype(jnp.int32)
        yy = jnp.round(sin[None, :] * ring_radii[:, None] + fy).astype(jnp.int32)
        xx = jnp.clip(xx, 0, W - 1)
        yy = jnp.clip(yy, 0, H - 1)
        prof = jnp.mean(img[yy, xx], axis=0)
        # roll to the deepest valley so no spoke spans the wrap (:800)
        shift = jnp.argmin(prof)
        prof = jnp.roll(prof, -shift)
        rads = jnp.roll(base_rads, -shift)
        prof = gaussian_filter1d(prof, float(sigma))
        prof = prof - jnp.min(prof)
        # FWXM spoke peaks (fixed-K scipy-semantics kernel)
        res = peak_analysis(prof, K=K_PK, rel_height=0.5, height=height_abs,
                            distance=sep)
        if fwhm:
            centers = res.left_ips + (res.right_ips - res.left_ips) / 2
        else:
            centers = res.positions.astype(jnp.float32)
        valid = res.valid
        n_pk = jnp.sum(valid)
        ok_count = (n_pk >= 6) & (n_pk % 2 == 0)
        # compact valid peaks to the front, order preserved
        order = jnp.argsort(jnp.where(valid, jnp.arange(K_PK),
                                      K_PK + jnp.arange(K_PK)))
        centers = centers[order]
        valid_sorted = valid[order]
        # nearest-sample spoke endpoints (profile.py:1123 int truncation)
        idx = jnp.clip(centers.astype(jnp.int32), 0, n_ang - 1)
        px = jnp.cos(rads[idx]) * radius_px + fx
        py = jnp.sin(rads[idx]) * radius_px + fy
        # pair peak i with i + n/2 into lines
        half = n_pk // 2
        j = jnp.arange(K_PK // 2)
        mate = jnp.clip(j + half, 0, K_PK - 1)
        line_valid = valid_sorted[j] & (j < half)
        p1 = jnp.stack([px[j], py[j]], axis=1)
        p2 = jnp.stack([px[mate], py[mate]], axis=1)
        d = p2 - p1
        norm = jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        d = d / norm
        # all lines must pass near the focus point (:82)
        wf = jnp.stack([fx, fy]) - p1
        focus_dist = jnp.abs(wf[:, 0] * d[:, 1] - wf[:, 1] * d[:, 0])
        ok_focus = jnp.all(jnp.where(line_valid, focus_dist, 0.0)
                           <= 10 * params.dpmm)

        def max_distance(pt):
            w2 = pt[None, :] - p1
            cross = jnp.abs(w2[:, 0] * d[:, 1] - w2[:, 1] * d[:, 0])
            return jnp.max(jnp.where(line_valid, cross, 0.0))

        x0 = jnp.stack([fx, fy]).astype(jnp.float32)
        xw, fw = nelder_mead(max_distance, x0, fatol=0.001, xatol=1e-4,
                             max_iter=nm_iters)
        diam_mm = 2 * fw / params.dpmm
        near = jnp.sqrt((xw[0] - fx) ** 2 + (xw[1] - fy) ** 2) < 10 * params.dpmm
        if recursive:
            ok = ok_count & ok_focus & (diam_mm < params.max_wobble_mm) & near
        else:
            ok = ok_count & ok_focus
        return ok, {
            "wobble_center": xw, "wobble_radius_px": fw, "n_lines": half,
            "line_p1": p1, "line_p2": jnp.stack([px[mate], py[mate]], axis=1),
            "line_valid": line_valid, "n_peaks": n_pk,
        }

    n_combos = combos.shape[0] if recursive else 1

    def cond(state):
        i, found, _ = state
        return (~found) & (i < n_combos)

    def body(state):
        i, _, out = state
        ok, new = eval_combo(combos[i, 0], combos[i, 1])
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, b, a), out, new)
        return i + 1, ok, merged

    init_out = {
        "wobble_center": jnp.zeros(2, jnp.float32),
        "wobble_radius_px": jnp.float32(jnp.inf),
        "n_lines": jnp.int32(0),
        "line_p1": jnp.zeros((K_PK // 2, 2), jnp.float32),
        "line_p2": jnp.zeros((K_PK // 2, 2), jnp.float32),
        "line_valid": jnp.zeros(K_PK // 2, bool),
        "n_peaks": jnp.int32(0),
    }
    n_used, found, out = jax.lax.while_loop(cond, body,
                                            (jnp.int32(0), jnp.bool_(False),
                                             init_out))
    out["found"] = found
    out["combos_tried"] = n_used
    out["start_point"] = jnp.stack([fx, fy])
    return out


_STAR_STATICS = ("n_ang", "n_rings", "recursive", "fwhm", "nm_iters", "chunk")


@functools.partial(jax.jit, static_argnames=_STAR_STATICS)
def starshot_batch(images: jnp.ndarray, params: StarParams,
                   combos: jnp.ndarray, *, n_ang: int, n_rings: int = 20,
                   recursive: bool = True, fwhm: bool = True,
                   nm_iters: int = 400, chunk: int = 8) -> dict:
    """Analyze a (B, H, W) starshot batch in ONE device dispatch."""
    B = images.shape[0]
    single = functools.partial(starshot_image, params=params, combos=combos,
                               n_ang=n_ang, n_rings=n_rings,
                               recursive=recursive, fwhm=fwhm,
                               nm_iters=nm_iters)
    pad = (-B) % chunk
    if pad:
        images = jnp.concatenate([images, images[:pad]], axis=0)
    chunked = images.reshape(-1, chunk, *images.shape[1:])
    out = jax.lax.map(jax.vmap(lambda im: single(im)), chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[2:])[:B], out)


@functools.partial(jax.jit, static_argnames=_STAR_STATICS)
def starshot_batch_packed(images, params, combos, **static) -> jnp.ndarray:
    """Packed single-fetch variant (see ``ops.pack``)."""
    from .pack import pack_tree

    return pack_tree(starshot_batch.__wrapped__(images, params, combos,
                                                **static))
