"""Connected-component labeling + fixed-K region properties in pure JAX.

Replaces skimage.measure.label/regionprops + scipy binary_fill_holes used by
the reference's feature finding (``metrics/utils.py:127-133``, ``ct.py:384``,
``winston_lutz.py:764-788``).  TPU-native design notes:

* **Labeling** is iterative min-propagation over the pixel neighborhood plus
  pointer-jumping (label = label[label]) inside a ``lax.while_loop`` with a
  convergence check — O(log) passes for realistic shapes, fixed upper bound.
* **Region properties** come out as fixed-size (K,) arrays (area, bbox,
  centroids, perimeter, moments, ...) with a validity mask, computed via
  ``segment_sum`` over compacted label ids — fully jit/vmap-compatible.
* **Hole filling** reuses the same labeling on the background: background
  components that do not touch the image border are holes.
* **Solidity** uses a D-direction support-function estimate of the convex
  hull area (circumscribed polygon; error O(1/D²)) — exact convex hulls are
  data-dependent and hostile to fixed shapes, and the reference only
  thresholds solidity at 0.9 (``metrics/features.py:48``).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _neighbor_shifts(connectivity: int) -> list[tuple[int, int]]:
    cross = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    diag = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    return cross if connectivity == 1 else cross + diag


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a 2D array, filling vacated cells with `fill`."""
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iter"))
def label(mask: jnp.ndarray, connectivity: int = 1, max_iter: int = 512) -> jnp.ndarray:
    """Label connected components of a boolean mask.

    Returns an int32 image where background = -1 and each component carries
    the linear index of its root pixel (NOT sequential ids — use
    :func:`regionprops` to compact them).  ``connectivity`` 1 = 4-conn
    (skimage label connectivity=1), 2 = 8-conn.

    On TPU, images that fit the VMEM budget dispatch to the Pallas kernel
    (:mod:`.pallas_label`) — the whole iterate-until-converged sweep runs
    on-chip with HBM touched only at entry/exit (~80x the XLA formulation,
    which round-trips HBM every pass). Identical output, exact. The branch
    is chosen at LOWERING time (``jax.lax.platform_dependent``), so the
    same traced computation runs the XLA form on the in-process CPU
    backend that small host-routed arrays use.
    """
    h, w = mask.shape
    from .pallas_label import _label_kernel_call, label_pallas_supported

    if label_pallas_supported((h, w)):
        return jax.lax.platform_dependent(
            mask,
            tpu=lambda m: _label_kernel_call(m, connectivity),
            default=lambda m: _label_xla(m, connectivity, max_iter),
        )
    return _label_xla(mask, connectivity, max_iter)


def _label_xla(mask: jnp.ndarray, connectivity: int = 1,
               max_iter: int = 512) -> jnp.ndarray:
    """The XLA scan/jump label formulation (see :func:`label`)."""
    h, w = mask.shape
    n = h * w
    sentinel = jnp.int32(n)
    lin = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(mask, lin, sentinel)
    shifts = _neighbor_shifts(connectivity)

    is_bg = ~mask
    # backend-adaptive schedule (trace-time, so each backend compiles its
    # own variant; both converge to the same component-minimum labels):
    # TPU — segmented scans sweep straight runs cheaply on the VPU while
    # pointer-jump gathers serialize on the scalar unit, so scan every
    # iteration and jump rarely. CPU — gathers are cheap and the 36-pass
    # scans are not, so jump every iteration and skip scans.
    on_tpu = jax.default_backend() == "tpu"
    use_scans = on_tpu
    jump_mod = 1

    def seg_min_scan(vals, axis: int, reverse: bool):
        # segmented min-scan: propagate the running min along the axis,
        # resetting at background cells. Associative, so it runs in
        # O(log n) VPU passes via associative_scan — no gathers.
        def op(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, jnp.minimum(av, bv))

        _f, v = jax.lax.associative_scan(op, (is_bg, vals), axis=axis,
                                         reverse=reverse)
        return v

    def propagate(lab, do_jump):
        # one neighbor pass (handles diagonals/turns) ...
        best = lab
        for dy, dx in shifts:
            best = jnp.minimum(best, _shift2d(lab, dy, dx, sentinel))
        best = jnp.where(mask, best, sentinel)
        # ... then sweep the min across entire straight runs in all four
        # directions: a component's label crosses any monotone stretch in
        # ONE iteration, so convergence scales with the number of "turns"
        # in the component, not its geodesic diameter. Thin-edge masks
        # (Scharr rings) converge in dozens of sweeps instead of ~1000.
        if use_scans:
            for axis in (0, 1):
                for reverse in (False, True):
                    best = jnp.minimum(best, seg_min_scan(best, axis, reverse))
            best = jnp.where(mask, best, sentinel)

        def jump(b):
            # occasional pointer jumping guarantees ~log convergence for
            # pathological curvy components (spiral wire-ramp edges). Kept
            # rare because gathers run on the TPU scalar unit.
            flat = jnp.append(b.ravel(), sentinel)  # sentinel maps to itself
            flat = flat[flat]
            flat = flat[flat]
            return flat[:-1].reshape(h, w)

        return jax.lax.cond(do_jump, jump, lambda b: b, best)

    def cond(state):
        i, lab, changed = state
        return changed & (i < max_iter)

    def body(state):
        i, lab, _ = state
        new = propagate(lab, (i % jump_mod) == (jump_mod - 1))
        return i + 1, new, jnp.any(new != lab)

    _, lab, _ = jax.lax.while_loop(cond, body, (0, lab, jnp.bool_(True)))
    return jnp.where(mask, lab, -1)


class Regions(NamedTuple):
    """Fixed-size (K,) region properties; slots with ``valid=False`` are empty.

    Coordinate convention matches skimage: centroid = (row, col)."""

    valid: jnp.ndarray            # (K,) bool
    area: jnp.ndarray             # (K,) float32 — pixel count (unfilled)
    area_filled: jnp.ndarray      # (K,) float32 — holes filled
    centroid_r: jnp.ndarray       # (K,) float32
    centroid_c: jnp.ndarray
    weighted_centroid_r: jnp.ndarray
    weighted_centroid_c: jnp.ndarray
    bbox_rmin: jnp.ndarray        # (K,) int32 — skimage half-open convention
    bbox_cmin: jnp.ndarray
    bbox_rmax: jnp.ndarray
    bbox_cmax: jnp.ndarray
    perimeter: jnp.ndarray        # (K,) float32 — skimage Freeman-weighted
    touches_border: jnp.ndarray   # (K,) bool
    convex_area: jnp.ndarray      # (K,) float32 — D-direction hull estimate
    major_axis_length: jnp.ndarray
    minor_axis_length: jnp.ndarray
    eccentricity: jnp.ndarray
    orientation: jnp.ndarray      # (K,) float32 — skimage convention (rad)
    mean_intensity: jnp.ndarray
    max_intensity: jnp.ndarray
    min_intensity: jnp.ndarray
    label_id: jnp.ndarray         # (K,) int32 root-pixel label

    @property
    def solidity(self) -> jnp.ndarray:
        return self.area_filled / jnp.maximum(self.convex_area, 1.0)

    @property
    def bbox_area(self) -> jnp.ndarray:
        return ((self.bbox_rmax - self.bbox_rmin) *
                (self.bbox_cmax - self.bbox_cmin)).astype(jnp.float32)


_PERIM_WEIGHTS = np.zeros(50, dtype=np.float32)
_PERIM_WEIGHTS[[5, 7, 15, 17, 25, 27]] = 1.0
_PERIM_WEIGHTS[[21, 33]] = math.sqrt(2.0)
_PERIM_WEIGHTS[[13, 23]] = (1.0 + math.sqrt(2.0)) / 2.0


def _perimeter_image(lab: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel Freeman perimeter contribution (skimage.measure.perimeter,
    neighborhood=4), computed per-label so adjacent regions don't interact."""
    mask = lab >= 0
    same = []
    for dy, dx in _neighbor_shifts(2):
        neigh = _shift2d(lab, dy, dx, -2)
        same.append((neigh == lab) & mask)
    # border pixel: not all 4-cross neighbors belong to the same label
    cross_all = same[0] & same[1] & same[2] & same[3]
    border = mask & ~cross_all
    # convolution value: center*1 + cross borders*2 + diag borders*10,
    # counting only same-label border neighbors
    val = border.astype(jnp.int32)
    for i, (dy, dx) in enumerate(_neighbor_shifts(2)):
        # neighbor q = p - (dy,dx); same[i][p] tests lab[p] == lab[q];
        # contribution requires q to be a border pixel of the same label
        nb_border = _shift2d(border, dy, dx, False) & same[i]
        w_ = 2 if i < 4 else 10
        val = val + w_ * nb_border.astype(jnp.int32)
    weights = jnp.asarray(_PERIM_WEIGHTS)
    return jnp.where(border, weights[jnp.clip(val, 0, 49)], 0.0)


def fill_holes(mask: jnp.ndarray, max_iter: int = 512) -> jnp.ndarray:
    """scipy.ndimage.binary_fill_holes equivalent: background components not
    touching the border are holes."""
    h, w = mask.shape
    from .pallas_label import flood_from_border, label_pallas_supported

    if label_pallas_supported((h, w)):
        return jax.lax.platform_dependent(
            mask,
            tpu=lambda m: m | (flood_from_border(m) == 0),
            default=lambda m: _fill_holes_xla(m, max_iter),
        )
    return _fill_holes_xla(mask, max_iter)


def _fill_holes_xla(mask: jnp.ndarray, max_iter: int = 512) -> jnp.ndarray:
    h, w = mask.shape
    bg_lab = label(~mask, connectivity=1, max_iter=max_iter)
    r = jnp.arange(h)[:, None]
    c = jnp.arange(w)[None, :]
    on_border = (r == 0) | (r == h - 1) | (c == 0) | (c == w - 1)
    # collect labels of border-touching background components
    border_labels = jnp.where(on_border & (bg_lab >= 0), bg_lab, -1)
    # a bg pixel is "outside" iff its component label appears on the border;
    # since component label = root linear index, test via scatter into a flag map
    flags = jnp.zeros(h * w + 1, dtype=bool)
    flags = flags.at[jnp.where(border_labels >= 0, border_labels, h * w)].set(True)
    outside = (bg_lab >= 0) & flags[jnp.clip(bg_lab, 0, h * w)]
    return mask | (~mask & ~outside)


@functools.partial(jax.jit,
                   static_argnames=("K", "connectivity", "max_iter", "fill",
                                    "hull", "minmax", "moments"))
def regionprops(
    mask: jnp.ndarray,
    intensity: jnp.ndarray | None = None,
    K: int = 32,
    connectivity: int = 1,
    max_iter: int = 512,
    fill: bool = True,
    hull: bool = True,
    minmax: bool = True,
    moments: bool = True,
) -> Regions:
    """Label a mask and compute fixed-K region properties in one pass.

    Labels the RAW mask (like skimage); ``area_filled`` adds each region's
    enclosed holes — holes are background components not touching the image
    border, assigned to their enclosing region via neighbor labels.  This
    keeps separate regions inside another region's hole separate (e.g. a BB
    inside the out-of-field ring of a WL image window).

    ``minmax=False`` skips the bbox and min/max-intensity reductions (each
    is a full (H*W, K) masked reduce — the HBM-dominant cost on TPU);
    callers that only read areas/centroids/moments (e.g. the batched CT
    localization) should disable it. Skipped fields return zeros.
    """
    h, w = mask.shape
    mask = mask.astype(bool)
    lab = label(mask, connectivity=connectivity, max_iter=max_iter)
    is_hole, bg_lab = _holes_single(mask, max_iter)
    return _props_from_label(mask, lab, intensity, is_hole, bg_lab, K=K,
                             hull=hull, minmax=minmax, moments=moments)


def _holes_xla(mask: jnp.ndarray, max_iter: int = 512) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hole mask + background labels, pure-XLA form (any backend)."""
    h, w = mask.shape
    bgl = label(~mask, connectivity=1, max_iter=max_iter)
    rr_i = jnp.arange(h)[:, None]
    cc_i = jnp.arange(w)[None, :]
    on_border_2d = ((rr_i == 0) | (rr_i == h - 1)
                    | (cc_i == 0) | (cc_i == w - 1))
    border_flags = jnp.zeros(h * w + 1, dtype=bool)
    border_bg = jnp.where(on_border_2d & (bgl >= 0), bgl, h * w)
    border_flags = border_flags.at[border_bg.ravel()].set(True)
    holes = (bgl >= 0) & ~border_flags[jnp.clip(bgl, 0, h * w)]
    return holes, bgl


def _holes_single(mask: jnp.ndarray, max_iter: int = 512) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-image hole info with the lowering-time pallas/XLA branch."""
    def _holes_pallas(m):
        # ONE pallas min-propagation yields both the reachability AND the
        # hole roots (the XLA form needs a background label pass plus a
        # scatter that serializes on the TPU scalar unit); the branch is
        # picked at lowering time so the CPU backend keeps the XLA form
        from .pallas_label import hole_roots

        out = hole_roots(m)
        return out >= 0, out

    from .pallas_label import label_pallas_supported

    if label_pallas_supported(mask.shape):
        return jax.lax.platform_dependent(
            mask, tpu=_holes_pallas,
            default=lambda m: _holes_xla(m, max_iter))
    return _holes_xla(mask, max_iter)


def _props_from_label(
    mask: jnp.ndarray,
    lab: jnp.ndarray,
    intensity: jnp.ndarray | None,
    is_hole: jnp.ndarray,
    bg_lab: jnp.ndarray,
    K: int = 32,
    hull: bool = True,
    minmax: bool = True,
    moments: bool = True,
) -> Regions:
    """Fixed-K region properties from a labeled mask (see :func:`regionprops`).

    ``moments=False`` drops the three second-moment feature columns (each
    is an (H*W,) f32 materialization feeding the segment matmul) and
    zero-fills axis lengths/eccentricity/orientation — for callers that
    only consume areas/centroids/perimeter/solidity (the WL BB scan)."""
    h, w = mask.shape
    flat_lab = lab.ravel()
    n_px = h * w
    # Sort-free label compaction. jnp.unique's full sort serialized ~7 ms
    # per image on TPU (the dominant cost of a batched regionprops).
    # Component labels are min linear indices, so exactly the root pixels
    # satisfy lab[idx] == idx — top_k over the root indices yields the K+1
    # smallest distinct labels directly, ascending, sentinel n_px like
    # unique(size=K+1, fill_value=n_px) produced.
    aranged = jnp.arange(n_px, dtype=flat_lab.dtype)
    roots = jnp.where(mask.ravel() & (flat_lab == aranged), aranged,
                      jnp.int32(n_px))
    ids = -jax.lax.top_k(-roots, K + 1)[0]
    valid = ids < n_px
    label_id = jnp.where(valid, ids, -1).astype(jnp.int32)

    # per-pixel slot match; the (N, K+1) compare matrix doubles as the
    # one-hot for the MXU segment reductions below (bg = -1 never matches)
    eq = flat_lab[:, None] == ids[None, :]
    slot = jnp.where(jnp.any(eq, axis=1), jnp.argmax(eq, axis=1), K + 1)
    num = K + 2

    r = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = jnp.arange(w, dtype=jnp.float32)[None, :]
    rr = jnp.broadcast_to(r, (h, w)).ravel()
    cc = jnp.broadcast_to(c, (h, w)).ravel()
    ones = jnp.ones(h * w, jnp.float32)

    # backend-adaptive segment reductions (trace-time branch): scatters
    # serialize on the TPU scalar unit, so on TPU sums ride the MXU as
    # one-hot matmuls and min/max become masked reductions over the same
    # (N, num) one-hot; on CPU the native segment ops are faster.
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        onehot = eq  # (N, K+1); reductions below slice [:K]
        onehot_f = onehot.astype(jnp.float32)

        def seg_many(features):  # (N, F) -> (num, F) summed per slot
            # HIGHEST precision: the default TPU matmul truncates f32 inputs
            # to bf16, which destroys the large coordinate-moment sums
            # (E[r^2] - E[r]^2 cancellation needs full f32 products)
            return jax.lax.dot_general(
                onehot_f, features, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        def seg(values, _slot=None):  # (N,) -> (num,)
            return seg_many(values[:, None])[:, 0]

        def seg_max(values):
            return jnp.max(jnp.where(onehot, values[:, None], -jnp.inf), axis=0)

        def seg_min(values):
            return jnp.min(jnp.where(onehot, values[:, None], jnp.inf), axis=0)
    else:
        def seg(values, _slot=None):
            return jax.ops.segment_sum(values, slot, num_segments=num)

        def seg_many(features):
            return jax.ops.segment_sum(features, slot, num_segments=num)

        def seg_max(values):
            return jax.ops.segment_max(values, slot, num_segments=num)

        def seg_min(values):
            return jax.ops.segment_min(values, slot, num_segments=num)

    in_mask = mask.ravel().astype(jnp.float32)
    area = seg(ones * in_mask)[:K]

    # --- hole filling per region -----------------------------------------
    # holes = background components not touching the border. The enclosing
    # region of a hole is the region directly ABOVE the hole's topmost-
    # leftmost pixel — and since component labels are root (minimum) linear
    # indices, that pixel's index is the hole's label itself.
    flat_region_lab = lab.ravel()
    import os
    if on_tpu or os.environ.get("PYLINAC_TPU_HOLES") == "matmul":
        # Gather-free hole assignment (the N-element
        # ``flat_region_lab[above_idx]`` gather serializes on the TPU
        # scalar unit — measured ~90 ms per 416-window WL scan batch).
        # Compact the hole components exactly like the regions (top_k over
        # root indices, smallest K kept — region slots truncate at K the
        # same way), then per-hole areas and the enclosing label (the
        # region pixel one row above each hole root) are one-row shifts and
        # small matmuls.
        hole_flat = is_hole.ravel()
        bgl = jnp.clip(bg_lab.ravel(), -1, n_px)
        hole_roots_i = jnp.where(hole_flat & (bgl == aranged), aranged,
                                 jnp.int32(n_px))
        hole_ids = -jax.lax.top_k(-hole_roots_i, K + 1)[0]       # (K+1,)
        hole_oh = ((bgl[:, None] == hole_ids[None, :])
                   & hole_flat[:, None]).astype(jnp.float32)     # (N, K+1)
        # labels fit f32 exactly (n_px < 2^24)
        lab_above = jnp.concatenate([
            jnp.full(w, -2, flat_region_lab.dtype), flat_region_lab[:-w]])
        root_oh = (aranged[:, None] == hole_ids[None, :]).astype(jnp.float32)
        packed2 = jax.lax.dot_general(
            jnp.stack([hole_oh, root_oh], axis=-1).reshape(n_px, -1),
            jnp.stack([jnp.ones(n_px, jnp.float32),
                       lab_above.astype(jnp.float32)], axis=-1),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).reshape(K + 1, 2, 2)
        hole_area_k2 = packed2[:, 0, 0]                  # per-hole pixel count
        enc_label = packed2[:, 1, 1]                     # enclosing label
        enc_eq = (enc_label[:, None]
                  == ids[None, :K].astype(jnp.float32))  # (K+1, K)
        hole_areas = jnp.sum(hole_area_k2[:, None] * enc_eq, axis=0)
    else:
        hole_root = jnp.clip(bg_lab.ravel(), 0, h * w - 1)
        above_idx = jnp.clip(hole_root - w, 0, h * w - 1)
        hole_region = jnp.where(is_hole.ravel(), flat_region_lab[above_idx], -1)
        # map each hole pixel to the enclosing region's compact slot
        hole_eq = hole_region[:, None] == ids[None, :]  # (N, K+1); -1 no match
        hole_ok = jnp.any(hole_eq, axis=1)
        hole_slot = jnp.where(hole_ok, jnp.argmax(hole_eq, axis=1), K + 1)
        hole_areas = jax.ops.segment_sum(
            hole_ok.astype(jnp.float32), hole_slot, num_segments=num)[:K]
    area_filled = area + hole_areas

    if intensity is None:
        intensity = mask.astype(jnp.float32)
    ii = intensity.ravel().astype(jnp.float32) * in_mask
    on_border = ((rr == 0) | (rr == h - 1) | (cc == 0) | (cc == w - 1)).astype(jnp.float32)
    perim_img = _perimeter_image(lab).ravel()

    # all segment SUMS in one MXU matmul: (N, num)^T @ (N, F)
    cols = [
        rr * in_mask, cc * in_mask,                 # centroid sums
        ii, rr * ii, cc * ii,                       # intensity sums
        on_border * in_mask, perim_img,             # border / perimeter
    ]
    if moments:
        cols += [rr * rr * in_mask, cc * cc * in_mask, rr * cc * in_mask]
    features = jnp.stack(cols, axis=-1)
    sums = seg_many(features)[:K]
    sum_r, sum_c = sums[:, 0], sums[:, 1]
    sum_i = sums[:, 2]
    centroid_r = sum_r / jnp.maximum(area, 1)
    centroid_c = sum_c / jnp.maximum(area, 1)
    wc_r = sums[:, 3] / jnp.maximum(sum_i, 1e-20)
    wc_c = sums[:, 4] / jnp.maximum(sum_i, 1e-20)
    mean_i = sum_i / jnp.maximum(area, 1)
    touches = sums[:, 5] > 0
    perimeter = sums[:, 6]
    filled_f = in_mask
    if minmax:
        max_i = seg_max(jnp.where(in_mask > 0, intensity.ravel(), -jnp.inf))[:K]
        min_i = seg_min(jnp.where(in_mask > 0, intensity.ravel(), jnp.inf))[:K]

        # bbox on the region pixels (holes are interior: same as filled bbox)
        big = jnp.float32(h * w)
        rmin = seg_min(jnp.where(filled_f > 0, rr, big))[:K]
        cmin = seg_min(jnp.where(filled_f > 0, cc, big))[:K]
        rmax = seg_max(jnp.where(filled_f > 0, rr, -1.0))[:K]
        cmax = seg_max(jnp.where(filled_f > 0, cc, -1.0))[:K]
    else:
        zeros = jnp.zeros(K, jnp.float32)
        max_i = min_i = zeros
        rmin = cmin = zeros
        rmax = cmax = zeros - 1.0

    if moments:
        # central moments (unfilled pixels, like skimage inertia) for axes/ecc
        mu20 = sums[:, 7] / jnp.maximum(area, 1) - centroid_r**2
        mu02 = sums[:, 8] / jnp.maximum(area, 1) - centroid_c**2
        mu11 = sums[:, 9] / jnp.maximum(area, 1) - centroid_r * centroid_c
        common = jnp.sqrt(jnp.maximum((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
        l1 = (mu20 + mu02 + common) / 2
        l2 = (mu20 + mu02 - common) / 2
        major = 4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
        minor = 4.0 * jnp.sqrt(jnp.maximum(l2, 0.0))
        ecc = jnp.sqrt(jnp.maximum(1.0 - l2 / jnp.maximum(l1, 1e-20), 0.0))
        # skimage: angle of major axis vs row axis in (-pi/2, pi/2], from
        # the inertia tensor [[mu20, -mu11], [-mu11, mu02]]
        orientation = 0.5 * jnp.arctan2(2 * mu11, mu02 - mu20)
    else:
        major = minor = ecc = orientation = jnp.zeros(K, jnp.float32)

    # convex hull pixel count via D-direction support functions: a pixel
    # center is inside the hull iff its projection is ≤ the region's support
    # in every direction.  D=32 circumscribes the true hull with O(1/D²)
    # excess — well below the 0.9 solidity threshold's sensitivity.
    if hull:
        D = 32
        thetas = np.arange(D) * (2 * np.pi / D)
        nx = jnp.asarray(np.cos(thetas), jnp.float32)
        ny = jnp.asarray(np.sin(thetas), jnp.float32)
        inside = jnp.ones((h * w, K), dtype=bool)
        eps = 1e-3
        for d in range(D):
            proj = rr * ny[d] + cc * nx[d]  # (N,)
            support = seg_max(jnp.where(filled_f > 0, proj, -jnp.inf))[:K]
            inside &= proj[:, None] <= support[None, :] + eps
        convex_area = jnp.maximum(
            jnp.sum(inside, axis=0).astype(jnp.float32), area_filled)
    else:
        # hull skipped (memory: the test above is O(H*W*K)); solidity -> 1
        convex_area = area_filled

    return Regions(
        valid=valid[:K], area=area, area_filled=area_filled,
        centroid_r=centroid_r, centroid_c=centroid_c,
        weighted_centroid_r=wc_r, weighted_centroid_c=wc_c,
        bbox_rmin=rmin.astype(jnp.int32), bbox_cmin=cmin.astype(jnp.int32),
        bbox_rmax=(rmax + 1).astype(jnp.int32), bbox_cmax=(cmax + 1).astype(jnp.int32),
        perimeter=perimeter, touches_border=touches,
        convex_area=convex_area,
        major_axis_length=major, minor_axis_length=minor, eccentricity=ecc,
        orientation=orientation,
        mean_intensity=mean_i, max_intensity=max_i, min_intensity=min_i,
        label_id=label_id,
    )


def clear_border(regions: Regions) -> Regions:
    """Invalidate regions touching the image border (skimage clear_border)."""
    return regions._replace(valid=regions.valid & ~regions.touches_border)


def label_batch(masks: jnp.ndarray, connectivity: int = 1,
                max_iter: int = 512) -> jnp.ndarray:
    """Batched CCL over (B, h, w) masks — identical per-instance output to
    :func:`label`, but the whole batch sweeps together.

    On TPU, blocks of instances run in ONE VMEM-resident pallas program
    (:func:`pylinac_tpu.ops.pallas_label.label_batched_pallas`); vmapping the
    single-image kernel instead serializes one grid step per instance
    (~15 ms each — minutes for a 400-window threshold scan)."""
    import os

    from .pallas_label import (_label_kernel_call, label_batched_pallas,
                               label_batched_supported, label_pallas_supported)

    xla = jax.vmap(lambda m: _label_xla(m.astype(bool), connectivity, max_iter))
    shape = masks.shape[1:]
    if os.environ.get("PYLINAC_TPU_CCL") == "xla":
        return xla(masks)  # perf A/B knob: force the fused XLA fixpoint
    if label_batched_supported(shape):
        return jax.lax.platform_dependent(
            masks,
            tpu=lambda m: label_batched_pallas(m.astype(bool), connectivity),
            default=xla)
    if label_pallas_supported(shape):
        # instance too large to block-batch: serial map over the
        # single-image VMEM kernel still beats vmapped XLA label on TPU
        # by ~80x per instance
        return jax.lax.platform_dependent(
            masks,
            tpu=lambda m: jax.lax.map(
                lambda x: _label_kernel_call(x.astype(bool), connectivity), m),
            default=xla)
    return xla(masks)


def _holes_batch(masks: jnp.ndarray, max_iter: int = 512) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched hole info (is_hole, bg_lab) over (B, h, w) masks."""
    import os

    from .pallas_label import (hole_roots, hole_roots_batched,
                               label_batched_supported, label_pallas_supported)

    xla = jax.vmap(lambda m: _holes_xla(m.astype(bool), max_iter))
    if os.environ.get("PYLINAC_TPU_CCL") == "xla":
        return xla(masks)

    def pallas_form(m):
        out = hole_roots_batched(m.astype(bool))
        return out >= 0, out

    def pallas_mapped(m):
        out = jax.lax.map(lambda x: hole_roots(x.astype(bool)), m)
        return out >= 0, out

    shape = masks.shape[1:]
    if label_batched_supported(shape):
        return jax.lax.platform_dependent(
            masks, tpu=pallas_form, default=xla)
    if label_pallas_supported(shape):
        return jax.lax.platform_dependent(
            masks, tpu=pallas_mapped, default=xla)
    return xla(masks)


def regionprops_batch(
    masks: jnp.ndarray,
    intensity: jnp.ndarray | None = None,
    K: int = 32,
    connectivity: int = 1,
    max_iter: int = 512,
    fill: bool = True,
    hull: bool = True,
    minmax: bool = True,
    moments: bool = True,
    chunk: int = 64,
) -> Regions:
    """Batched :func:`regionprops` over (B, h, w) masks → Regions with
    (B, K) fields.

    Labeling and hole-finding run as batched VMEM-resident sweeps; the
    per-instance property reductions run under ``lax.map`` in chunks of
    ``chunk`` instances (bounding the transient one-hot memory) inside the
    same dispatch."""
    b = masks.shape[0]
    labs = label_batch(masks, connectivity=connectivity, max_iter=max_iter)
    is_hole, bg_lab = _holes_batch(masks, max_iter=max_iter)
    if intensity is None:
        intensity = masks.astype(jnp.float32)

    def one(args):
        m, l, i, ih, bl = args
        return _props_from_label(m.astype(bool), l, i, ih, bl, K=K,
                                 hull=hull, minmax=minmax, moments=moments)

    return jax.lax.map(one, (masks, labs, intensity, is_hole, bg_lab),
                       batch_size=min(chunk, b))


@functools.partial(jax.jit,
                   static_argnames=("K", "min_area", "connectivity", "max_iter"))
def keep_largest(mask: jnp.ndarray, K: int = 64, min_area: int = 1,
                 connectivity: int = 1, max_iter: int = 64) -> jnp.ndarray:
    """Keep only the K largest connected components (by pixel count).

    Bounds the slot count for a following :func:`regionprops` call on masks
    with unbounded clutter (e.g. low-threshold canny edges, where noise
    ridges create thousands of tiny components). One labelling pass + a
    bincount — far cheaper than escalating regionprops K.
    """
    h, w = mask.shape
    mask = mask.astype(bool)
    lab = label(mask, connectivity=connectivity, max_iter=max_iter)
    flat = lab.ravel()
    idx = jnp.where(flat >= 0, flat, h * w)
    counts = jnp.zeros(h * w + 1, jnp.float32).at[idx].add(1.0)
    counts = counts.at[h * w].set(0.0)
    # the K-th largest count is the cut; ties may keep a few extra regions
    kth = jnp.sort(counts)[-min(K, h * w)]
    keep = (counts >= jnp.maximum(kth, float(min_area))) & (counts > 0)
    return mask & keep[idx].reshape(h, w)

# host-transfer dtypes per Regions field, in field order
_FIELD_DTYPES = (np.bool_, np.float32, np.float32, np.float32, np.float32,
                 np.float32, np.float32, np.int32, np.int32, np.int32,
                 np.int32, np.float32, np.bool_, np.float32, np.float32,
                 np.float32, np.float32, np.float32, np.float32, np.float32,
                 np.float32, np.int32)


@jax.jit
def pack_regions(regions: Regions) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack Regions into two float32 arrays for bulk device->host transfer
    (some transports fetch integer arrays one element per round trip; floats
    go in bulk). Values are all exact in float32 (areas/labels < 2^24).
    Returns (main, label_id): main stacks the 21 same-shape (..., K) fields
    on a trailing axis; label_id is (..., K+1) and rides separately."""
    def as_f32(f):
        if f.dtype in (jnp.int32, jnp.int64):
            # clamp int sentinels (INT32_MAX in empty bbox slots) into
            # float32-exact range; consumers only read valid slots
            f = jnp.clip(f, -(2**24), 2**24)
        return f.astype(jnp.float32)

    main = jnp.stack([as_f32(f) for f in regions[:-1]], axis=-1)
    return main, regions.label_id.astype(jnp.float32)


def regions_to_host(regions_or_packed) -> Regions:
    """Bulk pull of (possibly vmap-batched) Regions to numpy with original
    dtypes — two float32 transfers instead of one per int element."""
    if isinstance(regions_or_packed, Regions):
        packed = pack_regions(regions_or_packed)
    else:
        packed = regions_or_packed
    main, label_id = packed
    # flatten before the pull: the transport fetches multi-dim arrays one
    # major row per round trip, 1D float32 goes as a single bulk message
    main = np.asarray(jnp.ravel(main)).reshape(main.shape)
    fields = [main[..., i].astype(dt) for i, dt in enumerate(_FIELD_DTYPES[:-1])]
    fields.append(np.asarray(jnp.ravel(label_id)).reshape(label_id.shape)
                  .astype(_FIELD_DTYPES[-1]))
    return Regions(*fields)
