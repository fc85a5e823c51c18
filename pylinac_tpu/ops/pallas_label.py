"""Pallas TPU kernel: VMEM-resident connected-component labeling.

The XLA formulation of the label sweep (``ops/label.py``) materializes every
neighbor pass and segmented scan to HBM — ~70 iterations x ~2 GB of traffic
for a CT stack, which made CCL the dominant cost of CatPhan localization.
This kernel keeps the label image, the doubling scratch and the mask in
VMEM for the WHOLE iterate-until-converged loop: HBM is touched exactly
twice (read mask, write labels).

Algorithm (identical fixpoint to ``label()``): labels start as each masked
pixel's linear index; per iteration take the 4/8-neighbor minimum, then
sweep the minimum across entire bg-free runs in all four directions via
log-doubling segmented min (shift by 1,2,4,... with a bg-free "reach"
flag), so convergence scales with the number of turns in a component, not
its geodesic diameter. Loop exits when a full iteration changes nothing.

Output matches ``label()``: int32, background = -1, each component carries
the linear index of its minimum pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Iteration cap. Each iteration crosses every monotone stretch of a
# component, so this bounds the number of "turns" a component may have —
# clinical edge masks measure ~70; 256 is a generous margin (the loop exits
# early at the fixpoint).
MAX_ITERS = 256

# Convergence is only CHECKED every this many sweeps: the while_loop's
# scalar condition stalls the vector pipeline (~0.1 ms per check on a
# v5e), which dominated the kernel at ~40-iteration convergence. Extra
# sweeps past the fixpoint are idempotent and nearly free in VMEM.
CHECK_EVERY = 8


def _shift_rows(x: jnp.ndarray, d: int, fill) -> jnp.ndarray:
    """Shift rows down by d (d>0) or up (d<0), filling vacated rows."""
    h = x.shape[0]
    rolled = pltpu.roll(x, d % h, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    mask = (row >= d) if d > 0 else (row < h + d)
    return jnp.where(mask, rolled, fill)


def _shift_cols(x: jnp.ndarray, d: int, fill) -> jnp.ndarray:
    w = x.shape[1]
    rolled = pltpu.roll(x, d % w, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (col >= d) if d > 0 else (col < w + d)
    return jnp.where(mask, rolled, fill)


def _shift2(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    if dy:
        x = _shift_rows(x, dy, fill)
    if dx:
        x = _shift_cols(x, dx, fill)
    return x


def _label_kernel(mask_ref, out_ref, *, connectivity: int, h: int, w: int):
    sentinel = jnp.int32(h * w)
    mask = mask_ref[:].reshape(h, w) != 0
    is_bg = jnp.logical_not(mask)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin = row * w + col
    lab0 = jnp.where(mask, lin, sentinel)

    if connectivity == 1:
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1),
                  (-1, -1), (-1, 1), (1, -1), (1, 1)]

    # log-doubling segmented min along an axis; `reach` tracks whether the
    # span just combined is background-free, so minima never leak across
    # gaps between different components.
    def seg_sweep(vals, axis: int, sign: int):
        # `reach` rides as int32 — Mosaic's dynamic_rotate only supports
        # 32-bit element types
        shift = _shift_rows if axis == 0 else _shift_cols
        v = vals
        reach = mask.astype(jnp.int32)  # span of length 1 ending here
        d = 1
        n = h if axis == 0 else w
        while d < n:
            sv = shift(v, sign * d, sentinel)
            sr = shift(reach, sign * d, jnp.int32(0))
            both = (reach & sr) != 0
            v = jnp.where(both, jnp.minimum(v, sv), v)
            reach = reach & sr
            d *= 2
        return v

    def sweep(lab):
        best = lab
        for dy, dx in shifts:
            best = jnp.minimum(best, _shift2(lab, dy, dx, sentinel))
        best = jnp.where(mask, best, sentinel)
        for axis in (0, 1):
            for sign in (1, -1):
                best = jnp.minimum(best, seg_sweep(best, axis, sign))
        return jnp.where(mask, best, sentinel)

    def body(state):
        lab, _, it = state
        new = jax.lax.fori_loop(0, CHECK_EVERY, lambda _, b: sweep(b), lab)
        return new, jnp.any(new != lab), it + CHECK_EVERY

    def cond(state):
        _, changed, it = state
        return changed & (it < MAX_ITERS)

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True), 0))
    out_ref[:] = jnp.where(mask, lab, -1).reshape(out_ref.shape)


def _label_kernel_call(mask: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """Traceable (un-jitted) single-image pallas CCL — safe to call from
    inside other traced functions (``label()`` dispatches here on TPU)."""
    h, w = mask.shape
    kern = functools.partial(_label_kernel, connectivity=connectivity,
                             h=h, w=w)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_pallas(mask: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """Single-image VMEM-resident CCL; same contract as ``label()``."""
    return _label_kernel_call(mask, connectivity)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_pallas_batch(masks: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """(B, H, W) bool/int → (B, H, W) int32 labels, one grid program per
    image (each image's loop runs fully in VMEM)."""
    b, h, w = masks.shape
    kern = functools.partial(_label_kernel, connectivity=connectivity,
                             h=h, w=w)
    return pl.pallas_call(
        kern,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(masks.astype(jnp.int32))


def _flood_kernel(mask_ref, out_ref, *, h: int, w: int):
    """Flood the background from the image border (4-connectivity).

    Writes an int32 mask: 1 where a background pixel is reachable from the
    border, 0 elsewhere. ``bg & ~reached`` is exactly the hole set that
    ``fill``/``regionprops`` need — computed without the background label
    pass + host-style scatter of the XLA formulation.
    """
    fg = mask_ref[:].reshape(h, w) != 0
    bg = jnp.logical_not(fg)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (row == 0) | (row == h - 1) | (col == 0) | (col == w - 1)
    big = jnp.int32(2)
    # 0 = reached, 1 = unreached bg, 2 = fg (blocks propagation)
    v0 = jnp.where(bg, jnp.where(border, 0, 1), big)

    def seg_sweep(vals, axis: int, sign: int):
        shift = _shift_rows if axis == 0 else _shift_cols
        v = vals
        reach = bg.astype(jnp.int32)
        d = 1
        n = h if axis == 0 else w
        while d < n:
            sv = shift(v, sign * d, big)
            sr = shift(reach, sign * d, jnp.int32(0))
            both = (reach & sr) != 0
            v = jnp.where(both, jnp.minimum(v, sv), v)
            reach = reach & sr
            d *= 2
        return v

    def sweep(v):
        best = v
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            best = jnp.minimum(best, _shift2(v, dy, dx, big))
        best = jnp.where(bg, best, big)
        for axis in (0, 1):
            for sign in (1, -1):
                best = jnp.minimum(best, seg_sweep(best, axis, sign))
        return jnp.where(bg, best, big)

    def body(state):
        v, _, it = state
        new = jax.lax.fori_loop(0, CHECK_EVERY, lambda _, b: sweep(b), v)
        return new, jnp.any(new != v), it + CHECK_EVERY

    def cond(state):
        _, changed, it = state
        return changed & (it < MAX_ITERS)

    v, _, _ = jax.lax.while_loop(cond, body, (v0, jnp.bool_(True), 0))
    out_ref[:] = (jnp.where(bg, v, big) == 0).astype(jnp.int32).reshape(out_ref.shape)


def flood_from_border(mask: jnp.ndarray) -> jnp.ndarray:
    """Traceable: bool (H, W) fg mask → int32 1 where bg is border-reachable."""
    h, w = mask.shape
    kern = functools.partial(_flood_kernel, h=h, w=w)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask.astype(jnp.int32))


def _hole_kernel(mask_ref, out_ref, *, h: int, w: int):
    """Hole roots + border reachability in ONE background min-propagation.

    Propagates the minimum of (border-bg ? -1 : linear index) over the
    background (4-connectivity). Output per pixel: -1 for border-reachable
    background, the hole component's root (minimum) linear index for hole
    pixels, -2 for foreground. Replaces the separate label(~mask) + flood
    passes in ``regionprops`` — holes are exactly the pixels with
    output >= 0 and their value equals ``label(~mask)``'s component id.
    """
    fg = mask_ref[:].reshape(h, w) != 0
    bg = jnp.logical_not(fg)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (row == 0) | (row == h - 1) | (col == 0) | (col == w - 1)
    sentinel = jnp.int32(h * w)
    lin = row * w + col
    v0 = jnp.where(bg, jnp.where(border, -1, lin), sentinel)

    def seg_sweep(vals, axis: int, sign: int):
        shift = _shift_rows if axis == 0 else _shift_cols
        v = vals
        reach = bg.astype(jnp.int32)
        d = 1
        n = h if axis == 0 else w
        while d < n:
            sv = shift(v, sign * d, sentinel)
            sr = shift(reach, sign * d, jnp.int32(0))
            both = (reach & sr) != 0
            v = jnp.where(both, jnp.minimum(v, sv), v)
            reach = reach & sr
            d *= 2
        return v

    def sweep(v):
        best = v
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            best = jnp.minimum(best, _shift2(v, dy, dx, sentinel))
        best = jnp.where(bg, best, sentinel)
        for axis in (0, 1):
            for sign in (1, -1):
                best = jnp.minimum(best, seg_sweep(best, axis, sign))
        return jnp.where(bg, best, sentinel)

    def body(state):
        v, _, it = state
        new = jax.lax.fori_loop(0, CHECK_EVERY, lambda _, b: sweep(b), v)
        return new, jnp.any(new != v), it + CHECK_EVERY

    def cond(state):
        _, changed, it = state
        return changed & (it < MAX_ITERS)

    v, _, _ = jax.lax.while_loop(cond, body, (v0, jnp.bool_(True), 0))
    out_ref[:] = jnp.where(bg, v, -2).reshape(out_ref.shape)


def hole_roots(mask: jnp.ndarray) -> jnp.ndarray:
    """Traceable: fg mask → int32 per-pixel hole root / -1 reachable-bg /
    -2 fg (see :func:`_hole_kernel`)."""
    h, w = mask.shape
    kern = functools.partial(_hole_kernel, h=h, w=w)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask.astype(jnp.int32))


def label_pallas_supported(shape: tuple[int, int]) -> bool:
    """VMEM budget check: lab + scratch + mask must fit in ~16 MB."""
    h, w = shape
    # ~6 int32 live arrays of (h, w) during the sweep
    return h * w * 4 * 6 <= 12 * 1024 * 1024 and h >= 8 and w >= 128


# ---------------------------------------------------------------------------
# Batched small-window CCL
#
# vmapping the single-image kernel serializes: each instance pays its own
# grid step, convergence loop and per-op overhead (~15 ms for a 116² window
# — 416 WL threshold-windows took minutes). Here a BLOCK of instances is
# flattened to one (bc·hp, wp) VMEM image and swept TOGETHER: row shifts
# carry an instance-local row mask so propagation (and the log-doubling
# segmented sweeps) never crosses instance boundaries, and the convergence
# loop runs once per block. Windows narrower than the 128 lane width are
# zero-padded (padding is background, which provably changes neither the
# labels nor the hole set — bg padding only adds border-connected bg).
# ---------------------------------------------------------------------------
def _batch_pad_dims(h: int, w: int) -> tuple[int, int]:
    hp = -(-h // 8) * 8
    wp = max(-(-w // 128) * 128, 128)
    return hp, wp


def _batch_block(b: int, hp: int, wp: int) -> int:
    """Instances per grid step under the VMEM budget. The sweep keeps ~12
    (hp, wp) i32 arrays live (v/reach/shift temporaries + iota masks) against
    the 16 MB scoped-vmem limit."""
    per = hp * wp * 4 * 12
    return max(1, min(b, (12 * 1024 * 1024) // per))


def _batched_sweep_kernel(mask_ref, out_ref, *, mode: str, connectivity: int,
                          bc: int, hp: int, wp: int, htrue: int, wtrue: int):
    """Shared body for the batched label ('label') and hole-root ('holes')
    min-propagation kernels over a flattened (bc·hp, wp) block."""
    n_rows = bc * hp
    flat = mask_ref[:].reshape(n_rows, wp)
    fg = flat != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, wp), 0)
    row_in = jnp.remainder(row, hp)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, wp), 1)
    sentinel = jnp.int32(htrue * wtrue)
    lin = row_in * wtrue + col

    def shift_r(x, d, fill):
        rolled = pltpu.roll(x, d % n_rows, 0)
        m = (row_in >= d) if d > 0 else (row_in < hp + d)
        return jnp.where(m, rolled, fill)

    def shift_c(x, d, fill):
        rolled = pltpu.roll(x, d % wp, 1)
        m = (col >= d) if d > 0 else (col < wp + d)
        return jnp.where(m, rolled, fill)

    def shift2(x, dy, dx, fill):
        if dy:
            x = shift_r(x, dy, fill)
        if dx:
            x = shift_c(x, dx, fill)
        return x

    if mode == "label":
        domain = fg
        v0 = jnp.where(fg, lin, sentinel)
        if connectivity == 1:
            shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        else:
            shifts = [(-1, 0), (1, 0), (0, -1), (0, 1),
                      (-1, -1), (-1, 1), (1, -1), (1, 1)]
    else:  # holes: min-propagate over background; border bg seeds with -1
        domain = jnp.logical_not(fg)
        border = ((row_in == 0) | (row_in == hp - 1)
                  | (col == 0) | (col == wp - 1))
        v0 = jnp.where(domain, jnp.where(border, -1, lin), sentinel)
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]

    dom_i = domain.astype(jnp.int32)

    def seg_sweep(vals, axis: int, sign: int):
        shift = shift_r if axis == 0 else shift_c
        v = vals
        reach = dom_i
        d = 1
        n = hp if axis == 0 else wp
        while d < n:
            sv = shift(v, sign * d, sentinel)
            sr = shift(reach, sign * d, jnp.int32(0))
            both = (reach & sr) != 0
            v = jnp.where(both, jnp.minimum(v, sv), v)
            reach = reach & sr
            d *= 2
        return v

    def sweep(v):
        best = v
        for dy, dx in shifts:
            best = jnp.minimum(best, shift2(v, dy, dx, sentinel))
        best = jnp.where(domain, best, sentinel)
        for axis in (0, 1):
            for sign in (1, -1):
                best = jnp.minimum(best, seg_sweep(best, axis, sign))
        return jnp.where(domain, best, sentinel)

    def body(state):
        v, _, it = state
        new = jax.lax.fori_loop(0, CHECK_EVERY, lambda _, b: sweep(b), v)
        return new, jnp.any(new != v), it + CHECK_EVERY

    def cond(state):
        _, changed, it = state
        return changed & (it < MAX_ITERS)

    v, _, _ = jax.lax.while_loop(cond, body, (v0, jnp.bool_(True), 0))
    if mode == "label":
        out = jnp.where(fg, v, -1)
    else:
        out = jnp.where(domain, v, -2)
    out_ref[:] = out.reshape(out_ref.shape)


def _batched_call(masks: jnp.ndarray, mode: str, connectivity: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Pad, block and launch the batched sweep kernel. Traceable.
    ``interpret`` runs the kernel in pallas interpret mode (CPU tests)."""
    b, h, w = masks.shape
    hp, wp = _batch_pad_dims(h, w)
    bc = _batch_block(b, hp, wp)
    bpad = -(-b // bc) * bc
    m = jnp.pad(masks.astype(jnp.int32),
                ((0, bpad - b), (0, hp - h), (0, wp - w)))
    kern = functools.partial(_batched_sweep_kernel, mode=mode,
                             connectivity=connectivity, bc=bc, hp=hp, wp=wp,
                             htrue=h, wtrue=w)
    out = pl.pallas_call(
        kern,
        grid=(bpad // bc,),
        out_shape=jax.ShapeDtypeStruct((bpad, hp, wp), jnp.int32),
        in_specs=[pl.BlockSpec((bc, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bc, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m)
    return out[:b, :h, :w]


def label_batched_pallas(masks: jnp.ndarray, connectivity: int = 1,
                         interpret: bool = False) -> jnp.ndarray:
    """Traceable batched CCL: (B, h, w) masks → (B, h, w) int32 labels
    (bg = -1, components carry their min TRUE linear index)."""
    return _batched_call(masks, "label", connectivity, interpret)


def hole_roots_batched(masks: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Traceable batched hole roots: per pixel -1 border-reachable bg,
    hole-root linear index for hole pixels, -2 fg."""
    return _batched_call(masks, "holes", 1, interpret)


def label_batched_supported(shape: tuple[int, int]) -> bool:
    """The batched kernel pads to lane width, so any window that fits a
    one-instance block qualifies (512x512 CT slices do: ~11 live 1 MB
    arrays vs the 16 MB scoped-vmem limit)."""
    h, w = shape
    hp, wp = _batch_pad_dims(h, w)
    return hp * wp * 4 * 12 <= 14 * 1024 * 1024


# ---------------------------------------------------------------------------
# Bit-packed border flood + filled centroid
#
# Full-resolution EPID frames (1280^2) don't fit VMEM as int32 images, which
# forced hole filling back to the HBM-round-tripping XLA form. Packing 32
# columns per int32 word shrinks a 1280^2 mask to 1280x40 words (205 KB), so
# a WHOLE BATCH of frames floods in one VMEM-resident program. Propagation
# becomes bitwise OR constrained to background, swept to convergence with
# Kogge-Stone prefix fills (the chess-bitboard "occluded fill"): log2 steps
# per direction, carries crossing word boundaries by word-axis shifts.
#
# Layout: (B*WW, H) int32 — image ROWS live on the 128-lane axis, (instance,
# word) pairs on the sublane axis. Row shifts are lane rolls; column shifts
# are bit shifts + word-axis rolls masked at instance boundaries.
# ---------------------------------------------------------------------------
_SRL = jax.lax.shift_right_logical

# VMEM allowance for one grid step of the packed flood (input block + the
# ~8 live int32 temporaries per instance). v5e/v6e VMEM is 128 MB; 48 MB
# leaves room for pallas double-buffering of the input block.
_FLOOD_VMEM_BUDGET = 48 * 1024 * 1024

# bit-index masks: mask_k selects bits whose index has bit k set, so
# sum_b b*bit_b = sum_k 2^k * popcount(v & mask_k)
_BIT_IX_MASKS = tuple(
    int(np.uint32(m).astype(np.int32))
    for m in (0xAAAAAAAA, 0xCCCCCCCC, 0xF0F0F0F0, 0xFF00FF00, 0xFFFF0000))


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on int32 words (vector-unit friendly)."""
    v = v - (_SRL(v, 1) & 0x55555555)
    v = (v & 0x33333333) + (_SRL(v, 2) & 0x33333333)
    v = (v + _SRL(v, 4)) & 0x0F0F0F0F
    return _SRL(v * 0x01010101, 24)


def _flood_packed_kernel(fgp_ref, out_ref, *, bc: int, ww: int, hp: int,
                         h_true: int, w_true: int):
    # Everything stays rank-3 (bc, ww, hp): Mosaic's layout inference
    # rejects the rank-changing reshapes / rank-1 reductions the obvious
    # 2D formulation needs (`inferReshape` check failure on hardware).
    fg = fgp_ref[:]
    shape = (bc, ww, hp)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)  # image row
    win = jax.lax.broadcasted_iota(jnp.int32, shape, 1)   # word index

    # valid bits of each word: columns < w_true, rows < h_true
    rem = jnp.clip(w_true - 32 * win, 0, 32)
    word_mask = jnp.where(rem >= 32, jnp.int32(-1),
                          (jnp.int32(1) << rem) - 1)
    valid = jnp.where(lane < h_true, word_mask, 0)
    bg = valid & ~fg

    def word_shift(x, m):
        rolled = pltpu.roll(x, m % ww, 1)
        mask = (win >= m) if m > 0 else (win < ww + m)
        return jnp.where(mask, rolled, 0)

    def lane_shift(x, d):
        rolled = pltpu.roll(x, d % hp, 2)
        mask = (lane >= d) if d > 0 else (lane < hp + d)
        return jnp.where(mask, rolled, 0)

    def east(x, d):  # toward higher columns
        if d < 32:
            return (x << d) | _SRL(word_shift(x, 1), 32 - d)
        return word_shift(x, d // 32)

    def west(x, d):
        if d < 32:
            return _SRL(x, d) | (word_shift(x, -1) << (32 - d))
        return word_shift(x, -(d // 32))

    def south(x, d):
        return lane_shift(x, d)

    def north(x, d):
        return lane_shift(x, -d)

    def ks_fill(gen, shift_fn, limit):
        pro = bg
        d = 1
        while d < limit:
            gen = gen | (pro & shift_fn(gen, d))
            pro = pro & shift_fn(pro, d)
            d *= 2
        return gen

    # border-touching background seeds
    border_rows = jnp.where((lane == 0) | (lane == h_true - 1),
                            jnp.int32(-1), 0)
    first_col = jnp.where(win == 0, jnp.int32(1), 0)
    last_w, last_b = (w_true - 1) // 32, (w_true - 1) % 32
    last_col = jnp.where(win == last_w, jnp.int32(1) << last_b, 0)
    seeds = bg & (border_rows | first_col | last_col)

    def body(state):
        reach, _, it = state
        r = reach
        r = ks_fill(r, east, ww * 32)
        r = ks_fill(r, west, ww * 32)
        r = ks_fill(r, south, hp)
        r = ks_fill(r, north, hp)
        return r, jnp.any(r != reach), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < 64)

    reach, _, _ = jax.lax.while_loop(cond, body, (seeds, jnp.bool_(True), 0))
    filled = (fg & valid) | (bg & ~reach)

    pc = _popcount32(filled).astype(jnp.float32)
    xbit = jnp.zeros_like(pc)
    for k, m in enumerate(_BIT_IX_MASKS):
        xbit = xbit + (1 << k) * _popcount32(filled & m).astype(jnp.float32)
    mass = pc
    ysum = pc * lane.astype(jnp.float32)
    xsum = 32.0 * win.astype(jnp.float32) * pc + xbit

    def inst_sum(x):                               # (bc, ww, hp) -> (bc, 1)
        return x.sum(axis=2).sum(axis=1, keepdims=True)

    col = jax.lax.broadcasted_iota(jnp.int32, (bc, 128), 1)
    zero = jnp.float32(0)
    out_ref[:] = (jnp.where(col == 0, inst_sum(mass), zero)
                  + jnp.where(col == 1, inst_sum(ysum), zero)
                  + jnp.where(col == 2, inst_sum(xsum), zero))


def _pack_cols(masks: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    """(B, H, W) bool → (B, WWp, Hp) int32 with 32 columns per word
    (bit b of word k = column 32k+b). Pure XLA; runs on any backend."""
    b, h, w = masks.shape
    w32 = -(-w // 32) * 32
    m = jnp.pad(masks, ((0, 0), (0, 0), (0, w32 - w)))
    weights = (jnp.int32(1) << jnp.arange(32, dtype=jnp.int32))
    packed = jnp.sum(m.reshape(b, h, w32 // 32, 32).astype(jnp.int32)
                     * weights, axis=-1, dtype=jnp.int32)
    packed = jnp.transpose(packed, (0, 2, 1))      # (B, WW, H)
    ww = w32 // 32
    wwp = -(-ww // 8) * 8
    hp = max(-(-h // 128) * 128, 128)
    packed = jnp.pad(packed, ((0, 0), (0, wwp - ww), (0, hp - h)))
    return packed, wwp, hp


def _choose_bc(b: int, per: int) -> int:
    """Batch-block size for the packed flood grid. Under the
    :func:`flood_packed_supported` guard the invariant ``bc * per <=
    _FLOOD_VMEM_BUDGET`` always holds (shared with the block-shape test)."""
    bc = max(1, min(b, _FLOOD_VMEM_BUDGET // per))
    if bc < b:
        # Multi-step grid: the (bc, 128) output block's sublane dim must be
        # a multiple of 8 (TPU block rule; a bc==array-dim single block is
        # exempt). flood_packed_supported() guarantees 8 instances fit.
        bc = max(8, bc - bc % 8)
    return bc


def filled_centroid_packed(masks: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Traceable: (B, H, W) bool masks → (B, 2) f32 (cy, cx) centroids of
    the hole-filled masks, flooding the whole batch bit-packed in VMEM."""
    b, h, w = masks.shape
    if not flood_packed_supported((h, w)):
        raise ValueError(
            f"filled_centroid_packed: frame shape {(h, w)} exceeds the "
            f"VMEM flood budget ({_FLOOD_VMEM_BUDGET} B for 8 instances); "
            "check flood_packed_supported() and fall back to the XLA fill")
    packed, wwp, hp = _pack_cols(masks)
    per = wwp * hp * 4 * 8
    bc = _choose_bc(b, per)
    bpad = -(-b // bc) * bc
    packed = jnp.pad(packed, ((0, bpad - b), (0, 0), (0, 0)))
    kern = functools.partial(_flood_packed_kernel, bc=bc, ww=wwp, hp=hp,
                             h_true=h, w_true=w)
    out = pl.pallas_call(
        kern,
        grid=(bpad // bc,),
        out_shape=jax.ShapeDtypeStruct((bpad, 128), jnp.float32),
        in_specs=[pl.BlockSpec((bc, wwp, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bc, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)[:b]
    mass = jnp.maximum(out[:, 0], 1.0)
    return jnp.stack([out[:, 1] / mass, out[:, 2] / mass], axis=-1)


def flood_packed_supported(shape: tuple[int, int]) -> bool:
    """Eight instances must fit the VMEM budget: when a batch spans several
    grid steps the output block's sublane dim must be a multiple of 8, so
    the kernel may be forced up to bc=8 regardless of the per-instance
    footprint. Covers clinical frames up to ~2.5k x 2.5k."""
    h, w = shape
    wwp = -(-(-(-w // 32)) // 8) * 8   # ceil(ceil(w/32)/8)*8 words
    hp = max(-(-h // 128) * 128, 128)
    return wwp * hp * 4 * 8 * 8 <= _FLOOD_VMEM_BUDGET
