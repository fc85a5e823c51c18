"""VMEM-resident 2D gamma (Low 2004 Table I brute force).

The XLA form re-reads the padded evaluation image from HBM once per disk
offset (~300 full-frame reads for DTA=9 — HBM-bound at ~65 ms per EPID
frame). Here the normalized reference and padded evaluation live in VMEM
and the whole offset loop runs on-chip: two HBM reads + one write per
image, with the shift/min unrolled over the static disk offsets.

Semantics are identical to :func:`pylinac_tpu.ops.gamma.gamma_2d`'s core
loop (same skimage-disk neighborhood, NaN→inf candidates, cap, threshold
fill); the normalization prologue stays in XLA where it fuses with the
caller. Cap/threshold/fill arrive as SMEM scalars so they stay traced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gamma import _disk_offsets


def _gamma_kernel(scal_ref, ref_ref, evalp_ref, out_ref, *, offsets,
                  dta: int):
    cap = scal_ref[0, 0]
    threshold_n = scal_ref[0, 1]
    fill = scal_ref[0, 2]
    ref = ref_ref[:]
    h, w = ref.shape
    min_g2 = jnp.full((h, w), jnp.float32(jnp.inf))
    min_g2 = jnp.minimum(min_g2, cap * cap)
    # Group the disk offsets by dx: a column (lane-axis) shift is an
    # unaligned vector load (~2 loads + funnel shuffle per row) while a row
    # (sublane) shift is nearly free — hoisting the column shift does 2·dta+1
    # expensive shifts instead of one per disk offset (~253 for dta=9).
    by_dx: dict = {}
    for dy, dx in offsets:
        by_dx.setdefault(dx, []).append(dy)
    for dx, dys in sorted(by_dx.items()):
        ev_dx = evalp_ref[:, dta + dx: dta + dx + w]
        for dy in dys:
            shifted = ev_dx[dta + dy: dta + dy + h, :]
            dd = shifted - ref
            cand = jnp.float32((dy * dy + dx * dx) / (dta * dta)) + dd * dd
            cand = jnp.where(jnp.isnan(cand), jnp.inf, cand)
            min_g2 = jnp.minimum(min_g2, cand)
    gamma = jnp.minimum(jnp.sqrt(min_g2), cap)
    skip = jnp.isnan(ref) | (ref < threshold_n)
    out_ref[:] = jnp.where(skip, fill, gamma)


def gamma2d_pallas(ref_n: jnp.ndarray, eval_p: jnp.ndarray, *, dta: int,
                   cap, threshold_n, fill,
                   interpret: bool = False) -> jnp.ndarray:
    """(H, W) normalized reference + edge-padded evaluation → gamma map.
    ``cap``/``threshold_n``/``fill`` may be traced scalars."""
    h, w = ref_n.shape
    scal = jnp.stack([jnp.float32(cap), jnp.float32(threshold_n),
                      jnp.float32(fill)]).reshape(1, 3)
    kern = functools.partial(_gamma_kernel,
                             offsets=tuple(_disk_offsets(dta)), dta=dta)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scal, ref_n.astype(jnp.float32), eval_p.astype(jnp.float32))


def gamma2d_pallas_supported(shape: tuple[int, int], dta: int) -> bool:
    """ref + padded eval + out + ~2 temporaries must fit the ~16 MB VMEM."""
    h, w = shape
    hp, wp = h + 2 * dta, w + 2 * dta
    live = (2 * h * w + hp * wp + 2 * h * w) * 4
    return live <= 13 * 1024 * 1024 and h >= 8 and w >= 128
