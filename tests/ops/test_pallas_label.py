"""Pallas CCL kernel vs the XLA label fixpoint (interpret mode on CPU).

The TPU path dispatches ``label()`` to the VMEM-resident pallas kernel;
these tests pin that both formulations produce bit-identical labels on
masks covering the structures QA images produce (rings, speckle, runs,
empty, full).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import pylinac_tpu.ops.label as jlabel
from pylinac_tpu.ops import pallas_label as plab


def _pallas_interpret(mask, connectivity):
    h, w = mask.shape
    kern = functools.partial(plab._label_kernel, connectivity=connectivity,
                             h=h, w=w)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=True,
    )(jnp.asarray(mask, jnp.int32))


def _masks():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:64, :128]
    ring = np.abs(np.sqrt((yy - 32) ** 2 + (xx - 64) ** 2) - 25) < 1.5
    spiral_t = np.linspace(0, 6 * np.pi, 4000)
    sr = 2 + spiral_t * 1.4
    sy = (32 + sr * np.sin(spiral_t)).astype(int)
    sx = (64 + sr * np.cos(spiral_t)).astype(int)
    keep = (sy >= 0) & (sy < 64) & (sx >= 0) & (sx < 128)
    spiral = np.zeros((64, 128), bool)
    spiral[sy[keep], sx[keep]] = True
    return {
        "speckle": rng.random((64, 128)) > 0.7,
        "sparse": rng.random((64, 128)) > 0.97,
        "ring+noise": ring | (rng.random((64, 128)) > 0.95),
        "spiral": spiral,  # worst case for run-sweep convergence
        "empty": np.zeros((64, 128), bool),
        "full": np.ones((64, 128), bool),
    }


@pytest.mark.parametrize("name", list(_masks()))
@pytest.mark.parametrize("connectivity", [1, 2])
def test_pallas_label_matches_xla(name, connectivity):
    mask = _masks()[name]
    out = _pallas_interpret(mask, connectivity)
    ref = jlabel.label(jnp.asarray(mask), connectivity=connectivity)
    assert bool(jnp.all(out == ref)), name


def test_supported_budget():
    assert plab.label_pallas_supported((512, 512))
    assert plab.label_pallas_supported((256, 256))
    assert not plab.label_pallas_supported((4096, 4096))
    assert not plab.label_pallas_supported((50, 50))  # sub-tile: fallback


@pytest.mark.parametrize("name", ["speckle", "ring+noise", "spiral", "empty", "full"])
def test_flood_from_border_matches_fill(name):
    """flood==0 outside fg must equal the hole set of the XLA fill path."""
    mask = _masks()[name]
    h, w = mask.shape
    kern = functools.partial(plab._flood_kernel, h=h, w=w)
    reached = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=True,
    )(jnp.asarray(mask, jnp.int32))
    m = jnp.asarray(mask)
    holes_pallas = ~m & (reached == 0)
    filled = jlabel.fill_holes(m)  # CPU: XLA scatter path
    holes_ref = filled & ~m
    assert bool(jnp.all(holes_pallas == holes_ref)), name


@pytest.mark.parametrize("name", ["speckle", "ring+noise", "spiral", "empty", "full"])
def test_hole_roots_matches_xla(name):
    """The fused hole kernel's (is_hole, root) must equal label(~mask) +
    border-flag semantics for every hole pixel."""
    mask = _masks()[name]
    h, w = mask.shape
    kern = functools.partial(plab._hole_kernel, h=h, w=w)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=True,
    )(jnp.asarray(mask, jnp.int32))
    m = jnp.asarray(mask)
    bgl = jlabel.label(~m, connectivity=1)
    filled = jlabel.fill_holes(m)
    holes_ref = filled & ~m
    assert bool(jnp.all((out >= 0) == holes_ref)), name
    # root values agree on hole pixels
    assert bool(jnp.all(jnp.where(holes_ref, out == bgl, True))), name
