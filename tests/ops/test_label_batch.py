"""Batched CCL/regionprops parity vs the single-image kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from pylinac_tpu.ops import label as jlabel


def _random_masks(b, h, w, seed=0, p=0.35):
    rng = np.random.default_rng(seed)
    masks = rng.random((b, h, w)) < p
    # add a solid disk with a hole (exercises fill + centroid paths)
    yy, xx = np.mgrid[:h, :w]
    for i in range(b):
        cy, cx = rng.integers(h // 4, 3 * h // 4), rng.integers(w // 4, 3 * w // 4)
        r = rng.integers(5, min(h, w) // 5)
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
        hole = ((yy - cy) ** 2 + (xx - cx) ** 2) < max(r // 3, 2) ** 2
        masks[i] |= disk
        masks[i] &= ~hole
    return masks


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_batch_matches_single(connectivity):
    masks = _random_masks(5, 37, 53, seed=3)
    batched = np.asarray(jlabel.label_batch(jnp.asarray(masks), connectivity))
    for i in range(masks.shape[0]):
        single = np.asarray(jlabel.label(jnp.asarray(masks[i]), connectivity))
        np.testing.assert_array_equal(batched[i], single)


def test_regionprops_batch_matches_single():
    masks = _random_masks(4, 64, 80, seed=7, p=0.12)
    rng = np.random.default_rng(1)
    intens = rng.random(masks.shape).astype(np.float32)
    batched = jlabel.regionprops_batch(
        jnp.asarray(masks), jnp.asarray(intens), K=24, connectivity=1,
        chunk=2)
    for i in range(masks.shape[0]):
        single = jlabel.regionprops(
            jnp.asarray(masks[i]), jnp.asarray(intens[i]), K=24,
            connectivity=1)
        for name in jlabel.Regions._fields:
            b = np.asarray(getattr(batched, name)[i])
            s = np.asarray(getattr(single, name))
            np.testing.assert_allclose(
                b, s, rtol=1e-5, atol=1e-5, err_msg=f"field {name} img {i}")


def test_label_batch_narrow_window():
    """Windows narrower than the 128 lane width (the WL BB case)."""
    masks = _random_masks(3, 116, 116, seed=11, p=0.1)
    batched = np.asarray(jlabel.label_batch(jnp.asarray(masks), 1))
    for i in range(masks.shape[0]):
        single = np.asarray(jlabel.label(jnp.asarray(masks[i]), 1))
        np.testing.assert_array_equal(batched[i], single)
