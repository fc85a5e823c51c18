"""Parity: native C++ CCL+props vs the jax regionprops backend.

The native backend (ops/label_native.py) must be drop-in identical to
ops/label.py for every field a routed caller reads — same component sets,
same root-index labels, same slot order, same hole semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pylinac_tpu.ops import label as jlabel
from pylinac_tpu.ops import label_native as lnat

pytestmark = pytest.mark.skipif(not lnat.available(),
                                reason="no native toolchain")


def _pack_host(bw: np.ndarray) -> np.ndarray:
    """Host-side reference bit packing (uint16 LSB-first)."""
    b, h, w = bw.shape
    pad = (-w) % 16
    if pad:
        bw = np.pad(bw, ((0, 0), (0, 0), (0, pad)))
    r = bw.reshape(b, h, (w + pad) // 16, 16).astype(np.uint16)
    return (r << np.arange(16, dtype=np.uint16)).sum(axis=-1).astype(np.uint16)


def _jax_regions(mask, intensity, connectivity):
    K = min(300, mask.size - 1)  # top_k needs K+1 <= pixel count
    r = jlabel.regionprops(jnp.asarray(mask), jnp.asarray(intensity),
                           K=K, connectivity=connectivity, hull=False)
    return jlabel.regions_to_host(r)


FIELDS_EXACT = ("valid", "area", "area_filled", "touches_border", "label_id",
                "bbox_rmin", "bbox_cmin", "bbox_rmax", "bbox_cmax")
FIELDS_CLOSE = ("centroid_r", "centroid_c",
                "major_axis_length", "minor_axis_length",
                "weighted_centroid_r", "weighted_centroid_c",
                "mean_intensity", "max_intensity", "min_intensity")


def _assert_parity(mask, intensity, connectivity):
    ref = _jax_regions(mask, intensity, connectivity)
    nat, n_regions = lnat.regions_from_packed(
        _pack_host(mask[None]), mask.shape[1], intensity[None].astype(np.float32),
        connectivity=connectivity, K=8)  # tiny K: exercises escalation
    nv = int(nat.valid[0].sum())
    assert nv == int(np.asarray(ref.valid).sum()) == n_regions[0]
    for f in FIELDS_EXACT:
        a = np.asarray(getattr(ref, f))[:nv]
        b = np.asarray(getattr(nat, f))[0, :nv]
        np.testing.assert_array_equal(a, b, err_msg=f)
    for f in FIELDS_CLOSE:
        a = np.asarray(getattr(ref, f), np.float64)[:nv]
        b = np.asarray(getattr(nat, f), np.float64)[0, :nv]
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4, err_msg=f)
    # eccentricity = sqrt(1 - l2/l1) amplifies f32-vs-f64 moment rounding on
    # 2-3 px regions; every consumer thresholds at 0.5 (ct.py:1507)
    np.testing.assert_allclose(
        np.asarray(nat.eccentricity, np.float64)[0, :nv],
        np.asarray(ref.eccentricity, np.float64)[:nv], atol=2e-2,
        err_msg="eccentricity")
    # orientation describes an axis: compare modulo pi (near-degenerate
    # regions can flip the atan2 branch between f32 and f64 moment sums)
    d = (np.asarray(nat.orientation, np.float64)[0, :nv]
         - np.asarray(ref.orientation, np.float64)[:nv])
    d = np.abs(d) % np.pi
    assert (np.minimum(d, np.pi - d) < 2e-3).all()


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_masks(connectivity, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((40, 53)) > 0.6
    intensity = rng.random((40, 53)).astype(np.float32) * 100
    _assert_parity(mask, intensity, connectivity)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_rings_and_holes(connectivity):
    """Nested rings: exercises hole assignment + filled areas."""
    mask = np.zeros((64, 80), bool)
    yy, xx = np.mgrid[:64, :80]
    r2 = (yy - 32.0) ** 2 + (xx - 40.0) ** 2
    mask |= (r2 < 30**2) & (r2 > 26**2)      # outer ring
    mask |= (r2 < 15**2) & (r2 > 11**2)      # inner ring (in outer's hole)
    mask |= r2 < 4**2                        # solid disk in inner's hole
    mask[0:3, 0:40] = True                   # border-touching blob
    intensity = (r2.astype(np.float32) % 37) + 1
    _assert_parity(mask, intensity, connectivity)


def test_diagonal_connectivity_differs():
    """conn=2 joins a diagonal chain that conn=1 splits."""
    mask = np.zeros((8, 8), bool)
    mask[np.arange(6), np.arange(6)] = True
    inten = np.ones((8, 8), np.float32)
    nat1, n1 = lnat.regions_from_packed(_pack_host(mask[None]), 8,
                                        inten[None], connectivity=1)
    nat2, n2 = lnat.regions_from_packed(_pack_host(mask[None]), 8,
                                        inten[None], connectivity=2)
    assert n1[0] == 6 and n2[0] == 1
    _assert_parity(mask, inten, 1)
    _assert_parity(mask, inten, 2)


def test_batch_and_pack_device_roundtrip():
    """Device pack_mask16 == host packing; batch slots independent."""
    rng = np.random.default_rng(3)
    masks = rng.random((5, 33, 47)) > 0.55
    dev = np.asarray(lnat.pack_mask16(jnp.asarray(masks)))
    host = _pack_host(masks)
    np.testing.assert_array_equal(dev.astype(np.uint16), host)
    inten = rng.random((5, 33, 47)).astype(np.float32)
    nat, _ = lnat.regions_from_packed(host, 47, inten, connectivity=2)
    for i in range(5):
        ref = _jax_regions(masks[i], inten[i], 2)
        nv = int(np.asarray(ref.valid).sum())
        assert int(nat.valid[i].sum()) == nv
        np.testing.assert_array_equal(np.asarray(ref.label_id)[:nv],
                                      nat.label_id[i, :nv])
        np.testing.assert_allclose(nat.centroid_r[i, :nv],
                                   np.asarray(ref.centroid_r)[:nv], atol=1e-4)


def test_empty_and_full():
    empty = np.zeros((16, 16), bool)
    inten = np.ones((16, 16), np.float32)
    nat, n = lnat.regions_from_packed(_pack_host(empty[None]), 16, inten[None])
    assert n[0] == 0 and not nat.valid.any()
    full = np.ones((16, 16), bool)
    nat, n = lnat.regions_from_packed(_pack_host(full[None]), 16, inten[None])
    assert n[0] == 1
    assert nat.area[0, 0] == 256 and nat.touches_border[0, 0]
    _assert_parity(full, inten, 1)
