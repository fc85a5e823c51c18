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


# ---------------------------------------------------------------------------
# interpret-mode checks of the BATCHED pallas kernels (the platform_dependent
# TPU branch never runs on the CPU test backend; interpret mode executes the
# same kernel logic so a TPU-only semantics bug shows up here)
# ---------------------------------------------------------------------------
def _rand_masks(b, h, w, seed=0, p=0.45):
    rng = np.random.default_rng(seed)
    m = rng.random((b, h, w)) < p
    m[0] = False                      # empty instance
    m[-1] = True                      # full instance
    return m


def test_batched_pallas_label_interpret_matches_xla():
    from pylinac_tpu.ops import pallas_label as plab

    masks = _rand_masks(4, 24, 150, seed=3)
    got = np.asarray(plab.label_batched_pallas(
        jnp.asarray(masks), connectivity=1, interpret=True))
    for i in range(masks.shape[0]):
        ref = np.asarray(jlabel.label(jnp.asarray(masks[i]), connectivity=1))
        assert np.array_equal(got[i], ref), f"instance {i}"


def test_batched_pallas_holes_interpret_matches_xla():
    from pylinac_tpu.ops import pallas_label as plab
    from pylinac_tpu.ops.label import fill_holes

    masks = _rand_masks(3, 20, 140, seed=4, p=0.55)
    out = np.asarray(plab.hole_roots_batched(jnp.asarray(masks), interpret=True))
    for i in range(masks.shape[0]):
        filled = np.asarray(fill_holes(jnp.asarray(masks[i])))
        holes_ref = filled & ~masks[i]
        assert np.array_equal(out[i] >= 0, holes_ref), f"instance {i}"


def test_filled_centroid_packed_interpret_matches_xla():
    """The bit-packed Kogge-Stone flood (WL field centroids) must match the
    XLA fill+center-of-mass on fields with holes, border contact, and sizes
    that exercise multi-word columns and word-boundary crossings."""
    from pylinac_tpu.ops import pallas_label as plab
    from pylinac_tpu.ops.label import fill_holes

    rng = np.random.default_rng(5)
    cases = []
    # field with a BB-like hole, offset from center, crossing word boundary
    m = np.zeros((60, 200), bool)
    m[10:50, 30:170] = True
    m[28:33, 60:66] = False           # hole crossing the col-63/64 word edge
    cases.append(m)
    # border-touching field (flood must not leak through it)
    m = np.zeros((40, 96), bool)
    m[0:35, 0:96] = True
    m[5:8, 40:44] = False
    cases.append(m)
    # sparse noise + blob
    m = rng.random((50, 130)) < 0.3
    m[20:40, 50:100] = True
    m[25:30, 70:75] = False
    cases.append(m)
    masks = np.zeros((3, 60, 200), bool)
    for i, c in enumerate(cases):
        masks[i, :c.shape[0], :c.shape[1]] = c
    got = np.asarray(plab.filled_centroid_packed(jnp.asarray(masks),
                                                 interpret=True))
    for i in range(3):
        filled = np.asarray(fill_holes(jnp.asarray(masks[i])))
        yy, xx = np.mgrid[:60, :200]
        mass = max(filled.sum(), 1)
        ref = (float((filled * yy).sum() / mass), float((filled * xx).sum() / mass))
        assert got[i][0] == pytest.approx(ref[0], abs=1e-3), f"cy inst {i}"
        assert got[i][1] == pytest.approx(ref[1], abs=1e-3), f"cx inst {i}"


def test_flood_packed_block_shapes_are_tpu_legal():
    """The (bc, 128) output block must satisfy the TPU block rule: sublane
    dim a multiple of 8, or equal to the padded batch (single grid step).
    Round 3 regression: bc=7 from the VMEM budget crashed Mosaic lowering
    on hardware (driver bench WL FAILED)."""
    from pylinac_tpu.ops import pallas_label as plab

    for b, h, w in [(14, 768, 1024), (14, 1190, 1190), (3, 300, 400),
                    (64, 768, 1024), (100, 2048, 2048)]:
        if not plab.flood_packed_supported((h, w)):
            continue
        wwp = -(-(-(-w // 32)) // 8) * 8
        hp = max(-(-h // 128) * 128, 128)
        per = wwp * hp * 4 * 8
        bc = plab._choose_bc(b, per)  # the production block-size chooser
        bpad = -(-b // bc) * bc
        assert bc % 8 == 0 or bc == bpad, (b, h, w, bc, bpad)
        assert bc * per <= plab._FLOOD_VMEM_BUDGET  # the real invariant


def test_convex_fill_centroids_match_fill_holes_on_fields():
    """WL's default field-centroid fill (4-directional crossing test) equals
    binary_fill_holes for convex field masks, including rotated fields."""
    import scipy.ndimage as ndi

    from pylinac_tpu.winston_lutz import _convex_fill_centroids

    rng = np.random.default_rng(7)
    H, W = 120, 160
    masks = np.zeros((4, H, W), bool)
    yy, xx = np.mgrid[:H, :W]
    # axis-aligned field with a BB hole
    m = (abs(yy - 60) < 30) & (abs(xx - 80) < 45)
    m &= ~(((yy - 58) ** 2 + (xx - 78) ** 2) < 16)
    masks[0] = m
    # rotated (collimator-rotated) field with a hole
    a = np.deg2rad(20)
    u = (xx - 80) * np.cos(a) + (yy - 60) * np.sin(a)
    v = -(xx - 80) * np.sin(a) + (yy - 60) * np.cos(a)
    m = (abs(u) < 40) & (abs(v) < 25)
    m &= ~(((yy - 62) ** 2 + (xx - 84) ** 2) < 12)
    masks[1] = m
    # ellipse (cone field)
    masks[2] = ((yy - 55) / 28.0) ** 2 + ((xx - 90) / 50.0) ** 2 < 1
    # small off-center disk
    masks[3] = ((yy - 30) ** 2 + (xx - 40) ** 2) < 200
    got = np.asarray(_convex_fill_centroids(jnp.asarray(masks)))
    for i in range(4):
        filled = ndi.binary_fill_holes(masks[i])
        ref = ndi.center_of_mass(filled)
        assert got[i][0] == pytest.approx(ref[0], abs=1e-3), f"cy inst {i}"
        assert got[i][1] == pytest.approx(ref[1], abs=1e-3), f"cx inst {i}"

def test_convex_fill_centroid_divergence_bounded_on_noisy_epid_masks():
    """A noisy EPID threshold mask is only approximately convex (ragged
    edges, salt noise). Bound the batch default's (convex crossing fill)
    centroid divergence from the exact binary_fill_holes path well inside
    the WL 0.5 px detection budget (ADVICE r3: parity on non-convex masks)."""
    import scipy.ndimage as ndi

    from pylinac_tpu.winston_lutz import _convex_fill_centroids

    rng = np.random.default_rng(42)
    H, W = 384, 512
    yy, xx = np.mgrid[:H, :W]
    masks = np.zeros((3, H, W), bool)
    for i, (fw, fh, ang) in enumerate([(140, 90, 0), (110, 110, 15),
                                       (170, 60, -30)]):
        a = np.deg2rad(ang)
        u = (xx - W / 2) * np.cos(a) + (yy - H / 2) * np.sin(a)
        v = -(xx - W / 2) * np.sin(a) + (yy - H / 2) * np.cos(a)
        field = 1.0 * ((abs(u) < fw) & (abs(v) < fh))
        field = ndi.gaussian_filter(field, 3.0)          # penumbra
        field += rng.normal(0, 0.04, field.shape)        # detector noise
        # BB shadow hole near the center
        field -= 0.3 * (((yy - H / 2 - 3) ** 2 + (xx - W / 2 + 4) ** 2) < 30)
        masks[i] = field > 0.5
    got = np.asarray(_convex_fill_centroids(jnp.asarray(masks)))
    for i in range(3):
        filled = ndi.binary_fill_holes(masks[i])
        ref = ndi.center_of_mass(filled)
        # ragged-edge non-convexity moves the centroid < 0.05 px
        assert got[i][0] == pytest.approx(ref[0], abs=0.05), f"cy inst {i}"
        assert got[i][1] == pytest.approx(ref[1], abs=0.05), f"cx inst {i}"
