"""Oracle tests for labeling/regionprops vs scipy (+ reimplemented skimage formulas)."""

import math

import numpy as np
import scipy.ndimage as ndi

import jax.numpy as jnp

from pylinac_tpu.ops import label as jl


def _skimage_perimeter_oracle(region_mask: np.ndarray) -> float:
    """Independent reimplementation of skimage.measure.perimeter (neighborhood=4)."""
    image = region_mask.astype(np.uint8)
    strel = ndi.generate_binary_structure(2, 1)
    eroded = ndi.binary_erosion(image, strel, border_value=0)
    border = image - eroded
    weights = np.zeros(50)
    weights[[5, 7, 15, 17, 25, 27]] = 1
    weights[[21, 33]] = math.sqrt(2)
    weights[[13, 23]] = (1 + math.sqrt(2)) / 2
    conv = ndi.convolve(border, np.array([[10, 2, 10], [2, 1, 2], [10, 2, 10]]),
                        mode="constant", cval=0)
    hist = np.bincount(conv.ravel(), minlength=50)
    return float(hist[:50] @ weights)


def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2


def test_label_matches_scipy_4conn():
    rng = np.random.default_rng(0)
    mask = rng.random((60, 70)) > 0.6
    ours = np.asarray(jl.label(jnp.asarray(mask), connectivity=1))
    ref, n_ref = ndi.label(mask)  # scipy default structure = cross = 4-conn
    # same partition: bijection between label sets
    assert (ours >= 0).sum() == (ref > 0).sum()
    n_ours = len(np.unique(ours[ours >= 0]))
    assert n_ours == n_ref
    # component membership identical
    for lab_val in np.unique(ours[ours >= 0]):
        sel = ours == lab_val
        ref_vals = np.unique(ref[sel])
        assert len(ref_vals) == 1
        assert (ref == ref_vals[0]).sum() == sel.sum()


def test_label_8conn():
    mask = np.zeros((10, 10), bool)
    mask[1, 1] = True
    mask[2, 2] = True  # diagonal touch
    ours4 = np.asarray(jl.label(jnp.asarray(mask), connectivity=1))
    ours8 = np.asarray(jl.label(jnp.asarray(mask), connectivity=2))
    assert len(np.unique(ours4[ours4 >= 0])) == 2
    assert len(np.unique(ours8[ours8 >= 0])) == 1


def test_fill_holes():
    rng = np.random.default_rng(1)
    mask = _disk_mask(50, 50, 25, 25, 15) & ~_disk_mask(50, 50, 25, 25, 6)
    ours = np.asarray(jl.fill_holes(jnp.asarray(mask)))
    ref = ndi.binary_fill_holes(mask)
    np.testing.assert_array_equal(ours, ref)


def test_regionprops_basic():
    mask = np.zeros((64, 64), bool)
    mask |= _disk_mask(64, 64, 20, 15, 5)
    mask |= _disk_mask(64, 64, 45, 48, 8)
    intensity = np.random.default_rng(2).random((64, 64)).astype(np.float32) + 1.0
    regions = jl.regionprops(jnp.asarray(mask), jnp.asarray(intensity), K=8)
    valid = np.asarray(regions.valid)
    assert valid.sum() == 2
    areas = np.sort(np.asarray(regions.area)[valid])
    ref_lab, _ = ndi.label(mask)
    ref_areas = np.sort(ndi.sum_labels(np.ones_like(mask), ref_lab, [1, 2]))
    np.testing.assert_allclose(areas, ref_areas)
    # centroids
    ref_cents = ndi.center_of_mass(mask, ref_lab, [1, 2])
    ours_cents = sorted(
        zip(np.asarray(regions.centroid_r)[valid], np.asarray(regions.centroid_c)[valid])
    )
    for (orow, ocol), (rrow, rcol) in zip(ours_cents, sorted(ref_cents)):
        np.testing.assert_allclose([orow, ocol], [rrow, rcol], atol=1e-4)
    # weighted centroids
    for i in np.nonzero(valid)[0]:
        rl = ref_lab[int(np.asarray(regions.centroid_r)[i]), int(np.asarray(regions.centroid_c)[i])]
        ref_wc = ndi.center_of_mass(intensity * mask, ref_lab, rl)
        np.testing.assert_allclose(
            [np.asarray(regions.weighted_centroid_r)[i], np.asarray(regions.weighted_centroid_c)[i]],
            ref_wc, atol=1e-3)


def test_regionprops_bbox_and_border():
    mask = np.zeros((32, 32), bool)
    mask[5:10, 7:15] = True      # interior rect
    mask[0:4, 0:4] = True        # touches border
    regions = jl.regionprops(jnp.asarray(mask), K=4)
    valid = np.asarray(regions.valid)
    assert valid.sum() == 2
    idx_by_area = np.argsort(np.asarray(regions.area_filled)[valid])
    sel = np.nonzero(valid)[0]
    # the rect: bbox (5,7,10,15) — skimage half-open
    rect_i = sel[np.asarray(regions.bbox_rmin)[sel] == 5][0]
    assert np.asarray(regions.bbox_rmin)[rect_i] == 5
    assert np.asarray(regions.bbox_cmin)[rect_i] == 7
    assert np.asarray(regions.bbox_rmax)[rect_i] == 10
    assert np.asarray(regions.bbox_cmax)[rect_i] == 15
    assert not np.asarray(regions.touches_border)[rect_i]
    corner_i = sel[np.asarray(regions.bbox_rmin)[sel] == 0][0]
    assert np.asarray(regions.touches_border)[corner_i]
    cleared = jl.clear_border(regions)
    assert np.asarray(cleared.valid).sum() == 1


def test_perimeter_matches_skimage_formula():
    for maker in (
        lambda: np.pad(np.ones((8, 12), bool), 3),
        lambda: np.pad(_disk_mask(30, 30, 15, 15, 9), 2),
    ):
        mask = maker()
        regions = jl.regionprops(jnp.asarray(mask), K=4)
        valid = np.asarray(regions.valid)
        ours = np.asarray(regions.perimeter)[valid][0]
        ref = _skimage_perimeter_oracle(mask)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_solidity_disk_vs_spiculated():
    disk = _disk_mask(40, 40, 20, 20, 10)
    regions = jl.regionprops(jnp.asarray(disk), K=4)
    v = np.asarray(regions.valid)
    sol_disk = float(np.asarray(regions.solidity)[v][0])
    assert sol_disk > 0.93
    # plus-sign/spiculated shape: low solidity
    plus = np.zeros((41, 41), bool)
    plus[18:23, 2:39] = True
    plus[2:39, 18:23] = True
    regions2 = jl.regionprops(jnp.asarray(plus), K=4)
    v2 = np.asarray(regions2.valid)
    sol_plus = float(np.asarray(regions2.solidity)[v2][0])
    assert sol_plus < 0.75
    # oracle: exact convex hull pixel count
    from scipy.spatial import ConvexHull, Delaunay
    pts = np.argwhere(plus)
    hull = Delaunay(pts[ConvexHull(pts).vertices])
    yy, xx = np.mgrid[:41, :41]
    inside = hull.find_simplex(np.stack([yy.ravel(), xx.ravel()], 1)) >= 0
    exact_sol = plus.sum() / inside.sum()
    np.testing.assert_allclose(sol_plus, exact_sol, atol=0.08)


def test_filled_vs_unfilled_area():
    ring = _disk_mask(50, 50, 25, 25, 15) & ~_disk_mask(50, 50, 25, 25, 6)
    regions = jl.regionprops(jnp.asarray(ring), K=4, fill=True)
    v = np.asarray(regions.valid)
    assert v.sum() == 1
    area = float(np.asarray(regions.area)[v][0])
    filled = float(np.asarray(regions.area_filled)[v][0])
    assert area == ring.sum()
    assert filled == ndi.binary_fill_holes(ring).sum()


def test_spiral_labeling_converges():
    # a long spiral is the worst case for propagation labeling
    mask = np.zeros((64, 64), bool)
    y, x = 32, 32
    step = 1
    mask[32, 32] = True
    dirs = [(0, 1), (1, 0), (0, -1), (-1, 0)]
    d = 0
    while step < 30:
        for _ in range(2):
            dy, dx = dirs[d % 4]
            for _ in range(step):
                y += dy; x += dx
                if 0 <= y < 64 and 0 <= x < 64:
                    mask[y, x] = True
            d += 1
        step += 2
    ours = np.asarray(jl.label(jnp.asarray(mask), connectivity=1, max_iter=128))
    ref, n = ndi.label(mask)
    assert len(np.unique(ours[ours >= 0])) == n


def test_regions_to_host_matches_per_field_pull():
    """Packed bulk transfer preserves values and dtypes of every field."""
    import jax.numpy as jnp

    from pylinac_tpu.ops import label as jl

    mask = np.zeros((32, 32), bool)
    mask[5:12, 6:15] = True
    mask[20:25, 20:24] = True
    img = np.random.default_rng(0).random((32, 32)).astype(np.float32)
    r = jl.regionprops(jnp.asarray(mask), jnp.asarray(img), K=8,
                       connectivity=1, fill=True)
    direct = jl.Regions(*[np.asarray(f) for f in r])
    packed = jl.regions_to_host(r)
    for name, a, b in zip(jl.Regions._fields, direct, packed):
        assert a.dtype == b.dtype, name
        if name.startswith("bbox"):
            # invalid-slot int sentinels are clamped in the packed path;
            # only valid slots are meaningful
            a, b = a[direct.valid], b[packed.valid]
        assert np.allclose(a, b), name


def test_find_features_batched_matches_sequential():
    from pylinac_tpu.metrics.features import is_right_size_bb, is_round, is_solid
    from pylinac_tpu.metrics.utils import find_features

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[:128, :128]
    img = np.full((128, 128), 100.0)
    for cy, cx in [(40, 40), (40, 90), (90, 64)]:
        img += 900 * (((yy - cy) ** 2 + (xx - cx) ** 2) < 4**2)
    img += rng.normal(0, 5, img.shape)
    conds = [is_round, is_right_size_bb, is_solid]

    def run(batch):
        pts, _b, _r = find_features(
            img, 0, 0, 3, np.inf, dpmm=1.0, detection_conditions=conds,
            radius_mm=4, radius_tolerance_mm=2.0, min_separation_mm=10,
            batch_thresholds=batch)
        return [(p.x, p.y) for p in pts]

    seq = run(False)
    bat = run(True)
    assert len(seq) == 3
    assert np.allclose(sorted(seq), sorted(bat))


def test_hole_assignment_matmul_matches_gather(monkeypatch):
    """The gather-free (matmul) hole-assignment backend — the TPU route —
    must reproduce the CPU gather route's area_filled exactly, including a
    separate region sitting inside another region's hole (the WL BB case)
    and random noisy masks."""
    rng = np.random.default_rng(3)
    cases = []
    ring_bb = _disk_mask(60, 60, 30, 30, 20) & ~_disk_mask(60, 60, 30, 30, 12)
    ring_bb |= _disk_mask(60, 60, 30, 30, 4)  # BB inside the ring's hole
    cases.append(ring_bb)
    blob = _disk_mask(50, 50, 25, 25, 15) & ~_disk_mask(50, 50, 20, 25, 4)
    blob &= ~_disk_mask(50, 50, 32, 28, 3)    # two holes, one region
    cases.append(blob)
    for _ in range(4):
        cases.append(rng.random((48, 56)) > 0.62)  # many regions + holes

    for mask in cases:
        dev = jnp.asarray(mask)
        base = jl.regionprops(dev, K=16, connectivity=1, fill=True)
        jl.regionprops.clear_cache()
        monkeypatch.setenv("PYLINAC_TPU_HOLES", "matmul")
        try:
            alt = jl.regionprops(dev, K=16, connectivity=1, fill=True)
        finally:
            monkeypatch.delenv("PYLINAC_TPU_HOLES")
            jl.regionprops.clear_cache()
        np.testing.assert_array_equal(np.asarray(base.valid), np.asarray(alt.valid))
        np.testing.assert_allclose(np.asarray(base.area_filled),
                                   np.asarray(alt.area_filled))
        np.testing.assert_allclose(np.asarray(base.area), np.asarray(alt.area))
