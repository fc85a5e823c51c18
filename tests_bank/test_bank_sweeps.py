"""Randomized parameter-sweep banks (VERDICT r2 #10).

The reference's ``tests_bank`` runs every module over large datasets with a
pass/fail-only DataBankMixin (``/root/reference/tests_basic/utils.py:345``);
its data banks are network-gated here, so these sweeps draw randomized
scenarios from ``imggen`` instead — random field sizes, offsets, spacings,
rotations, noise — and assert only that each analysis completes and lands
within the physical tolerance implied by the generated ground truth.

Kept OUT of ``tests/`` (mirroring the reference's tests_basic/tests_bank
split) so the unit suite stays fast. Run with::

    JAX_PLATFORMS=cpu python -m pytest tests_bank/ -q

Counts are sized so the full bank finishes in a few minutes on one core;
each case is an independent scenario (batched dispatch where the module has
a Batch API).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np
import pytest

from pylinac_tpu.imggen.layers import (
    FilteredFieldLayer,
    GaussianFilterLayer,
    PerfectFieldLayer,
)
from pylinac_tpu.imggen.simulators import AS500Image, AS1000Image
from pylinac_tpu.imggen.utils import generate_picketfence, generate_winstonlutz

RNG = np.random.default_rng(20260817)


# ---------------------------------------------------------------------------
# FieldAnalysis: 200 randomized open fields, one batched dispatch
# ---------------------------------------------------------------------------
def test_field_analysis_bank():
    from pylinac_tpu.field_analysis import FieldAnalysisBatch

    n = 200
    tmp = Path(tempfile.mkdtemp())
    sizes = RNG.uniform(40, 200, size=(n, 2)).round(1)
    paths = []
    for i, (w_mm, h_mm) in enumerate(sizes):
        sim = AS1000Image(sid=1000)
        sim.add_layer(FilteredFieldLayer(field_size_mm=(float(w_mm), float(h_mm))))
        sim.add_layer(GaussianFilterLayer(sigma_mm=1))
        p = str(tmp / f"f{i}.dcm")
        sim.generate_dicom(p)
        paths.append(p)
    batch = FieldAnalysisBatch(paths)
    batch.analyze(edge_detection_method="Inflection Derivative")
    results = batch.results_data()
    bad = []
    for i, r in enumerate(results):
        dv = abs(float(r.field_size_vertical_mm) - sizes[i][0])
        dh = abs(float(r.field_size_horizontal_mm) - sizes[i][1])
        if dv > 1.0 or dh > 1.0:
            bad.append((i, sizes[i], dv, dh))
    assert not bad, f"{len(bad)}/{n} failed: {bad[:5]}"


# ---------------------------------------------------------------------------
# PicketFence: 32 randomized spacings/widths with a per-leaf injected error
# (a whole-picket offset fits its own line and scores zero error — the
# reference injects per-leaf errors too, docs/source/picketfence.rst:455)
# ---------------------------------------------------------------------------
def test_picket_fence_bank():
    import scipy.ndimage as ndi

    from pylinac_tpu.picketfence import PicketFenceBatch

    n = 32
    tmp = Path(tempfile.mkdtemp())
    spacings = RNG.integers(15, 31, n)
    widths = RNG.integers(2, 6, n)
    errors = RNG.uniform(0.25, 0.45, n).round(3)
    paths = []
    for i in range(n):
        p = str(tmp / f"pf{i}.dcm")
        generate_picketfence(
            simulator=AS500Image(sid=1500), field_layer=PerfectFieldLayer,
            file_out=p, final_layers=[GaussianFilterLayer(sigma_mm=1)],
            pickets=5, picket_spacing_mm=int(spacings[i]),
            picket_width_mm=int(widths[i]))
        paths.append(p)
    bad = []
    for i, p in enumerate(paths):
        batch = PicketFenceBatch([p], crop_mm=3)
        img = batch.images[0]
        dpmm = float(img.dpmm)
        h = img.array.shape[0]
        # shift ONE full leaf window sideways by the injected error — a
        # partial-window shift is (correctly) voted out by the per-leaf
        # median profile, and a whole-picket shift fits its own line
        cfg, leaf_nums, _ = batch._leaf_config(h, dpmm, 0.4)
        tops, heights = np.asarray(cfg.tops), np.asarray(cfg.heights)
        li = int(np.argmin(np.abs(tops + heights / 2 - h / 2)))
        band = slice(int(tops[li]), int(tops[li] + heights[li]))
        shifted = ndi.shift(img.array[band].astype(np.float64),
                            (0, errors[i] * dpmm), order=1, mode="nearest")
        img.array[band] = np.clip(shifted, 0, 65535).astype(img.array.dtype)
        batch.analyze(tolerance=0.5)
        r = batch.results_data()[0]
        if abs(float(r.max_error_mm) - errors[i]) > 0.15:
            bad.append((i, float(errors[i]), float(r.max_error_mm)))
    assert not bad, f"{len(bad)}/{n} failed: {bad[:5]}"


# ---------------------------------------------------------------------------
# Starshot: 32 randomized spoke counts / angles / centers / noise
# ---------------------------------------------------------------------------
def test_starshot_bank():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tests.models.test_starshot import make_starshot

    from pylinac_tpu.starshot import StarshotBatch

    n = 32
    tmp = Path(tempfile.mkdtemp())
    params, paths = [], []
    for i in range(n):
        n_spokes = int(RNG.integers(4, 10))
        off = float(RNG.uniform(0, 35))
        cx = int(RNG.integers(460, 560))
        cy = int(RNG.integers(480, 560))
        noise = float(RNG.uniform(0, 20))
        d = tmp / f"s{i}"
        d.mkdir()
        paths.append(make_starshot(d, center=(cx, cy), n_spokes=n_spokes,
                                   angles_offset=off, noise=noise))
        params.append((cx, cy))
    batch = StarshotBatch(paths)
    batch.analyze()
    results = batch.results_data()
    bad = []
    for i, r in enumerate(results):
        mx, my = r.circle_center_x_y
        dx, dy = abs(mx - params[i][0]), abs(my - params[i][1])
        if dx > 1.5 or dy > 1.5 or r.circle_diameter_mm > 0.7:
            bad.append((i, params[i], (mx, my), r.circle_diameter_mm))
    assert not bad, f"{len(bad)}/{n} failed: {bad[:5]}"


# ---------------------------------------------------------------------------
# WinstonLutz: 6 randomized BB offsets x 8-image sessions
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", range(6))
def test_winston_lutz_bank(seed):
    from pylinac_tpu.winston_lutz import WinstonLutz

    rng = np.random.default_rng(seed)
    left, up = rng.uniform(-2, 2, 2).round(2)
    tmp = tempfile.mkdtemp()
    axes = [(g, c, 0) for g in (0, 90, 180, 270) for c in (0, 90)]
    generate_winstonlutz(
        simulator=AS1000Image(sid=1000), field_layer=PerfectFieldLayer,
        final_layers=[GaussianFilterLayer(sigma_mm=1)], dir_out=tmp,
        image_axes=axes, offset_mm_left=float(left), offset_mm_up=float(up))
    wl = WinstonLutz(tmp)
    wl.analyze()
    r = wl.results_data()
    # a pure translation must be recovered by the shift vector (module
    # convention: x follows the generator's LEFT offset, z corrects UP —
    # same as the analytic cases in tests/models/test_winston_lutz.py)
    v = wl.bb_shift_vector
    assert abs(v.x - left) < 0.3
    assert abs(v.z + up) < 0.3
    assert r.max_2d_cax_to_bb_mm < np.hypot(left, up) + 0.3


# ---------------------------------------------------------------------------
# CatPhan: 3 randomized rolls / noise levels
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", range(3))
def test_catphan_bank(seed):
    from pylinac_tpu.ct import CatPhan504
    from pylinac_tpu.imggen.ct import generate_catphan504

    rng = np.random.default_rng(100 + seed)
    roll = float(rng.uniform(-1.5, 1.5))
    noise = float(rng.uniform(2, 8))
    tmp = tempfile.mkdtemp()
    # 60 slices: the module offsets span ~11 cm, and the scan-extent check
    # (ct.py:1239) rejects anything shorter
    generate_catphan504(tmp, num_slices=60, slice_thickness_mm=2.5,
                        roll_deg=roll, noise_hu=noise, seed=100 + seed)
    ct = CatPhan504(tmp)
    ct.analyze()
    res = ct.results_data()
    assert abs(ct.catphan_roll - roll) < 0.35
    assert abs(res.ctp404.measured_slice_thickness_mm - 2.5) < 0.6
    assert abs(res.ctp404.hu_rois["Air"].value - (-1000)) < 40
    assert abs(res.ctp404.hu_rois["Teflon"].value - 990) < 45
