"""Sharded batch/CT pipelines over the 8-virtual-device mesh."""

import numpy as np
import pytest

import jax

from pylinac_tpu.parallel import (
    QABatchRunner,
    sharded_field_analysis,
    sharded_ct_localization,
)
from pylinac_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_ct_localization_recovers_tilted_axis(mesh):
    """Phantom disk drifting linearly in x across z; the all-gathered fit
    must recover slope and intercept."""
    rng = np.random.default_rng(0)
    z_total, h, w = 16, 128, 128
    vol = np.zeros((z_total, h, w), np.float32)
    yy, xx = np.mgrid[:h, :w]
    for z in range(z_total):
        cx = 60 + 0.5 * z   # drifts right
        cy = 64.0
        vol[z] = (((yy - cy) ** 2 + (xx - cx) ** 2) < 40**2) * 1000.0
    vol += rng.normal(0, 5, vol.shape)
    fits = np.asarray(sharded_ct_localization(vol, mesh))
    # fits: (2, 2) [slope, intercept] for y then x
    assert fits[0, 0] == pytest.approx(0.0, abs=0.05)    # y slope
    assert fits[0, 1] == pytest.approx(64.0, abs=1.5)    # y intercept
    assert fits[1, 0] == pytest.approx(0.5, abs=0.05)    # x slope
    assert fits[1, 1] == pytest.approx(60.0, abs=1.5)    # x intercept


def test_batch_runner_batch_padding(mesh):
    imgs = np.random.default_rng(1).random((5, 100, 130)).astype(np.float32) * 50
    imgs[:, 30:70, 40:90] += 1000  # 50-px-wide field
    runner = QABatchRunner(mesh)
    metrics, mean_size = runner.run(imgs)
    # 5 images padded to 8 (devices) on the batch axis; results unpadded
    sizes = np.asarray(metrics["vert"]["field_size_mm"])
    assert sizes.shape[0] == 5
    # the global psum mean must exclude the 3 zero-padded images
    assert mean_size == pytest.approx(float(sizes.mean()), rel=1e-5)
    # dpmm defaults to 1 -> mm == px; vert size is along H (40-px field)
    assert mean_size == pytest.approx(40.0, abs=2)


def _make_pf_batch(n):
    """Canonical preprocessed PF arrays + device config (synthetic pickets)."""
    import jax.numpy as jnp

    from pylinac_tpu.ops.picket_pipeline import PFLeafConfig, PFParams

    rng = np.random.default_rng(3)
    H = W = 256
    imgs = np.zeros((n, H, W), np.float32)
    xx = np.arange(W)
    for i in range(n):
        prof = np.zeros(W)
        for p in range(4):
            c = 40 + p * 56 + 0.1 * i
            prof += np.exp(-0.5 * ((xx - c) / 3.0) ** 2)
        imgs[i] = prof[None, :] + rng.normal(0, 0.002, (H, W))
        imgs[i] -= imgs[i].min()
        imgs[i] /= imgs[i].max()
    tops = np.arange(8, H - 40, 24)
    cfg = PFLeafConfig(
        tops=jnp.asarray(tops, jnp.int32),
        heights=jnp.asarray(np.full(len(tops), 20), jnp.int32),
        centers_px=jnp.asarray(tops + 10, jnp.float32),
        widths_px=jnp.asarray(np.full(len(tops), 20.0), jnp.float32))
    params = PFParams(
        height_threshold=jnp.float32(0.5), edge_threshold=jnp.float32(1.5),
        required_prominence=jnp.float32(0.2), fwxm=jnp.float32(50),
        dpmm=jnp.float32(2.0), cax_col=jnp.float32(W / 2 - 0.5),
        analysis_ratio=jnp.float32(0.4), nominal_gap_px=jnp.float32(3.0))
    return imgs, cfg, params


def test_sharded_picket_fence_matches_single_device(mesh):
    """The REAL PF product kernel sharded over the mesh must bit-match the
    single-device vmapped batch."""
    import functools

    import jax.numpy as jnp

    from pylinac_tpu.ops.picket_pipeline import picket_fence_image
    from pylinac_tpu.parallel import sharded_picket_fence

    imgs, cfg, params = _make_pf_batch(8)
    static = dict(K_P=8, W_MAX=64, H_MAX=24, num_pickets=None,
                  peak_sort="peak_heights", separate_leaves=False)
    out_sharded = sharded_picket_fence(jnp.asarray(imgs), cfg, params, mesh,
                                       **static)
    single = functools.partial(picket_fence_image, cfg=cfg, params=params,
                               **static)
    out_ref = jax.jit(jax.vmap(single))(jnp.asarray(imgs))
    for key in ("errors_mm", "fits", "kiss_valid", "n_pickets"):
        assert np.allclose(np.asarray(out_sharded[key]),
                           np.asarray(out_ref[key]), atol=1e-5), key


def test_sharded_gamma_matches_unsharded(mesh):
    import jax.numpy as jnp

    from pylinac_tpu.ops.gamma import gamma_2d
    from pylinac_tpu.parallel import sharded_gamma_2d

    rng = np.random.default_rng(5)
    refs = rng.random((8, 64, 96)).astype(np.float32) * 100
    evals = refs + rng.normal(0, 1, refs.shape).astype(np.float32)
    out = sharded_gamma_2d(jnp.asarray(refs), jnp.asarray(evals), mesh,
                           dose_to_agreement=3.0, distance_to_agreement=3)
    ref0 = gamma_2d(jnp.asarray(refs[0]), jnp.asarray(evals[0]),
                    dose_to_agreement=3.0, distance_to_agreement=3)
    a, b = np.asarray(out[0]), np.asarray(ref0)
    both = ~(np.isnan(a) | np.isnan(b))
    assert np.allclose(a[both], b[both], atol=1e-5)
    assert (np.isnan(a) == np.isnan(b)).all()


def test_sharded_wl_centroids_and_3d_solve(mesh):
    """WL image-set sharding: per-image centroids from every chip, 3D shift
    solved on the gathered set (reference winston_lutz.py:3492 pipeline)."""
    import jax.numpy as jnp

    from pylinac_tpu.core.scale import MachineScale
    from pylinac_tpu.parallel import sharded_wl_centroids
    from pylinac_tpu.winston_lutz import solve_3d_shift_vector_from_2d_planes

    # synthetic 8-image set: open field centered, BB offset by (+3, -2) px
    # in-plane at gantry 0/90/180/270 x2
    H = W = 128
    yy, xx = np.mgrid[:H, :W]
    gantries = [0, 90, 180, 270] * 2
    bb_dx, bb_dy = 3.0, -2.0  # constant EPID-plane offset
    imgs = np.zeros((8, H, W), np.float32)
    for i in range(8):
        field = ((np.abs(yy - 64) < 30) & (np.abs(xx - 64) < 30)) * 1000.0
        bb = 600.0 * np.exp(-0.5 * (((yy - 64 - bb_dy) ** 2
                                     + (xx - 64 - bb_dx) ** 2) / 3.0**2))
        imgs[i] = field - bb
    cents = np.asarray(sharded_wl_centroids(jnp.asarray(imgs), mesh))
    assert cents.shape == (8, 4)
    # per-image: field at (64,64), bb at (64+dy, 64+dx)
    assert np.allclose(cents[:, 0], 64, atol=0.5)
    assert np.allclose(cents[:, 2] - cents[:, 0], bb_dy, atol=0.5)
    assert np.allclose(cents[:, 3] - cents[:, 1], bb_dx, atol=0.5)
    # 3D solve on the gathered centroids (dpmm=1 for simplicity)
    xs = cents[:, 3] - cents[:, 1]
    ys = -(cents[:, 2] - cents[:, 0])  # image rows increase downward
    shift = solve_3d_shift_vector_from_2d_planes(
        xs, ys, gantries, [0] * 8, MachineScale.IEC61217)
    # constant image-plane offset at opposing gantries: the lateral (x)
    # components cancel; the image-y offset survives as a y shift
    assert abs(shift.x) < 0.3
    assert shift.y == pytest.approx(-2.0, abs=0.3)


def test_2x4_mesh_data_axis():
    """A 2x4 mesh: data-parallel over the first axis with the second axis
    present (collectives must address the named axis only)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pylinac_tpu.parallel import sharded_field_analysis

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2d = Mesh(devices, ("data", "model"))
    imgs = np.random.default_rng(2).random((4, 64, 128)).astype(np.float32) * 10
    imgs[:, 16:48, 32:96] += 1000
    metrics, mean_width = sharded_field_analysis(jnp.asarray(imgs), mesh2d)
    widths = np.asarray(metrics["vert"]["field_size_mm"])
    assert widths.shape[0] == 4
    assert float(np.asarray(mean_width)[0]) == pytest.approx(
        float(widths.mean()), rel=1e-5)


def test_uneven_ct_shard(mesh):
    """13 slices over 8 devices: the pad slices carry zero fit weight."""
    rng = np.random.default_rng(4)
    z_total, h, w = 13, 128, 128
    vol = np.zeros((z_total, h, w), np.float32)
    yy, xx = np.mgrid[:h, :w]
    for z in range(z_total):
        cx = 58 + 0.4 * z
        vol[z] = (((yy - 64.0) ** 2 + (xx - cx) ** 2) < 40**2) * 1000.0
    vol += rng.normal(0, 5, vol.shape)
    from pylinac_tpu.parallel import sharded_ct_localization

    fits = np.asarray(sharded_ct_localization(vol, mesh))
    assert fits[1, 0] == pytest.approx(0.4, abs=0.05)
    assert fits[1, 1] == pytest.approx(58.0, abs=1.5)
