"""Oracle tests: interpolation kernels vs scipy."""

import numpy as np
import scipy.ndimage as ndi
from scipy.interpolate import interp1d

from pylinac_tpu.ops import interp as ji


def test_spline_filter1d():
    rng = np.random.default_rng(0)
    v = rng.standard_normal(100).astype(np.float32)
    ours = np.asarray(ji.spline_filter1d(v))
    ref = ndi.spline_filter1d(v, order=3, mode="mirror", output=np.float32)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_zoom_order3():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(200).astype(np.float32)
    for factor in (10, 2.5, 0.5):
        ours = np.asarray(ji.zoom1d(v, factor, order=3))
        ref = ndi.zoom(v, factor, order=3, grid_mode=False, mode="nearest")
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def test_zoom_order1():
    v = np.sin(np.linspace(0, 10, 100)).astype(np.float32)
    ours = np.asarray(ji.zoom1d(v, 10, order=1))
    ref = ndi.zoom(v, 10, order=1, grid_mode=False, mode="nearest")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_cubic_spline_interp():
    rng = np.random.default_rng(2)
    xp = np.sort(rng.uniform(0, 10, 25)).astype(np.float64)
    fp = np.cos(xp) + 0.1 * rng.standard_normal(25)
    x = np.linspace(xp[0], xp[-1], 500)
    ours = np.asarray(ji.cubic_spline_interp(xp, fp, x))
    ref = interp1d(xp, fp, kind="cubic")(x)
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


def test_cubic_spline_uniform():
    xp = np.arange(50, dtype=float)
    fp = np.sin(xp / 5)
    x = np.linspace(0, 49, 777)
    ours = np.asarray(ji.cubic_spline_interp(xp, fp, x))
    ref = interp1d(xp, fp, kind="cubic")(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_map_coordinates_orders():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((50, 60)).astype(np.float32)
    coords = np.stack([
        rng.uniform(0, 49, 200),
        rng.uniform(0, 59, 200),
    ]).astype(np.float32)
    ours = np.asarray(ji.map_coordinates(img, coords, order=1))
    ref = ndi.map_coordinates(img, coords, order=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
