"""Oracle tests: JAX filters vs scipy.ndimage."""

import numpy as np
import scipy.ndimage as ndi

from pylinac_tpu.ops import filters as jf


def test_gaussian1d():
    rng = np.random.default_rng(0)
    v = rng.standard_normal(500).astype(np.float32)
    for sigma in (0.8, 2.0, 5.0):
        ours = np.asarray(jf.gaussian_filter1d(v, sigma))
        ref = ndi.gaussian_filter1d(v, sigma, output=np.float32)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_gaussian2d():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((64, 80)).astype(np.float32)
    ours = np.asarray(jf.gaussian_filter(img, 2.5))
    ref = ndi.gaussian_filter(img, 2.5, output=np.float32)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_median1d():
    rng = np.random.default_rng(2)
    v = rng.standard_normal(200).astype(np.float32)
    for size in (3, 5, 7):
        ours = np.asarray(jf.median_filter(v, size))
        ref = ndi.median_filter(v, size=size)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_median2d():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((40, 50)).astype(np.float32)
    for size in (3, 5):
        ours = np.asarray(jf.median_filter(img, size))
        ref = ndi.median_filter(img, size=size)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_median_even_size():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((30, 30)).astype(np.float32)
    ours = np.asarray(jf.median_filter(img, 4))
    ref = ndi.median_filter(img, size=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_uniform():
    rng = np.random.default_rng(5)
    img = rng.standard_normal((33, 47)).astype(np.float32)
    ours = np.asarray(jf.uniform_filter(img, 5))
    ref = ndi.uniform_filter(img, size=5, output=np.float32)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sobel():
    rng = np.random.default_rng(6)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    for ax in (0, 1):
        ours = np.asarray(jf.sobel(img, axis=ax))
        ref = ndi.sobel(img, axis=ax, output=np.float32)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pallas_median3x3_parity():
    """The fused Pallas median-of-9 kernel is bit-exact vs scipy."""
    from pylinac_tpu.ops.pallas_median import median3x3, median3x3_supported

    rng = np.random.default_rng(7)
    for shape, dtype in [((57, 83), np.float32), ((96, 128), np.uint16)]:
        img = (rng.random(shape) * 1000).astype(dtype)
        assert median3x3_supported(img)
        ours = np.asarray(median3x3(img))
        ref = ndi.median_filter(img, size=3)
        assert np.array_equal(ours, ref)


def test_pallas_median3x3_gating():
    from pylinac_tpu.ops.pallas_median import median3x3_supported

    assert not median3x3_supported(np.zeros((4, 4, 4), np.float32))  # 3D
    assert not median3x3_supported(np.zeros((2048, 2048), np.float32))  # VMEM
