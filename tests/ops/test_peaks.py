"""Oracle tests: our JAX peak analysis vs scipy.signal.find_peaks."""

import numpy as np
import pytest
import scipy.signal as sps

from pylinac_tpu.ops import peaks as jpk


def _compare(v, *, rel_height=0.5, height=-np.inf, distance=1, prominence=None,
             width=0.0, K=512):
    v = np.asarray(v, dtype=np.float32)
    s_idx, s_props = sps.find_peaks(
        v, rel_height=rel_height, height=height if np.isfinite(height) else None,
        distance=distance if distance >= 1 else None,
        prominence=prominence, width=width,
    )
    res = jpk.peak_analysis(
        v, K=K, rel_height=rel_height, height=height,
        distance=float(max(distance, 1)), min_width=width,
        required_prominence=prominence,
    )
    mask = np.asarray(res.valid)
    j_idx = np.asarray(res.positions)[mask]
    np.testing.assert_array_equal(j_idx, s_idx)
    np.testing.assert_allclose(np.asarray(res.prominences)[mask], s_props["prominences"], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.left_bases)[mask], s_props["left_bases"])
    np.testing.assert_array_equal(np.asarray(res.right_bases)[mask], s_props["right_bases"])
    np.testing.assert_allclose(np.asarray(res.left_ips)[mask], s_props["left_ips"], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.right_ips)[mask], s_props["right_ips"], rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.widths)[mask], s_props["widths"], rtol=1e-4, atol=4e-3)


def test_simple_gaussian_peak():
    x = np.linspace(-5, 5, 201)
    _compare(np.exp(-x**2))


def test_noisy_multi_peak():
    rng = np.random.default_rng(42)
    x = np.linspace(0, 20, 1000)
    v = np.sin(x) + 0.1 * rng.standard_normal(1000)
    _compare(v, K=512)


def test_overflow_flag():
    rng = np.random.default_rng(42)
    v = rng.standard_normal(1000).astype(np.float32)
    res = jpk.peak_analysis(v, K=8)
    assert bool(res.overflowed)
    res = jpk.peak_analysis(v, K=512)
    assert not bool(res.overflowed)


def test_plateau_peaks():
    v = np.array([0, 1, 2, 2, 2, 1, 0, 3, 3, 0, 5, 0], dtype=float)
    _compare(v)


def test_distance_filter():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(500)
    _compare(v, distance=20, K=256)


def test_height_and_prominence():
    rng = np.random.default_rng(7)
    x = np.linspace(0, 30, 1500)
    v = np.sin(x) * np.linspace(0.5, 2, 1500) + 0.05 * rng.standard_normal(1500)
    _compare(v, height=0.3, prominence=0.5)


def test_fwxm_field_profile():
    # a field-like profile: flat top with penumbra
    x = np.linspace(-100, 100, 400)
    v = 1 / (1 + np.exp(-(x + 50))) - 1 / (1 + np.exp(-(x - 50))) + 0.001 * np.cos(x)
    _compare(v, rel_height=0.5)
    _compare(v, rel_height=0.2)
    _compare(v, rel_height=0.8)


def test_reference_wrapper_percent_threshold():
    x = np.linspace(0, 10 * np.pi, 2000)
    v = (np.sin(x) + 1.2) * 100
    idx, props = jpk.find_peaks(v, threshold=0.5, max_number=3)
    s_idx, _ = sps.find_peaks(v, height=float(v.min() + 0.5 * (v.max() - v.min())))
    assert len(idx) == 3
    assert set(idx).issubset(set(s_idx))


def test_search_region():
    x = np.linspace(0, 10 * np.pi, 1000)
    v = np.sin(x)
    idx, _ = jpk.find_peaks(v, search_region=(0.4, 0.6))
    assert all(400 <= i < 600 for i in idx)


def test_valleys():
    x = np.linspace(0, 6 * np.pi, 600)
    v = np.sin(x)
    vidx, _ = jpk.find_valleys(v)
    # valleys of sin at 3pi/2 + 2k*pi
    s_idx, _ = sps.find_peaks(-v)
    np.testing.assert_array_equal(np.sort(vidx), s_idx)
