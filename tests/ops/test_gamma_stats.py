"""Tests for gamma kernels (vs a direct numpy port of the reference
algorithms as oracle) and NPS/threshold kernels."""

import math

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from pylinac_tpu.ops import gamma as jg
from pylinac_tpu.ops import stats as js
from pylinac_tpu.ops import threshold as jt


def _oracle_gamma_2d(reference, evaluation, dose_to_agreement=1, distance_to_agreement=1,
                     gamma_cap_value=2, global_dose=True, dose_threshold=5, fill_value=np.nan):
    """Direct numpy implementation of Low 2004 Table I (same disk convention
    as the reference: radius DTA+1 exclusive)."""
    if global_dose:
        dose_ta = dose_to_agreement / 100 * reference.max()
    else:
        dose_ta = dose_to_agreement / 100 * reference
    eval_n = evaluation / dose_ta
    ref_n = reference / dose_ta
    thr = dose_threshold / 100
    dta = distance_to_agreement
    eval_p = np.pad(eval_n, dta, mode="edge")
    offs = [(dy, dx) for dy in range(-dta - 1, dta + 2) for dx in range(-dta - 1, dta + 2)
            if dy * dy + dx * dx < (dta + 1) ** 2]
    gamma = np.full(reference.shape, float(gamma_cap_value))
    for i in range(reference.shape[0]):
        for j in range(reference.shape[1]):
            rp = ref_n[i, j]
            if math.isnan(rp) or rp < thr:
                gamma[i, j] = fill_value
                continue
            best = gamma_cap_value**2
            for dy, dx in offs:
                ev = eval_p[i + dta + dy, j + dta + dx]
                d2 = (dy * dy + dx * dx) / (dta * dta) + (ev - rp) ** 2
                if not math.isnan(d2):
                    best = min(best, d2)
            gamma[i, j] = math.sqrt(best) if best < gamma_cap_value**2 else min(
                math.sqrt(best), gamma_cap_value)
    return gamma


def test_gamma_2d_identical_images():
    rng = np.random.default_rng(0)
    img = rng.random((20, 25)).astype(np.float32) * 100
    g = np.asarray(jg.gamma_2d(jnp.asarray(img), jnp.asarray(img)))
    valid = ~np.isnan(g)
    assert np.allclose(g[valid], 0)


def test_gamma_2d_vs_oracle():
    rng = np.random.default_rng(1)
    ref = rng.random((15, 18)).astype(np.float32) * 100 + 10
    ev = ref + rng.normal(0, 2, ref.shape).astype(np.float32)
    for dta in (1, 2, 3):
        ours = np.asarray(jg.gamma_2d(jnp.asarray(ref), jnp.asarray(ev),
                                      distance_to_agreement=dta))
        oracle = _oracle_gamma_2d(ref, ev, distance_to_agreement=dta)
        both_nan = np.isnan(ours) & np.isnan(oracle)
        np.testing.assert_allclose(ours[~both_nan], oracle[~both_nan], rtol=1e-4, atol=1e-4)


def test_gamma_2d_local_dose():
    rng = np.random.default_rng(2)
    ref = rng.random((12, 12)).astype(np.float32) * 50 + 50
    ev = ref * 1.01
    ours = np.asarray(jg.gamma_2d(jnp.asarray(ref), jnp.asarray(ev), global_dose=False,
                                  dose_to_agreement=2))
    oracle = _oracle_gamma_2d(ref, ev, global_dose=False, dose_to_agreement=2)
    both_nan = np.isnan(ours) & np.isnan(oracle)
    np.testing.assert_allclose(ours[~both_nan], oracle[~both_nan], rtol=1e-4, atol=1e-4)


def _oracle_gamma_1d(reference, evaluation, ref_x, eval_x, dose_to_agreement=1,
                     distance_to_agreement=1, gamma_cap_value=2, global_dose=True,
                     dose_threshold=5, resolution_factor=3, fill_value=np.nan):
    """Direct numpy port of the reference gamma_1d loop (core/gamma.py:333)."""
    from scipy.interpolate import interp1d
    threshold = reference.max() / 100 * dose_threshold
    dose_ta = dose_to_agreement / 100 * reference.max()
    f = interp1d(eval_x, evaluation, kind="linear", fill_value="extrapolate")
    gamma = []
    for rx, rp in zip(ref_x, reference):
        if rp < threshold:
            gamma.append(fill_value)
            continue
        xs = np.linspace(rx - distance_to_agreement, rx + distance_to_agreement,
                         num=int(distance_to_agreement * resolution_factor * 2 + 1))
        vals = f(xs)
        cg = []
        for ex, ev in zip(xs, vals):
            dist = abs(rx - ex)
            dose = float(rp) - float(ev)
            dta = dose_ta if global_dose else dose_to_agreement / 100 * rp
            cg.append(math.sqrt(dist**2 / distance_to_agreement**2 + dose**2 / dta**2))
        gamma.append(min(min(cg), gamma_cap_value))
    return np.asarray(gamma)


def test_gamma_1d_vs_oracle():
    x = np.linspace(0, 10, 200)
    ref = np.exp(-((x - 5) ** 2)).astype(np.float32)
    ev = np.exp(-((x - 5.05) ** 2)).astype(np.float32)
    for kwargs in (
        dict(distance_to_agreement=0.1, dose_to_agreement=1, resolution_factor=30),
        dict(distance_to_agreement=1, dose_to_agreement=2),
        dict(distance_to_agreement=1, dose_to_agreement=2, global_dose=False),
    ):
        g, _, _ = jg.gamma_1d(jnp.asarray(ref), jnp.asarray(ev),
                              reference_coordinates=jnp.asarray(x, jnp.float32),
                              evaluation_coordinates=jnp.asarray(x, jnp.float32),
                              **kwargs)
        g = np.asarray(g)
        oracle = _oracle_gamma_1d(ref, ev, x, x, **kwargs)
        both_nan = np.isnan(g) & np.isnan(oracle)
        np.testing.assert_allclose(g[~both_nan], oracle[~both_nan], rtol=1e-3, atol=1e-4)


def test_gamma_geometric_identical():
    v = np.sin(np.linspace(0, 3, 100)) + 1.5
    g = np.asarray(jg.gamma_geometric(jnp.asarray(v, jnp.float32), jnp.asarray(v, jnp.float32)))
    valid = ~np.isnan(g)
    assert np.allclose(g[valid], 0, atol=1e-5)


def test_nps_flat_noise():
    rng = np.random.default_rng(3)
    rois = rng.normal(0, 5, (8, 32, 32)).astype(np.float32)
    nps2d = np.asarray(js.noise_power_spectrum_2d(jnp.asarray(rois), pixel_size=0.5))
    # white noise: flat-ish spectrum; total power = var * px²... sanity value
    nps1d = np.asarray(js.noise_power_spectrum_1d(jnp.asarray(nps2d)))
    assert nps2d.shape == (32, 32)
    # Parseval: mean of nps2d ≈ var * pixel_size^2
    assert abs(nps2d.mean() - 25 * 0.25) / (25 * 0.25) < 0.2


def test_radial_average_matches_reference_binning():
    arr = np.random.default_rng(4).random((16, 16)).astype(np.float32)
    ours = np.asarray(js.radial_average(jnp.asarray(arr)))
    # oracle: reference implementation
    center = np.floor(np.array(arr.shape) / 2)
    y, x = np.indices(arr.shape)
    r = np.sqrt((x - center[1]) ** 2 + (y - center[0]) ** 2).astype(int)
    tbin = np.bincount(r.ravel(), arr.ravel())
    nr = np.bincount(r.ravel())
    ref = np.zeros(nr.shape)
    ref[nr != 0] = tbin[nr != 0] / nr[nr != 0]
    np.testing.assert_allclose(ours[: len(ref)], ref, rtol=1e-5, atol=1e-6)


def test_otsu_bimodal():
    rng = np.random.default_rng(5)
    img = np.concatenate([rng.normal(20, 3, 5000), rng.normal(80, 5, 3000)]).astype(np.float32)
    thr = float(jt.otsu_threshold(jnp.asarray(img)))
    # oracle: direct between-class-variance maximization over a 256-bin histogram
    hist, edges = np.histogram(img, bins=256)
    centers = (edges[:-1] + edges[1:]) / 2
    w1 = np.cumsum(hist)
    w2 = w1[-1] - w1
    mu_cum = np.cumsum(hist * centers)
    mu1 = mu_cum / np.maximum(w1, 1e-20)
    mu2 = (mu_cum[-1] - mu_cum) / np.maximum(w2, 1e-20)
    bv = np.where((w1 > 0) & (w2 > 0), w1 * w2 * (mu1 - mu2) ** 2, -np.inf)
    ref = centers[np.argmax(bv)]
    np.testing.assert_allclose(thr, ref, atol=(img.max() - img.min()) / 256)
    # the threshold separates the two modes' means
    assert 20 < thr < 80


def test_michelson_contrast():
    arr = np.array([1.0, 3.0])
    assert abs(float(js.michelson(jnp.asarray(arr))) - 0.5) < 1e-6
    assert abs(float(js.weber(jnp.asarray(3.0), jnp.asarray(2.0))) - 0.5) < 1e-6


def test_gamma2d_pallas_interpret_matches_xla():
    """The VMEM-resident pallas gamma (TPU branch of gamma_2d) must match
    the XLA offset loop exactly — run via interpret mode on CPU."""
    import numpy as np

    from pylinac_tpu.ops.gamma import _disk_offsets, gamma_2d
    from pylinac_tpu.ops.pallas_gamma import gamma2d_pallas

    rng = np.random.default_rng(11)
    for dta in (3, 5):
        ref = rng.random((40, 130)).astype(np.float32) * 100
        ev = ref + rng.normal(0, 2, ref.shape).astype(np.float32)
        ev[20, 40] = np.nan         # NaN candidate -> ignored in the min
        # whole-function comparison (normalization + core) on clean ref
        want = np.asarray(gamma_2d(jnp.asarray(ref), jnp.asarray(ev),
                                   dose_to_agreement=3.0,
                                   distance_to_agreement=dta,
                                   gamma_cap_value=2.0, global_dose=True,
                                   dose_threshold=5.0))
        dose_ta = 3.0 / 100.0 * ref.max()
        ref_n = ref / dose_ta
        eval_p = np.pad(ev / dose_ta, dta, mode="edge")
        got = np.asarray(gamma2d_pallas(jnp.asarray(ref_n), jnp.asarray(eval_p),
                                        dta=dta, cap=2.0,
                                        threshold_n=0.05, fill=np.nan,
                                        interpret=True))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6, equal_nan=True)

        # NaN-reference pixels take the fill value (core-vs-core check)
        ref_nan = ref_n.copy()
        ref_nan[5, 5] = np.nan
        min_g2 = np.full(ref.shape, 4.0, np.float32)
        for dy, dx in _disk_offsets(dta):
            sh = eval_p[dta + dy: dta + dy + ref.shape[0],
                        dta + dx: dta + dx + ref.shape[1]]
            cand = (dy * dy + dx * dx) / (dta * dta) + (sh - ref_nan) ** 2
            cand = np.where(np.isnan(cand), np.inf, cand)
            min_g2 = np.minimum(min_g2, cand)
        want2 = np.minimum(np.sqrt(min_g2), 2.0)
        want2 = np.where(np.isnan(ref_nan) | (ref_nan < 0.05), np.nan, want2)
        got2 = np.asarray(gamma2d_pallas(jnp.asarray(ref_nan), jnp.asarray(eval_p),
                                         dta=dta, cap=2.0,
                                         threshold_n=0.05, fill=np.nan,
                                         interpret=True))
        np.testing.assert_allclose(got2, want2, rtol=0, atol=2e-6, equal_nan=True)


class TestPercentileExact:
    """Sort-free order statistics must equal numpy exactly (PF's despike
    decision consumes these; ops/stats.py percentile_exact)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy_mixed_signs(self, seed):
        import jax

        from pylinac_tpu.ops.stats import order_statistics, percentile_exact

        rng = np.random.default_rng(seed)
        vals = np.concatenate([
            rng.normal(-50, 30, 4001).astype(np.float32),
            rng.normal(1000, 200, 3000).astype(np.float32),
            np.zeros(17, np.float32),          # ties at zero
            np.repeat(np.float32(3.25), 9),    # ties at a positive value
        ])
        rng.shuffle(vals)
        qs = (0.5, 25.0, 50.0, 99.5)
        got = np.asarray(percentile_exact(jnp.asarray(vals), qs))
        want = np.percentile(vals.astype(np.float64), qs)
        assert np.allclose(got, want, rtol=0, atol=2e-3), (got, want)
        # raw order stats are exact (bit-identical), not just close
        s = np.sort(vals)
        ks = [0, 1, 100, len(vals) // 2, len(vals) - 1]
        got_os = np.asarray(order_statistics(jnp.asarray(vals), ks))
        assert np.array_equal(got_os, s[ks])

    def test_vmaps_over_batch(self):
        import jax

        from pylinac_tpu.ops.stats import percentile_exact

        rng = np.random.default_rng(3)
        batch = rng.normal(0, 10, (4, 64, 64)).astype(np.float32)
        got = np.asarray(jax.vmap(
            lambda im: percentile_exact(im, (0.5, 99.5)))(jnp.asarray(batch)))
        for i in range(4):
            want = np.percentile(batch[i].astype(np.float64), (0.5, 99.5))
            assert np.allclose(got[i], want, atol=2e-3)
