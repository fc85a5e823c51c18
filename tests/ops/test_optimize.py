import numpy as np
import scipy.optimize as sopt

import jax.numpy as jnp

from pylinac_tpu.ops import optimize as jopt


def test_nelder_mead_quadratic():
    def f(x):
        return (x[0] - 3.0) ** 2 + 2 * (x[1] + 1.0) ** 2

    x, fx = jopt.nelder_mead(f, jnp.array([0.0, 0.0]), max_iter=400)
    ref = sopt.minimize(lambda v: (v[0] - 3) ** 2 + 2 * (v[1] + 1) ** 2,
                        [0.0, 0.0], method="Nelder-Mead")
    np.testing.assert_allclose(np.asarray(x), ref.x, atol=2e-3)


def test_nelder_mead_rosenbrock():
    def f(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    x, fx = jopt.nelder_mead(f, jnp.array([-1.0, 1.0]), max_iter=1000)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=5e-3)


def test_nelder_mead_minimax_wobble_like():
    # minimize the max distance to a set of lines through a common point —
    # the starshot objective shape
    rng = np.random.default_rng(0)
    angles = rng.uniform(0, np.pi, 8)
    true_c = np.array([2.0, -1.5])
    # lines through true_c with given angles: distance of p to each line
    n_vecs = np.stack([-np.sin(angles), np.cos(angles)], axis=1)

    def f(p):
        d = jnp.abs((p[None, :] - true_c[None, :]) @ n_vecs.T)
        return jnp.max(d)

    x, fx = jopt.nelder_mead(f, jnp.array([0.0, 0.0]), max_iter=500)
    np.testing.assert_allclose(np.asarray(x), true_c, atol=1e-3)
    assert float(fx) < 1e-3


def test_hill_fit_roundtrip():
    x = np.linspace(5, 15, 60)
    true = (10.0, 110.0, 10.3, 18.0)
    y = true[0] + (true[1] - true[0]) / (1 + (true[2] / x) ** true[3])
    p = np.asarray(jopt.hill_fit(x, y))
    np.testing.assert_allclose(p, true, rtol=1e-3)
    infl = float(jopt.hill_inflection(jnp.asarray(p)))
    ref_infl = true[2] * ((true[3] - 1) / (true[3] + 1)) ** (1 / true[3])
    np.testing.assert_allclose(infl, ref_infl, rtol=1e-3)


def test_hill_fit_vs_scipy_noisy():
    rng = np.random.default_rng(3)
    x = np.linspace(5, 15, 80)
    y = 20 + 80 / (1 + (9.7 / x) ** 14.0) + rng.normal(0, 0.5, 80)

    def hill(xx, a, b, c, d):
        return a + (b - a) / (1 + (c / xx) ** d)

    p_scipy, _ = sopt.curve_fit(
        hill, x, y, p0=[y.min(), y.max(), x[len(x) // 2], 10.0], maxfev=10000
    )
    p_ours = np.asarray(jopt.hill_fit(x, y))
    # both should model the data equally well
    np.testing.assert_allclose(
        hill(x, *p_ours), hill(x, *p_scipy), atol=0.3
    )


def test_gaussian_fit():
    x = np.linspace(-10, 10, 101)
    y = 5.0 * np.exp(-0.5 * ((x - 1.2) / 2.3) ** 2) + 0.7
    p = np.asarray(jopt.gaussian_fit_1d(x, y))
    np.testing.assert_allclose(p, [5.0, 1.2, 2.3, 0.7], rtol=1e-3, atol=1e-3)
