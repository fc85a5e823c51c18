"""Deterministic optimizers in pure JAX (jit/vmap-friendly).

Replaces the reference's scipy.optimize surface:

* :func:`nelder_mead` — simplex minimizer with scipy's initial-simplex and
  termination semantics (used by Starshot wobble search, ``starshot.py:390``,
  and Winston-Lutz iso-size search, ``winston_lutz.py:1638``).
* :func:`levenberg_marquardt` — damped least squares (scipy ``curve_fit``
  equivalent; used by Hill fits, ``core/hill.py:22``, and NM gaussians).
* :func:`hill_fit` — the 4-parameter sigmoid fit.

All loops are ``lax.while_loop``/``fori_loop`` with static bounds so the
optimizers can run *inside* jitted/vmapped pipelines (e.g. one Nelder-Mead
per image across a batch).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def nelder_mead(
    f: Callable,
    x0: jnp.ndarray,
    xatol: float = 1e-4,
    fatol: float = 1e-4,
    max_iter: int = 200,
    nonzdelt: float = 0.05,
    zdelt: float = 0.00025,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nelder-Mead simplex minimization (scipy initial simplex + tolerances).

    Returns (x_best, f_best). ``f`` maps (n,) -> scalar and must be jax-traceable.
    """
    x0 = jnp.asarray(x0, jnp.float32)
    n = x0.shape[0]
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    # scipy initial simplex
    pts = [x0]
    for k in range(n):
        y = x0.at[k].set(jnp.where(x0[k] != 0, x0[k] * (1 + nonzdelt), zdelt))
        pts.append(y)
    sim = jnp.stack(pts)  # (n+1, n)
    fsim = jax.vmap(f)(sim)

    def sort_simplex(sim, fsim):
        order = jnp.argsort(fsim, stable=True)
        return sim[order], fsim[order]

    sim, fsim = sort_simplex(sim, fsim)

    def cond(state):
        i, sim, fsim = state
        xtol_ok = jnp.max(jnp.abs(sim[1:] - sim[0])) <= xatol
        ftol_ok = jnp.max(jnp.abs(fsim[0] - fsim[1:])) <= fatol
        return (i < max_iter) & ~(xtol_ok & ftol_ok)

    def body(state):
        i, sim, fsim = state
        xbar = jnp.mean(sim[:-1], axis=0)
        xr = (1 + rho) * xbar - rho * sim[-1]
        fxr = f(xr)

        xe = (1 + rho * chi) * xbar - rho * chi * sim[-1]
        fxe = f(xe)
        xc = (1 + psi * rho) * xbar - psi * rho * sim[-1]
        fxc = f(xc)
        xcc = (1 - psi) * xbar + psi * sim[-1]
        fxcc = f(xcc)

        # decision tree (scipy logic) expressed with jnp.where
        use_expand = (fxr < fsim[0]) & (fxe < fxr)
        use_reflect = ((fxr < fsim[0]) & (fxe >= fxr)) | (
            (fxr >= fsim[0]) & (fxr < fsim[-2])
        )
        use_contract_out = (fxr >= fsim[-2]) & (fxr < fsim[-1]) & (fxc <= fxr)
        use_contract_in = (fxr >= fsim[-2]) & (fxr >= fsim[-1]) & (fxcc < fsim[-1])
        did_replace = use_expand | use_reflect | use_contract_out | use_contract_in

        new_pt = jnp.where(
            use_expand, xe,
            jnp.where(use_reflect, xr,
                      jnp.where(use_contract_out, xc, xcc)))
        new_f = jnp.where(
            use_expand, fxe,
            jnp.where(use_reflect, fxr,
                      jnp.where(use_contract_out, fxc, fxcc)))

        sim_replaced = sim.at[-1].set(new_pt)
        fsim_replaced = fsim.at[-1].set(new_f)

        # shrink when no acceptable point was found
        sim_shrunk = sim[0] + sigma * (sim - sim[0])
        fsim_shrunk = jax.vmap(f)(sim_shrunk)

        sim_next = jnp.where(did_replace, sim_replaced, sim_shrunk)
        fsim_next = jnp.where(did_replace, fsim_replaced, fsim_shrunk)
        sim_next, fsim_next = sort_simplex(sim_next, fsim_next)
        return i + 1, sim_next, fsim_next

    _, sim, fsim = jax.lax.while_loop(cond, body, (0, sim, fsim))
    return sim[0], fsim[0]


def levenberg_marquardt(
    residual_fn: Callable,
    p0: jnp.ndarray,
    n_iter: int = 50,
    lambda0: float = 1e-3,
) -> jnp.ndarray:
    """Damped least-squares. ``residual_fn(p) -> (m,)`` residual vector.

    Fixed-iteration LM with multiplicative damping adaptation — a
    deterministic, jittable equivalent of scipy.curve_fit's default method
    for the small (≤5-param) fits QA uses.
    """
    p0 = jnp.asarray(p0, jnp.float32)

    def step(state, _):
        p, lam = state
        r = residual_fn(p)
        J = jax.jacfwd(residual_fn)(p)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-12)
        dp = jnp.linalg.solve(A, g)
        p_new = p - dp
        cost_old = jnp.sum(r * r)
        r_new = residual_fn(p_new)
        cost_new = jnp.sum(r_new * r_new)
        improved = cost_new < cost_old
        p = jnp.where(improved, p_new, p)
        lam = jnp.where(improved, lam * 0.3, lam * 3.0)
        lam = jnp.clip(lam, 1e-10, 1e10)
        return (p, lam), None

    (p, _), _ = jax.lax.scan(step, (p0, jnp.float32(lambda0)), None, length=n_iter)
    return p


def hill_func(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """4-param sigmoid a + (b-a) / (1 + (c/x)**d) (reference ``core/hill.py:68``)."""
    return a + (b - a) / (1.0 + (c / x) ** d)


def hill_fit(x: jnp.ndarray, y: jnp.ndarray, n_iter: int = 60) -> jnp.ndarray:
    """Fit the 4-param Hill sigmoid; returns params (a, b, c, d).

    Initial guess mirrors the reference (``core/hill.py:22``): a=min, b=max,
    c=mid-x, d=±10 by slope direction.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    slope_up = y[-1] > y[0]
    p0 = jnp.stack([
        jnp.min(y), jnp.max(y), x[x.shape[0] // 2],
        jnp.where(slope_up, 10.0, -10.0),
    ])

    def residual(p):
        return hill_func(x, p[0], p[1], p[2], p[3]) - y

    return levenberg_marquardt(residual, p0, n_iter=n_iter)


def hill_inflection(params: jnp.ndarray) -> jnp.ndarray:
    """Analytic inflection x of the Hill sigmoid (reference ``core/hill.py:31``)."""
    c, d = params[2], params[3]
    return c * ((d - 1.0) / (d + 1.0)) ** (1.0 / d)


def hill_gradient(params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """dy/dx of the Hill function at x."""
    return jax.grad(lambda xx: hill_func(xx, params[0], params[1], params[2], params[3]))(x)


def hill_x_at_y(params: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the Hill function (reference ``core/hill.py:55``)."""
    a, b, c, d = params[0], params[1], params[2], params[3]
    return c * ((y - a) / (b - y)) ** (1.0 / d)


def gaussian_fit_1d(x: jnp.ndarray, y: jnp.ndarray, n_iter: int = 50) -> jnp.ndarray:
    """Fit A*exp(-(x-mu)^2/(2 sig^2)) + B; returns (A, mu, sig, B).

    Used by the nuclear-medicine tomographic resolution module
    (reference ``nuclear.py:834-871``).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    A0 = jnp.max(y) - jnp.min(y)
    mu0 = x[jnp.argmax(y)]
    sig0 = (x[-1] - x[0]) / 6.0
    B0 = jnp.min(y)
    p0 = jnp.stack([A0, mu0, sig0, B0])

    def residual(p):
        return p[0] * jnp.exp(-0.5 * ((x - p[1]) / p[2]) ** 2) + p[3] - y

    return levenberg_marquardt(residual, p0, n_iter=n_iter)
