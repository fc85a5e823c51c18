"""Compile sweep: every public ops kernel must trace under jax.jit (and,
for per-image/per-profile kernels, under vmap).

Guards against host-only control flow sneaking into the device path — the
round-1 gamma_geometric bug (`bool()` on a traced array) would have been
caught here.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pylinac_tpu.ops import (
    edges,
    filters,
    fluence,
    gamma,
    interp,
    label,
    morphology,
    optimize,
    peaks,
    stats,
    threshold,
    vesselness,
)

RNG = np.random.default_rng(42)
IMG = jnp.asarray(RNG.random((64, 80), np.float32) * 100)
MASK = jnp.asarray(IMG > 60)
PROF = jnp.asarray(
    np.exp(-((np.arange(128) - 64.0) ** 2) / 300).astype(np.float32) * 50
    + RNG.random(128).astype(np.float32)
)
X1D = jnp.linspace(0.0, 10.0, 64)


def _quad(p):
    return jnp.sum((p - 2.0) ** 2)


# (name, fn with static args bound, dynamic array args, vmap axes or None)
CASES = [
    ("gamma_2d", functools.partial(gamma.gamma_2d, distance_to_agreement=2),
     (IMG, IMG * 1.01), (0, 0)),
    ("gamma_1d", gamma.gamma_1d, (PROF, PROF * 1.01), (0, 0)),
    ("gamma_geometric", gamma.gamma_geometric, (PROF, PROF * 1.01), (0, 0)),
    ("gamma_geometric_desc",
     lambda r, e, rc, ec: gamma.gamma_geometric(r, e, rc, ec),
     (PROF, PROF * 1.01, -jnp.arange(128.0), -jnp.arange(128.0)), None),
    ("gamma_bakai", functools.partial(gamma.gamma_bakai, dpmm=1.0),
     (IMG, IMG * 1.01), (0, 0)),
    ("gaussian_filter", functools.partial(filters.gaussian_filter, sigma=1.5),
     (IMG,), (0,)),
    ("median_filter", functools.partial(filters.median_filter, size=3),
     (IMG,), (0,)),
    ("uniform_filter", functools.partial(filters.uniform_filter, size=3),
     (IMG,), (0,)),
    ("sobel", filters.sobel, (IMG,), (0,)),
    ("scharr", filters.scharr, (IMG,), (0,)),
    ("canny", functools.partial(edges.canny, sigma=1.0), (IMG,), None),
    ("frangi", functools.partial(vesselness.frangi, sigmas=(1.0, 2.0)),
     (IMG,), None),
    ("map_coordinates_lin",
     functools.partial(interp.map_coordinates, order=1),
     (IMG, jnp.stack([jnp.linspace(1, 60, 50), jnp.linspace(1, 70, 50)])),
     None),
    ("cubic_spline_interp", interp.cubic_spline_interp,
     (X1D, jnp.sin(X1D), jnp.linspace(0.5, 9.5, 40)), None),
    ("label", label.label, (MASK,), None),
    ("fill_holes", label.fill_holes, (MASK,), None),
    ("regionprops", functools.partial(label.regionprops, K=8),
     (MASK, IMG), None),
    ("isotropic_erosion",
     functools.partial(morphology.isotropic_erosion, radius=2.0),
     (MASK,), None),
    ("find_boundaries", morphology.find_boundaries, (MASK,), None),
    ("remove_small_objects",
     functools.partial(morphology.remove_small_objects, min_size=8),
     (MASK,), None),
    ("peak_analysis", functools.partial(peaks.peak_analysis, K=8),
     (PROF,), (0,)),
    ("fwhm_center", peaks.fwhm_center, (PROF,), (0,)),
    ("fwxm_edges", peaks.fwxm_edges, (PROF,), (0,)),
    ("otsu_threshold", threshold.otsu_threshold, (IMG,), (0,)),
    ("percentile", functools.partial(threshold.percentile, q=80.0),
     (IMG,), (0,)),
    ("michelson", stats.michelson, (PROF,), (0,)),
    ("rms", stats.rms, (PROF,), (0,)),
    ("nps_2d", functools.partial(stats.noise_power_spectrum_2d, pixel_size=0.5),
     (jnp.asarray(RNG.random((4, 32, 32), np.float32)),), None),
    ("radial_average", stats.radial_average, (IMG[:64, :64],), None),
    ("esf_to_mtf", stats.esf_to_mtf, (PROF,), (0,)),
    ("hill_fit", optimize.hill_fit,
     (X1D, 1 / (1 + jnp.exp(-(X1D - 5.0)))), None),
    ("gaussian_fit_1d", optimize.gaussian_fit_1d,
     (X1D, jnp.exp(-((X1D - 5.0) ** 2))), None),
    ("nelder_mead", functools.partial(optimize.nelder_mead, _quad),
     (jnp.zeros(3),), None),
    ("interval_fluence",
     functools.partial(fluence.interval_fluence, width=64),
     (jnp.zeros((4, 6), jnp.int32), jnp.full((4, 6), 20, jnp.int32),
      jnp.ones(6, jnp.float32), jnp.zeros(4, bool)), None),
]


@pytest.mark.parametrize("name,fn,args,_", CASES, ids=[c[0] for c in CASES])
def test_jit_compiles(name, fn, args, _):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


@pytest.mark.parametrize(
    "name,fn,args,axes",
    [c for c in CASES if c[3] is not None],
    ids=[c[0] for c in CASES if c[3] is not None],
)
def test_vmap_compiles(name, fn, args, axes):
    batched = tuple(jnp.stack([a, a]) for a in args)
    out = jax.jit(jax.vmap(fn, in_axes=axes))(*batched)
    jax.block_until_ready(out)


def test_gamma_geometric_jit_matches_eager():
    ref = PROF
    ev = PROF * 1.02
    eager = np.asarray(gamma.gamma_geometric(ref, ev))
    jitted = np.asarray(jax.jit(gamma.gamma_geometric)(ref, ev))
    np.testing.assert_allclose(
        np.nan_to_num(eager), np.nan_to_num(jitted), atol=1e-6)


def test_gamma_geometric_descending_coords():
    """Descending evaluation coordinates select the swapped window bounds."""
    n = 64
    x = np.linspace(0, 10, n).astype(np.float32)
    prof = (np.exp(-((x - 5) ** 2)) * 100).astype(np.float32)
    asc = np.asarray(gamma.gamma_geometric(
        jnp.asarray(prof), jnp.asarray(prof),
        jnp.asarray(x), jnp.asarray(x)))
    desc = np.asarray(jax.jit(gamma.gamma_geometric)(
        jnp.asarray(prof), jnp.asarray(prof[::-1].copy()),
        jnp.asarray(x), jnp.asarray(x[::-1].copy())))
    # identical dose distributions -> gamma ~ 0 where above threshold
    assert np.nanmax(asc) < 1e-3
    assert np.nanmax(desc) < 1e-3
