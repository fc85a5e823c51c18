"""Fluence-map reconstruction kernel.

Replaces the reference's per-leaf-pair, per-snapshot Python loop
(``/root/reference/pylinac/log_analyzer.py:482-616``) with one fused XLA
graph: interval addition is a scatter of +/-MU into a difference array
followed by a cumulative sum along the leaf-travel axis —
O(P*S) scatters + O(P*W) cumsum instead of O(P*S*W) slice-adds, and the
whole thing batches over leaf pairs on the VPU.

Semantics note: every (pair, snapshot) aperture is accumulated with its
per-snapshot jaw positions. The reference short-circuits non-moving pairs
using the *widest* jaw opening over the whole delivery x total MU; for
static jaws (the overwhelmingly common case) the two are identical, and
when jaws move the per-snapshot sum is the physically correct one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("width",))
def interval_fluence(
    left_edges: jnp.ndarray,
    right_edges: jnp.ndarray,
    mu_diff: jnp.ndarray,
    pair_blocked: jnp.ndarray,
    width: int,
) -> jnp.ndarray:
    """Accumulate MU over per-snapshot apertures.

    Parameters
    ----------
    left_edges, right_edges : (P, S) int32
        Aperture bin interval [left, right) per leaf pair and snapshot,
        already jaw-clamped and clipped to [0, width].
    mu_diff : (S,) float32
        MU delivered in each snapshot.
    pair_blocked : (P,) bool
        Leaf pairs fully under the Y jaws (excluded).
    width : int
        Number of position bins (e.g. 400mm / 0.1mm = 4000).

    Returns
    -------
    (P, width) float32 fluence map.
    """
    P, S = left_edges.shape
    pair_idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[:, None], (P, S))
    mu = jnp.broadcast_to(mu_diff.astype(jnp.float32)[None, :], (P, S))
    valid = (right_edges > left_edges) & ~pair_blocked[:, None]
    mu = jnp.where(valid, mu, 0.0)
    left = jnp.clip(left_edges, 0, width)
    right = jnp.clip(right_edges, 0, width)
    diff = jnp.zeros((P, width + 1), jnp.float32)
    diff = diff.at[pair_idx.ravel(), left.ravel()].add(mu.ravel())
    diff = diff.at[pair_idx.ravel(), right.ravel()].add(-mu.ravel())
    return jnp.cumsum(diff, axis=1)[:, :width]
