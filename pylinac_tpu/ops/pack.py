"""Single-transfer result packing for remote-TPU dispatch.

Fetching a pytree of small result arrays costs one device→host round trip
PER LEAF; on a tunneled TPU (~30 ms latency, highly asymmetric bandwidth)
a 40-leaf result dict costs >1 s of pure latency. These helpers flatten a
result tree into ONE float32 vector on device (one fetch) and restore
shapes/dtypes on host.

float32 packing is lossless for the QA result set: bools, small int32
indices (< 2^24), and native f32 metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_tree(tree) -> jnp.ndarray:
    """Flatten a pytree of arrays into one 1D float32 device array."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(leaf).astype(jnp.float32) for leaf in leaves])


_SPEC_CACHE: dict = {}


def tree_spec(fn, *args, cache_key=None, **kwargs):
    """Shape/dtype tree of ``fn(*args, **kwargs)`` without running it.

    ``eval_shape`` re-traces the function (seconds for a large pipeline), so
    pass ``cache_key`` — a hashable digest of the static config + input
    shapes — to memoize the spec across calls.
    """
    if cache_key is not None and cache_key in _SPEC_CACHE:
        return _SPEC_CACHE[cache_key]
    spec = jax.eval_shape(fn, *args, **kwargs)
    if cache_key is not None:
        _SPEC_CACHE[cache_key] = spec
    return spec


def unpack_tree(packed: np.ndarray, spec):
    """Restore the pytree from a packed vector using an ``eval_shape`` spec."""
    leaves, treedef = jax.tree_util.tree_flatten(spec)
    packed = np.asarray(packed)
    out = []
    off = 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape, dtype=np.int64)) if leaf.shape else 1
        chunk = packed[off:off + n].reshape(leaf.shape)
        out.append(chunk.astype(leaf.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)
