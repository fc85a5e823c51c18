"""Single-transfer result packing for remote-TPU dispatch.

Fetching a pytree of small result arrays costs one device→host round trip
PER LEAF; on a tunneled TPU (~35 ms latency, highly asymmetric bandwidth)
a 40-leaf result dict costs >1 s of pure latency. These helpers flatten a
result tree into ONE logical float32 vector on device — materialized as a
tuple of ~chunk-sized output buffers so the host can drain them on
parallel threads (the tunnel's D2H path moves ~17 MB/s on one stream but
scales ~2× with concurrent fetches, LINK_BUDGET.json) — and restore
shapes/dtypes on host.

float32 packing is lossless for the QA result set: bools, small int32
indices (< 2^24), and native f32 metrics.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

#: Elements per packed output chunk (float32). ~1 MB chunks hit the
#: tunnel's parallel-fetch sweet spot; override via env for A/B.
PACK_CHUNK_ELEMS = int(float(os.environ.get(
    "PYLINAC_TPU_PACK_CHUNK_MB", "1")) * (1 << 20) / 4) or (1 << 62)

#: Concurrent D2H fetch streams (measured ~2.2× at 4 on the axon tunnel).
FETCH_THREADS = int(os.environ.get("PYLINAC_TPU_FETCH_THREADS", "4"))

_pool: ThreadPoolExecutor | None = None


def _fetch_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=max(FETCH_THREADS, 1))
    return _pool


def pack_tree(tree) -> tuple[jnp.ndarray, ...]:
    """Flatten a pytree of arrays into chunked 1D float32 device buffers.

    Trace-time only (call inside jit): the chunk boundaries are static.
    Returns a tuple so XLA emits one output buffer per chunk; fetch with
    :func:`fetch_concat`.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    vec = jnp.concatenate([jnp.ravel(leaf).astype(jnp.float32)
                           for leaf in leaves])
    n = vec.shape[0]
    if n <= PACK_CHUNK_ELEMS:
        return (vec,)
    return tuple(vec[off:off + PACK_CHUNK_ELEMS]
                 for off in range(0, n, PACK_CHUNK_ELEMS))


def _pool_safe() -> bool:
    """Parallel fetch only pays on the tunneled device; on the in-process
    CPU backend it saves nothing AND concurrent transfers of shard_map
    outputs on the forced-host multi-device platform abort in XLA:CPU
    (SIGABRT seen in tests/parallel under the 8-virtual-device mesh)."""
    return jax.default_backend() != "cpu"


def fetch_all(parts: list) -> list:
    """np.asarray over a list of device arrays — threaded on the tunneled
    backend, serial on CPU (see :func:`_pool_safe`)."""
    if len(parts) > 1 and _pool_safe():
        return list(_fetch_pool().map(np.asarray, parts))
    return [np.asarray(p) for p in parts]


def fetch_concat(parts) -> np.ndarray:
    """Drain packed chunks device→host (parallel threads on the tunneled
    backend), return the concatenated host vector. Accepts a single array
    or a tuple/list."""
    if isinstance(parts, (jnp.ndarray, jax.Array, np.ndarray)):
        return np.asarray(parts)
    parts = list(parts)
    if len(parts) == 1:
        return np.asarray(parts[0])
    return np.concatenate(fetch_all(parts))


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


def unpack_tree(packed, spec):
    """Restore the pytree from a packed vector (or chunk tuple) using an
    ``eval_shape`` spec."""
    leaves, treedef = jax.tree_util.tree_flatten(spec)
    packed = fetch_concat(packed)
    out = []
    off = 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape, dtype=np.int64)) if leaf.shape else 1
        chunk = packed[off:off + n].reshape(leaf.shape)
        out.append(chunk.astype(leaf.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)
