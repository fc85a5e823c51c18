"""Chunked host→device staging for large image batches.

The tunneled device link moves large single `device_put` calls at a
fraction of its small-transfer rate, and a single stream leaves wire idle
time (forced-sync measurements in LINK_BUDGET.json: 64 MB in one put ≈
1.7 s; 16 MB at 2 MB chunks ≈ 277 ms; two concurrent streams ≈ 1.6×).
Staging a large batch as ~2 MB chunks issued from a small thread pool and
reassembled on device with ONE concatenate dispatch keeps the wire busy at
its best rate.

`stage(arr)` is a drop-in replacement for `jax.device_put(arr)` /
`jnp.asarray(arr)` on host numpy arrays; small arrays pass straight
through. Tunables: `PYLINAC_TPU_STAGE_CHUNK_MB` (default 2; `0` disables
chunking) and `PYLINAC_TPU_STAGE_THREADS` (default 4; `1` restores the
serial put loop).
"""

from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

#: Chunk size in bytes. 2 MB sits on the measured sweet-spot plateau
#: (LINK_BUDGET.json "H2D 16MB chunked" rows). 0 disables chunking.
CHUNK_BYTES = int(float(os.environ.get("PYLINAC_TPU_STAGE_CHUNK_MB", "2"))
                  * (1 << 20))

#: Concurrent H2D streams (measured ~1.6× with 2+ on the axon tunnel).
STAGE_THREADS = int(os.environ.get("PYLINAC_TPU_STAGE_THREADS", "4"))

#: Arrays at or below 2x the chunk size aren't worth splitting.
_MIN_SPLIT_BYTES = 2 * CHUNK_BYTES

_pool: ThreadPoolExecutor | None = None


def _stage_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=max(STAGE_THREADS, 1))
    return _pool


def stage(arr: np.ndarray, device=None) -> jax.Array:
    """Move a host array to ``device`` (default backend) in ~CHUNK_BYTES
    pieces reassembled on device. Returns the device array with ``arr``'s
    shape/dtype. Equivalent to ``jax.device_put`` for small inputs, for
    jax arrays (already placed), or when chunking is disabled."""
    if isinstance(arr, jax.Array):
        return arr
    arr = np.asarray(arr)
    if (CHUNK_BYTES <= 0 or arr.nbytes <= _MIN_SPLIT_BYTES
            or arr.ndim == 0):
        return jax.device_put(arr, device)
    flat = np.ascontiguousarray(arr).reshape(-1)
    chunk_elems = max(CHUNK_BYTES // arr.itemsize, 1)
    views = [flat[off:off + chunk_elems]
             for off in range(0, flat.size, chunk_elems)]
    put = functools.partial(jax.device_put, device=device)
    # threads only pay on the tunneled device; on the in-process CPU
    # backend concurrent transfers can abort in XLA:CPU (see
    # ops.pack._pool_safe)
    if (STAGE_THREADS > 1 and len(views) > 1
            and jax.default_backend() != "cpu"):
        parts = list(_stage_pool().map(put, views))
    else:
        parts = [put(v) for v in views]
    return _assemble(tuple(parts), arr.shape)


@functools.partial(jax.jit, static_argnums=1)
def _assemble(parts, shape):
    return jnp.concatenate(parts).reshape(shape)
