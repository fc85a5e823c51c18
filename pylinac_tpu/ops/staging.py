"""Chunked host→device staging for large image batches.

The tunneled device link moves small transfers at full rate but degrades
severely on large single `device_put` calls (measured: ~278 MB/s at 1 MB,
~64 MB/s at 64 MB — PERF_BUDGET.json "H2D" rows). Staging a large batch as
a stream of ~1–4 MB chunks that are reassembled on device with ONE
concatenate dispatch keeps the wire at its small-transfer rate and lets
XLA's async dispatch overlap the next chunk's transfer with device-side
assembly.

`stage(arr)` is a drop-in replacement for `jax.device_put(arr)` /
`jnp.asarray(arr)` on host numpy arrays; small arrays pass straight
through. The chunk size is tunable via `PYLINAC_TPU_STAGE_CHUNK_MB`
(default 2 MB; `0` disables chunking entirely for A/B).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

#: Chunk size in bytes. Large single transfers degrade to ~1/4 of the
#: link's small-transfer rate (PERF_BUDGET.json); 2 MB sits on the
#: measured sweet-spot plateau. 0 disables chunking.
CHUNK_BYTES = int(float(os.environ.get("PYLINAC_TPU_STAGE_CHUNK_MB", "2"))
                  * (1 << 20))

#: Arrays at or below 2x the chunk size aren't worth splitting.
_MIN_SPLIT_BYTES = 2 * CHUNK_BYTES


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
    parts = [
        jax.device_put(flat[off:off + chunk_elems], device)
        for off in range(0, flat.size, chunk_elems)
    ]
    return _assemble(tuple(parts), arr.shape)


import functools


@functools.partial(jax.jit, static_argnums=1)
def _assemble(parts, shape):
    return jnp.concatenate(parts).reshape(shape)
