"""Device-routing policy for host-orchestrated kernels.

The accelerator is the right place for batched 2D pixel math; it is the
wrong place for a 4k-sample 1D profile query when the host↔device link is
a network tunnel (~30 ms per dispatch).  Host-facing wrappers route *small*
arrays to the in-process CPU backend (microsecond dispatch, same kernels,
same numerics) and leave large/batched arrays on the default backend.

This mirrors the reference's implicit layering — scipy 1D calls were always
host-side (``/root/reference/pylinac/core/profile.py``) — while keeping a
single JAX code path that jit/vmap composes onto the TPU for batch mode.
"""

from __future__ import annotations

import os

import numpy as np

import jax

# Arrays at or below this element count are routed to the CPU backend by
# `put`. 2^18 ≈ a 512x512 slice; profiles/windows are far below, full EPID
# images far above.
SMALL_ELEMS = int(os.environ.get("PYLINAC_TPU_SMALL_ELEMS", 1 << 18))

_cpu_device = None


def cpu_device():
    global _cpu_device
    if _cpu_device is None:
        _cpu_device = jax.devices("cpu")[0]
    return _cpu_device


def default_is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def put(x, small: bool | None = None):
    """Commit ``x`` to the CPU backend when small, else leave it uncommitted
    (default backend). Jitted consumers follow the input's placement."""
    if isinstance(x, jax.Array):  # already placed — don't second-guess
        return x
    arr = np.asarray(x)
    if small is None:
        small = arr.size <= SMALL_ELEMS
    if small and not default_is_cpu():
        return jax.device_put(arr, cpu_device())
    return jax.device_put(arr)
