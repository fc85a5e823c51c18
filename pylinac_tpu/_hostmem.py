"""Host allocator tuning for virtualized QA hosts.

On micro-VM hosts (firecracker/GKE sandboxes) first-touch page faults run
at ~100 MB/s while already-mapped pages move at ~4-6 GB/s. glibc satisfies
large allocations (>128 KB) with mmap and unmaps them on free, so every
big numpy temporary — stacked CT volumes, staged image batches, transfer
staging buffers — pays the fault cost again on each analyze() call
(measured: np.stack of a 60-slice CT volume took 1.4-3.9 s instead of
~30 ms).

``tune()`` raises glibc's mmap threshold so large blocks come from the
main heap, which stays mapped across frees: the first allocation still
faults once, every later one reuses warm pages. ``prefault()`` optionally
pushes the heap high-water mark up front so even the first big workload
runs at memory speed (useful before timed benchmarks).

Opt out with ``PYLINAC_TPU_NO_MALLOC_TUNE=1``.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4

_done = False


def tune() -> bool:
    """Route large allocations through the (page-warm) main heap."""
    global _done
    if _done or os.environ.get("PYLINAC_TPU_NO_MALLOC_TUNE"):
        return False
    _done = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok &= libc.mallopt(_M_MMAP_MAX, 0)
        # keep the heap top mapped across frees — trimming would hand the
        # pages back and re-fault them on the next big temporary
        ok &= libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        return bool(ok)
    except OSError:  # non-glibc platform
        return False


def prefault(mb: int = 1024) -> None:
    """Fault in ~``mb`` MB of heap once so later allocations are warm."""
    import numpy as np

    block = np.empty(mb * 1024 * 1024 // 8, np.float64)
    block[:: 4096 // 8] = 0.0  # touch one word per page
    del block
