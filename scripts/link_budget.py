"""True link characterization for the axon device tunnel.

``block_until_ready`` does NOT wait for tunnel completion on this backend —
the only reliable sync is a host fetch of data that depends on the work.
Every measurement here forces a dependent scalar fetch, so the numbers are
wall-clock-true (unlike the first PERF_BUDGET.json pass, whose H2D/D2H rows
timed async handles).

Usage::

    python scripts/link_budget.py            # full sweep, prints a table
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x) -> None:
    """Force true completion: fetch one element that depends on x."""
    np.asarray(jax.jit(lambda a: a.ravel()[0])(x))


def timeit(fn, n: int = 5) -> float:
    fn()  # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    rows: list[tuple[str, float]] = []

    f_id = jax.jit(lambda x: x * 2.0)
    small = jax.device_put(np.ones(8, np.float32))
    _sync(small)
    rows.append(("null dispatch + scalar fetch",
                 timeit(lambda: np.asarray(f_id(small)))))

    # ---- H2D: single put, forced complete via dependent scalar fetch
    fsum = jax.jit(lambda x: x.ravel()[:1])
    for mb in (0.25, 1, 4, 16, 64):
        arr = np.ones(int(mb * (1 << 20) / 4), np.float32)
        rows.append((f"H2D {mb}MB (forced)",
                     timeit(lambda: np.asarray(fsum(jax.device_put(arr))),
                            n=3)))

    # ---- H2D chunked: split into C chunks, put all, then one fetch
    def chunked_put(arr: np.ndarray, chunk_mb: float):
        step = int(chunk_mb * (1 << 20) / 4)
        parts = [jax.device_put(arr[i:i + step])
                 for i in range(0, arr.size, step)]
        return np.asarray(fsum(jnp.concatenate(parts)))

    big = np.ones(16 << 18, np.float32)  # 16MB
    for cmb in (0.5, 1, 2, 4):
        rows.append((f"H2D 16MB chunked {cmb}MB (forced)",
                     timeit(lambda: chunked_put(big, cmb), n=3)))

    # ---- D2H: resident device buffer -> host
    for mb in (0.0625, 0.25, 1, 4, 16):
        n = int(mb * (1 << 20) / 4)
        dev = jax.jit(lambda k: jnp.ones(n, jnp.float32) * k)(2.0)
        _sync(dev)
        rows.append((f"D2H {mb}MB",
                     timeit(lambda: np.asarray(f_id(dev)), n=3)))

    # ---- dtype on the wire: u8 vs f32 for the same logical payload
    n = 4 << 20  # 4M elements
    dev8 = jax.jit(lambda: jnp.ones(n, jnp.uint8))()
    _sync(dev8)
    rows.append(("D2H 4M elems as u8 (4MB)",
                 timeit(lambda: np.asarray(f_id(dev8)), n=3)))

    # ---- H2D integer payloads: does u16 ride the bulk path or the slow
    # element-wise path? (decides whether staging should byte-view integer
    # frames as f32 words and bitcast back on device)
    fsum16 = jax.jit(lambda x: x.ravel()[:1])
    u16 = np.ones(8 << 20, np.uint16)  # 16MB logical
    rows.append(("H2D 16MB as u16 (forced)",
                 timeit(lambda: np.asarray(fsum16(jax.device_put(u16))), n=3)))
    as_f32 = u16.view(np.float32)
    rows.append(("H2D 16MB u16 viewed f32 (forced)",
                 timeit(lambda: np.asarray(fsum(jax.device_put(as_f32))), n=3)))

    for name, ms in rows:
        print(f"{name:42s} {ms:8.1f} ms")
    with open("LINK_BUDGET.json", "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
