"""Per-config dispatch/transfer budget for the bench suite.

Measures the raw link (H2D / D2H bandwidth at several sizes, null-dispatch
latency) and then, for every bench config, the setup / cold (compile
included) / warm analyze times.  Writes PERF_BUDGET.json next to the repo
root and prints a readable table.  Run on the real accelerator:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_budget.py

(VERDICT r2 #5: optimization must be steered by measured H2D / compile /
kernel / D2H budgets, not guesses.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

import bench

rows: list[tuple[str, float]] = []


def timed(label: str, fn, n: int = 3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    rows.append((label, round(best * 1e3, 1)))
    print(f"  {label}: {best * 1e3:.1f} ms", flush=True)
    return out


def main() -> None:
    print(f"[budget] devices: {jax.devices()}", flush=True)
    # raw link characterization
    for mb in (1, 16, 64):
        arr = np.zeros((mb * 1024 * 1024 // 4,), np.float32)
        dev = timed(f"H2D {mb}MB",
                    lambda a=arr: jax.device_put(a).block_until_ready())
        timed(f"D2H {mb}MB", lambda d=dev: np.asarray(d))
    # chunked-staging sweep: same 64 MB payload through ops.staging.stage
    # at several chunk sizes (VERDICT r3 #3 — find & pin the sweet spot)
    from pylinac_tpu.ops import staging
    big = np.zeros((64 * 1024 * 1024 // 4,), np.float32)
    for chunk_mb in (1, 2, 4, 8):
        saved = staging.CHUNK_BYTES, staging._MIN_SPLIT_BYTES
        staging.CHUNK_BYTES = chunk_mb << 20
        staging._MIN_SPLIT_BYTES = 2 * staging.CHUNK_BYTES
        try:
            timed(f"H2D 64MB chunked @{chunk_mb}MB",
                  lambda: staging.stage(big).block_until_ready())
        finally:
            staging.CHUNK_BYTES, staging._MIN_SPLIT_BYTES = saved
    f = jax.jit(lambda x: x + 1)
    dev1 = jax.device_put(np.zeros(8, np.float32))
    f(dev1).block_until_ready()
    timed("null dispatch (jit x+1, 8 floats)", lambda: np.asarray(f(dev1)))

    from pylinac_tpu.profiling import count_dispatches

    for cfg_cls in (bench.PicketFenceConfig, bench.FieldAnalysisConfig,
                    bench.StarshotConfig, bench.WinstonLutzConfig,
                    bench.CatPhanConfig, bench.GammaConfig):
        cfg = cfg_cls()
        t0 = time.perf_counter()
        cfg.setup()
        setup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        cfg.run_tpu()  # cold: compile + first transfer
        cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cfg.run_tpu()
            best = min(best, time.perf_counter() - t0)
        # dispatch/transfer counts for ONE warm analyze (the number that
        # must stay at 1-2 on a tunneled device: each accelerator entry
        # costs a ~31 ms round trip)
        with count_dispatches() as counts:
            cfg.run_tpu()
        rows.append((f"{cfg.name}: setup", round(setup_s * 1e3, 1)))
        rows.append((f"{cfg.name}: cold analyze (compile incl.)",
                     round(cold * 1e3, 1)))
        rows.append((f"{cfg.name}: warm analyze", round(best * 1e3, 1)))
        rows.append((f"{cfg.name}: warm dispatches", counts.as_dict()))
        print(f"{cfg.name}: setup {setup_s:.2f}s cold {cold:.2f}s "
              f"warm {best:.3f}s dispatches {counts.as_dict()}", flush=True)

    out = Path(__file__).resolve().parent.parent / "PERF_BUDGET.json"
    with open(out, "w") as fjs:
        json.dump(rows, fjs, indent=1)
    print(f"[budget] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
