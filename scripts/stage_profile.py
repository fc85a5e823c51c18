"""Per-stage warm-analyze wall-time breakdown for each bench config.

Runs each bench config's warm path under ``profiling.collect()`` on the
current backend (real TPU by default) and prints the stage table — the
companion to ``count_dispatches.py`` for attributing the warm milliseconds
rather than the dispatch counts.

Usage::

    python scripts/stage_profile.py [Config ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from pylinac_tpu import profiling

    wanted = sys.argv[1:] or ["PicketFence", "FieldAnalysis", "Starshot",
                              "WinstonLutz", "CatPhan504", "Gamma2D"]
    for cfg_cls in [bench.PicketFenceConfig, bench.FieldAnalysisConfig,
                    bench.StarshotConfig, bench.WinstonLutzConfig,
                    bench.CatPhanConfig, bench.GammaConfig]:
        cfg = cfg_cls()
        if cfg.name not in wanted:
            continue
        t0 = time.perf_counter()
        cfg.setup()
        t1 = time.perf_counter()
        cfg.run_tpu()  # cold: compile + caches
        t2 = time.perf_counter()
        best = None
        for _ in range(3):
            with profiling.collect() as times:
                t3 = time.perf_counter()
                cfg.run_tpu()
                dt = time.perf_counter() - t3
            if best is None or dt < best[0]:
                best = (dt, times)
        print(f"\n== {cfg.name}: setup {t1 - t0:.1f}s  cold {t2 - t1:.1f}s  "
              f"warm(min3) {best[0] * 1e3:.0f}ms ==", flush=True)
        print(best[1].report(), flush=True)


if __name__ == "__main__":
    main()
