"""Count device dispatches (compiled executions) per analysis stage.

Every compiled execution in JAX — explicit ``jax.jit`` calls AND eager
primitive applications — funnels through ``jax._src.pjit._pjit_call_impl``.
On a tunneled TPU each such execution is a ~31 ms round trip
(PERF_BUDGET.json), so the dispatch COUNT per ``*Batch.analyze()`` is the
round's primary perf metric (VERDICT round-3 ask #1/#4).  Host→device
transfers (``device_put``) are counted separately.

Usage::

    python scripts/count_dispatches.py [Config ...]

Prints per-config dispatch counts and the top jaxpr names.
"""
from __future__ import annotations

import collections
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

COUNTS: collections.Counter = collections.Counter()
ACTIVE = False


def _install() -> None:
    import jax._src.pjit as pjit_mod

    orig_call = pjit_mod._pjit_call_impl

    def counting_call(*args, jaxpr=None, **kwargs):
        if ACTIVE:
            name = "?"
            try:
                eqns = jaxpr.jaxpr.eqns
                name = (eqns[0].primitive.name if len(eqns) == 1
                        else f"jit[{len(eqns)} eqns]")
                dbg = getattr(jaxpr.jaxpr, "debug_info", None)
                if dbg is not None and getattr(dbg, "func_name", None):
                    name = f"{dbg.func_name}:{name}"
            except Exception:
                pass
            COUNTS[name] += 1
        return orig_call(*args, jaxpr=jaxpr, **kwargs)

    pjit_mod._pjit_call_impl = counting_call

    orig_put = jax.device_put

    def counting_put(*args, **kwargs):
        if ACTIVE:
            COUNTS["device_put"] += 1
        return orig_put(*args, **kwargs)

    jax.device_put = counting_put


@contextlib.contextmanager
def counting(label: str):
    global ACTIVE
    COUNTS.clear()
    ACTIVE = True
    try:
        yield
    finally:
        ACTIVE = False
        total = sum(COUNTS.values())
        print(f"\n== {label}: {total} dispatches ==")
        for name, n in COUNTS.most_common(25):
            print(f"  {n:5d}  {name}")


def main() -> None:
    _install()
    import bench

    wanted = sys.argv[1:] or ["FieldAnalysis", "PicketFence", "WinstonLutz",
                              "Starshot", "CatPhan504", "Gamma2D"]
    for cfg_cls in [bench.PicketFenceConfig, bench.FieldAnalysisConfig,
                    bench.StarshotConfig, bench.WinstonLutzConfig,
                    bench.CatPhanConfig, bench.GammaConfig]:
        cfg = cfg_cls()
        if cfg.name not in wanted:
            continue
        cfg.setup()
        cfg.run_tpu()  # warm-up: compile + caches
        with counting(f"{cfg.name} warm analyze"):
            cfg.run_tpu()


if __name__ == "__main__":
    main()
