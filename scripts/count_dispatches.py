"""Count device dispatches (compiled executions) per analysis stage.

Every compiled execution in JAX — ``jax.jit`` calls AND eager primitive
applications — ends in ``LoadedExecutable.execute_sharded``; on a tunneled
TPU each execution is a ~31 ms round trip (PERF_BUDGET.json), so the
dispatch COUNT per ``*Batch.analyze()`` is the round's primary perf metric
(VERDICT round-3 ask #1/#4).  Each dispatch is attributed to the innermost
``pylinac_tpu``/``bench`` stack frame so the hot call sites are visible.

Usage::

    python scripts/count_dispatches.py [Config ...]
    PYLINAC_COUNT_PLATFORM=axon python scripts/count_dispatches.py CatPhan504

Defaults to the in-process CPU backend.  With
``PYLINAC_COUNT_PLATFORM=axon`` (PYTHONPATH must include /root/.axon_site)
each dispatch is labeled with its target platform, separating ~31 ms tunnel
round trips (axon) from microsecond host-side CPU dispatches that
``ops.route`` deliberately keeps off the wire.
"""
from __future__ import annotations

import collections
import contextlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PLATFORM = os.environ.get("PYLINAC_COUNT_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM

import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

COUNTS: collections.Counter = collections.Counter()
ACTIVE = False


def _attribute() -> str:
    """Innermost project frame of the current stack."""
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if ("pylinac_tpu" in fn or fn.endswith("bench.py")) and "pack.py" not in fn:
            short = fn.split("pylinac_tpu/")[-1].split("/")[-1]
            return f"{short}:{frame.lineno}"
    return "<jax internals>"


_installed = False


def _install() -> None:
    """Install the counting hooks (idempotent). Disables the pjit C++
    fastpath, so install only AFTER any timing-sensitive runs."""
    global _installed
    if _installed:
        return
    _installed = True
    import jax._src.interpreters.pxla as pxla
    import jax._src.pjit as pjit_mod

    # the C++ pjit fastpath executes cached calls without touching Python;
    # disable it so every execution routes through ExecuteReplicated
    pjit_mod._get_fastpath_data = lambda *a, **k: None

    orig_call = pxla.ExecuteReplicated.__call__

    def counting(self, *args):
        if ACTIVE:
            try:
                plat = self._local_devices[0].platform
            except Exception:
                try:
                    plat = self.xla_executable.local_devices()[0].platform
                except Exception:
                    plat = "?"
            COUNTS[f"[{plat}] {_attribute()}"] += 1
        return orig_call(self, *args)

    pxla.ExecuteReplicated.__call__ = counting

    orig_put = jax.device_put

    def counting_put(x, device=None, **kwargs):
        if ACTIVE:
            plat = getattr(device, "platform", None) or jax.default_backend()
            COUNTS[f"[{plat}] device_put @ {_attribute()}"] += 1
        return orig_put(x, device, **kwargs)

    jax.device_put = counting_put


@contextlib.contextmanager
def capture():
    """Importable counting context: installs hooks (first use) and yields
    the live Counter; read it after the block. Keys are
    ``[platform] file:line``."""
    global ACTIVE
    _install()
    COUNTS.clear()
    ACTIVE = True
    try:
        yield COUNTS
    finally:
        ACTIVE = False


@contextlib.contextmanager
def counting(label: str):
    with capture() as counts:
        yield
    total = sum(counts.values())
    print(f"\n== {label}: {total} dispatches ==")
    for name, n in counts.most_common(30):
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
