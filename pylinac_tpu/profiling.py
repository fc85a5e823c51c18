"""Per-stage timing and device profiling hooks.

The reference has no tracing/profiling subsystem (SURVEY §5.1 — only a
test-time memory monitor); for a TPU pipeline, stage-level wall times and
XLA device traces are first-class observability. Usage:

    from pylinac_tpu import profiling

    with profiling.collect() as times:
        ct = CatPhan504(folder)
        ct.analyze()
    print(times.report())          # per-stage wall-time table

    with profiling.device_trace("/tmp/trace"):   # TensorBoard/Perfetto dump
        pf.analyze()

Stages are recorded by the analysis engines via ``profiling.stage("name")``;
when no collector is active the context manager is a no-op with ~100 ns
overhead, so instrumentation is always-on in library code.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StageTimings:
    """Accumulated per-stage wall times (seconds), in call order."""

    stages: list[tuple[str, float]] = field(default_factory=list)

    def add(self, name: str, seconds: float) -> None:
        self.stages.append((name, seconds))

    def total(self) -> float:
        return sum(t for _n, t in self.stages)

    def as_dict(self) -> dict[str, float]:
        """Stage → summed seconds (stages hit multiple times are summed)."""
        out: dict[str, float] = {}
        for name, t in self.stages:
            out[name] = out.get(name, 0.0) + t
        return out

    def report(self) -> str:
        agg = self.as_dict()
        total = self.total() or 1e-12
        width = max((len(n) for n in agg), default=5)
        lines = [f"{'stage':<{width}}  {'ms':>9}  {'%':>5}"]
        for name, t in agg.items():
            lines.append(f"{name:<{width}}  {t * 1e3:9.2f}  {100 * t / total:5.1f}")
        lines.append(f"{'total':<{width}}  {total * 1e3:9.2f}  100.0")
        return "\n".join(lines)


_active: list[StageTimings] = []


@contextlib.contextmanager
def collect():
    """Activate stage collection; yields the :class:`StageTimings`."""
    timings = StageTimings()
    _active.append(timings)
    try:
        yield timings
    finally:
        _active.remove(timings)


@contextlib.contextmanager
def stage(name: str, *sync_args):
    """Time a pipeline stage. No-op unless inside :func:`collect`.

    ``sync_args``: jax arrays/pytrees to ``block_until_ready`` before the
    stop-clock, so async-dispatched device work is attributed to its own
    stage instead of whoever synchronizes next.
    """
    if not _active:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_args:
            import jax

            jax.block_until_ready(sync_args)
        dt = time.perf_counter() - t0
        for timings in _active:
            timings.add(name, dt)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA device trace (TensorBoard `trace viewer` / Perfetto) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class DispatchCounts:
    """Executable launches and host↔device transfers, keyed by platform.

    On a tunneled accelerator each non-CPU entry costs a network round trip
    (~31 ms measured in PERF_BUDGET.json), so ``dispatches`` is the number
    that must stay at 1–2 per batch ``analyze()``; the in-process ``cpu``
    backend dispatches in microseconds and is free to stay chatty.
    """

    dispatches: dict[str, int] = field(default_factory=dict)
    transfers: dict[str, int] = field(default_factory=dict)

    def add(self, kind: str, platform: str) -> None:
        d = self.dispatches if kind == "dispatch" else self.transfers
        d[platform] = d.get(platform, 0) + 1

    def accelerator_dispatches(self) -> int:
        return sum(n for p, n in self.dispatches.items() if p != "cpu")

    def as_dict(self) -> dict:
        return {"dispatches": dict(self.dispatches),
                "transfers": dict(self.transfers)}


_dispatch_active: list[DispatchCounts] = []
_dispatch_patched = False


def _install_dispatch_hooks() -> None:
    global _dispatch_patched
    if _dispatch_patched:
        return
    import jax
    from jax._src.interpreters import pxla

    orig_call = pxla.ExecuteReplicated.__call__

    def counting_call(self, *args):
        if _dispatch_active:
            try:
                platform = self.backend.platform
            except Exception:
                platform = "?"
            for c in _dispatch_active:
                c.add("dispatch", platform)
        return orig_call(self, *args)

    pxla.ExecuteReplicated.__call__ = counting_call

    orig_put = jax.device_put

    def counting_put(x, device=None, *a, **k):
        if _dispatch_active:
            try:
                platform = (device.platform if device is not None
                            else jax.default_backend())
            except Exception:
                platform = "?"
            for c in _dispatch_active:
                c.add("transfer", platform)
        return orig_put(x, device, *a, **k)

    jax.device_put = counting_put
    _dispatch_patched = True


@contextlib.contextmanager
def count_dispatches():
    """Count executable launches + ``device_put`` transfers per platform.

    Yields a :class:`DispatchCounts`. Counts compiled-function launches on
    every backend (the jit C++ fastpath is bypassed while a counter is
    active only for the first call per shape — steady-state launches still
    route through ``ExecuteReplicated``). Intended for perf budgeting
    (``scripts/perf_budget.py``), not hot paths.
    """
    _install_dispatch_hooks()
    counts = DispatchCounts()
    _dispatch_active.append(counts)
    try:
        yield counts
    finally:
        _dispatch_active.remove(counts)
