"""Tracing / profiling hooks.

The reference ships zero observability (SURVEY.md §5: no timers, counters
or trace hooks anywhere).  The TPU build adds a lightweight, always-on
phase-timing registry plus optional JAX profiler capture:

* ``phase(name)`` — context manager accumulating wall time + call counts
  per phase ("add.wave", "query.batch", "remove.repair", ...).  Overhead is
  one perf_counter pair; safe to leave on in production.
* ``report()`` / ``reset()`` — snapshot or clear the accumulated stats.
* ``device_trace(logdir)`` — context manager wrapping
  ``jax.profiler.trace`` for XLA/TPU timeline capture (TensorBoard).

Device work is asynchronous, so per-phase wall times measure dispatch +
any synchronization the phase itself performs; end-to-end numbers are the
meaningful ones (bench.py forces sync).
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass
from typing import Dict


@dataclass
class PhaseStat:
    calls: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)


class Profiler:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: Dict[str, PhaseStat] = {}
        self.enabled = True

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._stats.setdefault(name, PhaseStat()).add(dt)

    def report(self) -> Dict[str, PhaseStat]:
        with self._lock:
            return {k: PhaseStat(v.calls, v.total_s, v.max_s)
                    for k, v in self._stats.items()}

    def report_lines(self) -> list[str]:
        out = []
        for name, s in sorted(self.report().items()):
            avg = s.total_s / max(s.calls, 1)
            out.append(f"{name:24s} calls={s.calls:6d} "
                       f"total={s.total_s:8.3f}s avg={avg * 1000:8.2f}ms "
                       f"max={s.max_s * 1000:8.2f}ms")
        return out

    def reset(self) -> None:
        with self._lock:
            self._stats.clear()


#: process-wide default profiler used by the Index classes
profiler = Profiler()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA/TPU profiler timeline into ``logdir``."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
