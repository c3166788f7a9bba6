"""Tracing / profiling hooks (SURVEY.md §5.1: absent in the reference).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace (xplane) to a directory.
- :class:`StepTimer` — per-stage wall-clock accounting with EMA; the trainer
  uses it to report data-wait vs step time (host-pipeline health).
- :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["trace", "StepTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named-stage wall timer with exponential moving averages."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: dict[str, float] = defaultdict(float)
        self.count: dict[str, int] = defaultdict(int)
        self._start: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            n = self.count[name]
            self.avg[name] = dt if n == 0 else (
                self.ema * self.avg[name] + (1 - self.ema) * dt
            )
            self.count[name] = n + 1

    def summary(self) -> dict[str, float]:
        return {k: round(v * 1e3, 3) for k, v in self.avg.items()}  # ms


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
            )
    return out
