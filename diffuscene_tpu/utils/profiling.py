"""Profiling + throughput observability.

The reference has no tracing at all (SURVEY.md §5.1 — only tqdm bars).  Here:
- `trace(logdir)` wraps `jax.profiler` so any region (train loop, sampler)
  can be captured for TensorBoard/XProf analysis on TPU.
- `ThroughputMeter` tracks the north-star counters (steps/sec, scenes/sec,
  objects/sec) with an EMA, designed to sit in the host loop without forcing
  device syncs: call `.tick()` after the step future is enqueued and
  `.synced_tick()` only when a measured sync is wanted.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for host-side phases (shows up in XProf)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class TraceWindow:
    """Step-windowed `jax.profiler` capture for training loops.

    Captures steps [start, start + length) of a host loop: call
    ``tick(step)`` once per step and ``close()`` after the loop (also stops
    an in-flight capture when the loop ends early).  ``start`` defaults past
    the train-step's two compile calls so the trace shows steady state, not
    compilation.
    """

    def __init__(self, logdir: str, start: int = 3, length: int = 20):
        self.logdir = logdir
        self.start = start
        self.stop = start + length
        self._active = False
        self._done = False

    def tick(self, step: int) -> None:
        import jax

        if self._done:
            return
        if not self._active and self.start <= step < self.stop:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False
        self._done = True


class ThroughputMeter:
    """steps/sec + items/sec with exponential smoothing."""

    def __init__(self, items_per_step: int = 1, ema: float = 0.9):
        self.items_per_step = items_per_step
        self.ema = ema
        self._last: Optional[float] = None
        self._steps = 0
        self._rate: Optional[float] = None  # steps/sec EMA
        self._t0 = time.perf_counter()

    def tick(self, n_steps: int = 1):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            if dt > 0:
                inst = n_steps / dt
                self._rate = inst if self._rate is None else (
                    self.ema * self._rate + (1 - self.ema) * inst
                )
        self._last = now
        self._steps += n_steps

    def synced_tick(self, result, n_steps: int = 1):
        """Block on a device result, then tick — for exact measurements."""
        import jax

        jax.block_until_ready(result)
        self.tick(n_steps)

    @property
    def steps_per_sec(self) -> float:
        return self._rate or 0.0

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step

    @property
    def total_steps(self) -> int:
        return self._steps

    @property
    def average_steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    def metrics(self, prefix: str = "perf") -> Dict[str, float]:
        return {
            f"{prefix}.steps_per_sec": self.steps_per_sec,
            f"{prefix}.items_per_sec": self.items_per_sec,
        }
