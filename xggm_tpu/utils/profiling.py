"""Tracing / profiling hooks (SURVEY.md §5.1: the reference has none - only
tqdm progress bars; here profiling is first-class).

* `trace(logdir)`: context manager around jax.profiler.trace - produces
  TensorBoard-viewable XLA traces (op-level timeline, HBM usage).
* `StepTimer`: rolling per-step wall-time stats with device-sync readback,
  used by the trainers for steps/sec reporting.
* `annotate(name)`: TraceAnnotation wrapper so named regions show up in the
  trace viewer.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock stats. Call .tick() once per step; call
    .sync_tick(x) to force a device readback barrier on `x` first (needed on
    relay-backed platforms where block_until_ready is not a true barrier)."""

    def __init__(self, window: int = 50):
        self.times: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    def sync_tick(self, value) -> Optional[float]:
        import jax
        import numpy as np

        x = jax.tree.leaves(value)[0]
        np.asarray(x).ravel()  # host readback = real barrier
        return self.tick()

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.mean else 0.0
