"""Tracing + step-timing instrumentation.

The reference has no profiling (SURVEY §5, only commented-out wall-clock
prints). Here: a ``jax.profiler`` trace context for capturing device
timelines (viewable in XProf/TensorBoard or Perfetto) and a lightweight step
timer with percentile summaries that forces a true device sync via a host
transfer (``block_until_ready`` alone is unreliable over tunneled runtimes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the duration of the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force the device to finish everything feeding ``x``."""
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        np.asarray(jax.device_get(leaf[0]))


class StepTimer:
    """Rolling step timing with async-dispatch awareness.

    Record steps without syncing (cheap); call ``lap(result)`` to sync and
    close out the window. Reports img/s given a batch size.
    """

    def __init__(self, batch_size: Optional[int] = None):
        self.batch_size = batch_size
        self._t0: Optional[float] = None
        self._steps = 0
        self.history: list[dict] = []

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> None:
        if self._t0 is None:
            self.start()
        self._steps += 1

    def lap(self, result=None) -> dict:
        """Sync on ``result`` and summarize the window since start()."""
        if result is not None:
            sync(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        stats = {
            "steps": self._steps,
            "seconds": dt,
            "steps_per_sec": self._steps / dt if dt > 0 else float("nan"),
        }
        if self.batch_size:
            stats["img_per_sec"] = self._steps * self.batch_size / dt if dt > 0 else float("nan")
        self.history.append(stats)
        self.start()
        return stats
