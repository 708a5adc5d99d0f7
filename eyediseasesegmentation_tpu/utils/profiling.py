"""Profiling & numerics-debugging hooks.

Replaces the reference's observability switches (SURVEY.md §5.1-5.2):
Catalyst ``timeit=True`` → per-epoch timing already in metrics.jsonl;
``torch.autograd.set_detect_anomaly`` (train.py:161) → ``debug_nans``;
no profiler in the reference → ``trace()`` wraps ``jax.profiler`` so any
region of the pipeline can be captured for TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/eds_trace"):
    """Capture a device profile of the enclosed region (jax.profiler)."""
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """NaN-checking for the enclosed region (the reference keeps torch anomaly
    detection always-on, train.py:161; here it is opt-in — it disables some
    fusion)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Rolling per-step timing (the Catalyst `timeit` role)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            self.times = self.times[-self.window:]
        self._last = now

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def rate(self, items_per_step: int = 1) -> float:
        return items_per_step / self.mean if self.mean else 0.0
