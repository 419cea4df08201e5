"""Profiling / tracing hooks (SURVEY.md §5.1 rebuild note).

The reference's only profiling artifact is a dead tf.RunOptions config
(train_gan2.py:23) and tqdm bars. Here: jax.profiler trace capture around
training windows plus a lightweight step timer producing
steps/sec / frames/sec summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vcgu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self._t0: Optional[float] = None

    def tick(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def timed_steps(self) -> int:
        return max(self.count - self.warmup, 0)

    @property
    def seconds(self) -> float:
        if self._t0 is None or self.timed_steps == 0:
            return 0.0
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.timed_steps / self.seconds if self.seconds > 0 else float("nan")

    def summary(self, items_per_step: float = 1.0) -> dict:
        sps = self.steps_per_sec
        return {
            "steps": self.timed_steps,
            "seconds": self.seconds,
            "steps_per_sec": sps,
            "items_per_sec": sps * items_per_step,
        }
