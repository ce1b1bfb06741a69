"""Profiling (SURVEY.md §5 tracing row): jax.profiler traces viewable in
TensorBoard/Perfetto, ``jax.named_scope`` for labeling quant ops, and a
throughput/step timer for the scaling-efficiency metric."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace: ``with trace('/tmp/prof'): run_steps()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # re-export: label quant ops in traces


@dataclass
class StepTimer:
    """Wall-clock step timer with warmup skip; feeds images/s and the
    >=85% scaling-efficiency check (BASELINE.json:5)."""

    warmup: int = 3
    _times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None
    _seen: int = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)

    @property
    def mean_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean_s if self._times else float("nan")
