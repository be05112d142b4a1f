"""Tracing / profiling utilities (SURVEY §5: the reference has none — tqdm
only; here: jax.profiler traces, step timers, throughput meters, and a
debug config with NaN checking)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax NaN debugging within the scope (SURVEY §5 race/sanitizer
    substitute for this workload)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@dataclass
class StepTimer:
    """Wall-clock step timer with warmup discard and items/sec reporting.

    Times include `block_until_ready` on the passed result so async
    dispatch does not hide device time.
    """

    warmup: int = 2
    _times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None
    _steps: int = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._steps += 1
        if self._steps > self.warmup:
            self._times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        holder = {}
        yield holder
        self.stop(holder.get("result"))

    @property
    def mean_s(self) -> float:
        return sum(self._times) / max(1, len(self._times))

    def items_per_sec(self, items_per_step: int) -> float:
        return items_per_step / self.mean_s if self._times else 0.0

    def summary(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        out = {
            "steps": len(self._times),
            "mean_ms": self.mean_s * 1e3,
            "min_ms": min(self._times) * 1e3 if self._times else 0.0,
        }
        if items_per_step:
            out["items_per_sec"] = self.items_per_sec(items_per_step)
        return out
