"""Profiling and timing utilities.

The reference has no profiler surface (SURVEY.md section 5.1); this is new,
TPU-first tooling: ``jax.profiler`` trace capture around training steps plus a
``block_until_ready`` step timer used to substantiate MFU numbers.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str | Path, *, host_profiler: bool = False):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    logdir = str(logdir)
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timing with warmup; feeds throughput/MFU reporting."""

    warmup: int = 3
    _times: list[float] = field(default_factory=list)
    _t0: float | None = None
    _steps_seen: int = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float | None:
        """Stop the step timer; blocks on `result` to include device time."""
        if result is not None:
            jax.block_until_ready(result)
        if self._t0 is None:
            return None
        dt = time.perf_counter() - self._t0
        self._steps_seen += 1
        if self._steps_seen > self.warmup:
            self._times.append(dt)
        self._t0 = None
        return dt

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        dt = self.mean_step_s
        return items_per_step / dt if dt else 0.0

    def mfu(self, flops_per_step: float, peak_flops: float) -> float:
        dt = self.mean_step_s
        return flops_per_step / dt / peak_flops if dt else 0.0


def compiled_flops(jitted_fn, *args) -> float:
    """FLOPs of a jitted function per XLA cost analysis (0.0 if unavailable)."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        return float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:  # noqa: BLE001
        return 0.0
