"""Profiling / tracing helpers.

The reference's closest analogue is wall-clock batch timing + GPU
utilization polling (`trainers/ddpm_trainer.py:374-402`, SURVEY.md §5.1).
TPU-native replacement: `jax.profiler` traces viewable in TensorBoard /
XProf, device memory introspection, and a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace",
          enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block.

    View with: ``tensorboard --logdir <log_dir>`` (Profile tab) or xprof.
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, int]:
    """Live/peak HBM usage of a device (replaces the reference's
    ``torch.cuda.memory_allocated`` polling)."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
        "bytes_limit": int(stats.get("bytes_limit", 0)),
    }


class StepTimer:
    """Rolling-average step timer with compile-step exclusion."""

    def __init__(self, skip_first: int = 2, window: int = 50):
        self.skip_first = skip_first
        self.window = window
        self.times: list = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> Optional[float]:
        if self._t0 is None:
            return None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.skip_first:
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def throughput(self, batch_size: int) -> float:
        return batch_size / self.mean if self.mean else 0.0
