"""Profiling & observability — replaces the reference's nvidia-smi polling
and wall-clock prints (``node classification/data_utils.py:301-337``,
``physical particle/main.py:116``) with jax.profiler traces and structured
throughput counters (the north-star metric is edges/s/chip, BASELINE.md).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """edges/s (and steps/s) counter for training loops."""

    def __init__(self, edges_per_step: int, layers: int = 1):
        self.edges_per_step = edges_per_step * layers
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def seconds(self):
        return time.perf_counter() - self._t0

    def summary(self) -> dict:
        dt = max(self.seconds, 1e-9)
        return {
            "steps": self._steps,
            "seconds": round(dt, 3),
            "steps_per_s": round(self._steps / dt, 3),
            "edges_per_s": round(self._steps * self.edges_per_step / dt, 1),
        }

    def report(self) -> str:
        return json.dumps(self.summary())


def device_memory_stats() -> dict:
    """Per-device memory stats (replaces nvidia-smi polling)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


def count_parameters(params) -> int:
    """Reference ``count_parameters`` parity (data_utils.py:339-340)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
