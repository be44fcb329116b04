"""Tracing / profiling / latency measurement.

The reference's only timing is wall-clock deltas around solves — and that
measured latency is fed back as the state-prediction horizon
(``AvoidanceStateMachine.cpp:329-343``: ``decay`` is remeasured every outer
iteration).  Here:

- :class:`LatencyTracker` — host-side EWMA + percentile tracker whose
  current estimate is the modeled per-scenario ``decay`` (closing the same
  measured-latency feedback loop at the batch level),
- :func:`timed` — block_until_ready wall timing of a jitted callable,
- :func:`trace` — context manager around ``jax.profiler`` for device traces
  viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class LatencyTracker:
    """EWMA + reservoir percentiles of step latencies (seconds)."""

    def __init__(self, alpha: float = 0.2, init: float = 0.015, keep: int = 4096):
        # init mirrors the reference's decay seed (mpc_parameters.yaml:77)
        self.ewma = init
        self.alpha = alpha
        self._samples: list[float] = []
        self._keep = keep

    def update(self, seconds: float) -> float:
        self.ewma = (1 - self.alpha) * self.ewma + self.alpha * seconds
        self._samples.append(seconds)
        if len(self._samples) > self._keep:
            self._samples = self._samples[-self._keep :]
        return self.ewma

    def percentile(self, q) -> float:
        return float(np.percentile(self._samples, q)) if self._samples else float("nan")

    @property
    def decay(self) -> float:
        """The latency-compensation lookahead to feed the engine."""
        return self.ewma


def timed(fn: Callable, *args, **kwargs):
    """Run fn, block on its outputs, return (outputs, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
