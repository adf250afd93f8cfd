"""Profiling & step timing — the framework's observability layer.

The reference's only instrumentation is wall-clock prints
(reference: scripts/train.py:63,75; scripts/test/test_all.py:44,182,187).
Here: a StepTimer that synchronizes on device results before reading the
clock (async dispatch makes naive timing lie), and a jax.profiler trace
context for capturing TensorBoard-viewable TPU traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Accumulates per-step wall times with device synchronization."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_on):
        """Stop the clock after the given device values have fully
        materialized. Uses device_get rather than block_until_ready: remote-
        execution backends (e.g. tunneled TPU) can acknowledge readiness
        before execution completes, and only a host fetch is truthful."""
        for x in sync_on:
            jax.device_get(x)
        assert self._t0 is not None, "start() not called"
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None
        return self.times[-1]

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.mean else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def time_fn(fn, *args, warmup: int = 2, iters: int = 10):
    """Benchmark a jitted fn: returns (mean seconds, result). Donated-arg
    functions should be wrapped by the caller."""
    result = None
    for _ in range(warmup):
        result = fn(*args)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result
