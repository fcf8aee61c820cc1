"""Profiling helpers (reference relies on TF name scopes + profilers,
SURVEY.md §5 'Tracing'; here: jax.profiler + named scopes on the hot ops)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(path: str):
    """Capture a jax profiler trace around a block (view with
    tensorboard / xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # named host-side scope
named_scope = jax.named_scope  # named device-side scope (shows in HLO)


class StepTimer:
    """Wall-clock step timing with device sync (tunnel-safe: call
    ``sync(fetchable)`` with a small array to force completion)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_array=None):
        if sync_array is not None:
            jax.block_until_ready(sync_array)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / max(len(self.times), 1)
