"""Host-driven production training loop.

The role of Keras ``model.fit`` + the DE callbacks in the reference's
demos (python/keras/callbacks.py:38-196; every demo under
demo/dynamic_embedding/ drives training through fit/MonitoredSession).
A TPU dynamic-embedding loop cannot be a ``lax.scan``: XLA conservatively
COPIES donated table buffers carried through scan/while bodies (measured —
CLAUDE.md "Measured XLA/TPU behavior" #6), so a multi-GB table would be
duplicated every iteration. The production pattern is per-step host
dispatch with buffer donation, which this module packages:

  * the step function is jitted ONCE with ``donate_argnums=(0,)`` so the
    table state updates in place;
  * batches are staged to the device ahead of the compute
    (``device_put`` is async; a small deque keeps ``prefetch`` batches in
    flight — tf.data's ``prefetch(AUTOTUNE)`` role, see also
    data/loader.Prefetcher for the threaded host-side variant);
  * metrics stay ON DEVICE between log boundaries — fetching a scalar
    every step would serialize the dispatch pipeline through the tunnel;
  * periodic checkpoint/eval hooks run host-side at configurable strides
    (the DEHvdModelCheckpoint role, keras/callbacks.py:109-196).
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Any, Callable, Iterable, Optional

import jax


@dataclasses.dataclass
class LoopConfig:
    """Knobs for :func:`train_loop`."""

    steps: int = 1000
    log_every: int = 100  # fetch + report metrics every N steps (0 = never)
    checkpoint_every: int = 0  # call checkpoint_fn every N steps (0 = off)
    prefetch: int = 2  # device batches kept in flight ahead of compute
    donate: bool = True  # donate the state buffers (in-place tables)


@dataclasses.dataclass
class LoopReport:
    """What :func:`train_loop` returns besides the final state."""

    steps: int = 0
    last_metrics: Any = None
    history: list = dataclasses.field(default_factory=list)
    wall_s: float = 0.0
    steps_per_sec: float = 0.0


def _device_prefetch(batches: Iterable, depth: int):
    """Stage up to ``depth`` batches on device ahead of consumption.
    ``device_put`` is asynchronous, so the H2D copies overlap compute."""
    buf = collections.deque()
    it = iter(batches)
    try:
        while True:
            while len(buf) <= depth:
                buf.append(jax.device_put(next(it)))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


def train_loop(
    step_fn: Callable,
    state,
    batches: Iterable,
    config: Optional[LoopConfig] = None,
    *,
    checkpoint_fn: Optional[Callable] = None,
    on_log: Optional[Callable] = None,
    jit: bool = True,
):
    """Run ``step_fn(state, batch) -> (state, metrics)`` for
    ``config.steps`` steps (or until ``batches`` is exhausted).

    ``state`` is any pytree holding the table state (and optimizer/dense
    state); it is donated on every dispatch, so the caller must NOT reuse
    the input object after this returns — use the returned state.

    ``metrics`` may be any pytree of device scalars; it is fetched
    (forcing a device sync) only at ``log_every`` boundaries and passed to
    ``on_log(step, metrics)``. ``checkpoint_fn(state, step)`` runs at
    ``checkpoint_every`` strides and on the final step; it receives the
    LIVE state — checkpoint writers fetch what they need.

    Returns ``(final_state, LoopReport)``.
    """
    cfg = config or LoopConfig()
    fn = step_fn
    if jit:
        fn = jax.jit(step_fn, donate_argnums=(0,) if cfg.donate else ())
    report = LoopReport()
    metrics = None
    t0 = time.perf_counter()
    stream = _device_prefetch(batches, cfg.prefetch)
    step = 0
    for step, batch in enumerate(stream, start=1):
        state, metrics = fn(state, batch)
        if cfg.log_every and step % cfg.log_every == 0:
            fetched = jax.tree.map(lambda x: float(x), metrics)
            report.history.append((step, fetched))
            report.last_metrics = fetched
            if on_log is not None:
                on_log(step, fetched)
        if (
            checkpoint_fn is not None
            and cfg.checkpoint_every
            and step % cfg.checkpoint_every == 0
        ):
            checkpoint_fn(state, step)
        if step >= cfg.steps:
            break
    # final sync: make wall time honest and surface the last metrics
    if metrics is not None:
        report.last_metrics = jax.tree.map(lambda x: float(x), metrics)
    report.wall_s = time.perf_counter() - t0
    report.steps = step
    report.steps_per_sec = step / max(report.wall_s, 1e-9)
    if checkpoint_fn is not None and cfg.checkpoint_every and step:
        checkpoint_fn(state, step)
    return state, report
