"""In-process A/B of the DMA issue-loop unroll factor on the FULL train
step (min-of-3, one terminal epoch — cancels tunnel noise).

    python tools/ab_unroll.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops import pallas_ops

DIM = 64
CAP = 1 << 21
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def time_full(var, opt, state, ids, fresh):
    def fn(state, ids):
        def step(st, i):
            sub = ids ^ (i + 1).astype(ids.dtype) if fresh else ids
            emb, ctx = var.embedding_lookup(st, sub)
            st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
            return st, ()
        out, _ = jax.lax.scan(step, state,
                              jnp.arange(STEPS, dtype=jnp.int32))
        return out

    run = jax.jit(fn)
    out = run(state, ids)
    _ = float(jnp.sum(out.scores[:2]))
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out = run(state, ids)
        _ = float(jnp.sum(out.scores[:2]))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    var = de.Variable(
        name="abu_table", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05),
    )
    opt = de.Adam(0.001)
    state0 = de.create_slots(var, var.init(), opt)
    rng = np.random.default_rng(0)
    b0, b1 = BATCHES
    for unroll in (8, 16):
        pallas_ops._UNROLL = unroll
        for fresh, tag in ((False, "HIT"), (True, "MISS")):
            ts = {}
            for b in BATCHES:
                ids = jnp.asarray(
                    rng.integers(1, CAP * 2, size=b, dtype=np.int64))
                ts[b] = time_full(var, opt, state0, ids, fresh)
            s = (ts[b1] - ts[b0]) / (b1 - b0)
            print(f"unroll={unroll:2d} {tag:>4}: {s*1e9:6.1f} ns/key  "
                  f"[{ts[b0]*1e3:7.2f} ms, {ts[b1]*1e3:7.2f} ms]",
                  flush=True)


if __name__ == "__main__":
    main()
