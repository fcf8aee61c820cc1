"""A/B bucket_size 64 vs 32 on the scored train step (hit + miss cycles).

The tunnel's device throughput drifts +-20% between measurement blocks, so
the two bucket variants are timed ADJACENTLY inside each rep and the
per-rep RATIO medians are reported alongside the slopes (bench.py
_pair_slope methodology, extended to a 2x2 grid: variant x batch).

    python tools/ab_bucket.py [dim] [log2_capacity]
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

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CAP = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 21)
BATCHES = (1 << 13, 1 << 16)
STEPS = 10
REPS = 7


def build(bucket):
    var = de.Variable(
        name=f"ab_b{bucket}", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05), bucket_size=bucket,
    )
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    return var, opt, state


def make_run(var, opt, fresh_keys):
    @jax.jit
    def run(state, ids):
        def step(st, i):
            sub = ids ^ (i + 1).astype(ids.dtype) if fresh_keys else ids
            emb, ctx = var.embedding_lookup(st, sub, step=i + 2)
            st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
            return st, ()
        out, _ = jax.lax.scan(step, state,
                              jnp.arange(STEPS, dtype=jnp.int32))
        return out
    return run


def main():
    rng = np.random.default_rng(0)
    b0, b1 = BATCHES
    pool = rng.choice(np.arange(1, CAP * 2, dtype=np.int64),
                      size=b0 + b1, replace=False)
    ids0, ids1 = jnp.asarray(pool[:b0]), jnp.asarray(pool[b0:])

    setups = {}
    for bucket in (64, 32):
        var, opt, state = build(bucket)
        fill = jax.jit(lambda s, k, v=var: v.upsert(
            s, k, jnp.zeros((k.shape[0], DIM))), donate_argnums=0)
        for ids in (ids0, ids1):
            state = fill(state, ids)
        setups[bucket] = (var, opt, jax.block_until_ready(state))

    for label, fresh in (("HIT", False), ("MISS", True)):
        runs = {}
        for bucket, (var, opt, state) in setups.items():
            run = make_run(var, opt, fresh)
            for ids in (ids0, ids1):  # compile + warm
                _ = float(jnp.sum(run(state, ids).scores[:2]))
            runs[bucket] = (run, state)
        slopes = {64: [], 32: []}
        for _rep in range(REPS):
            for bucket, (run, state) in runs.items():
                ts = {}
                for ids in (ids0, ids1):
                    t0 = time.perf_counter()
                    _ = float(jnp.sum(run(state, ids).scores[:2]))
                    ts[ids.shape[0]] = time.perf_counter() - t0
                slopes[bucket].append(
                    (ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
        med = {b: sorted(s)[len(s) // 2] for b, s in slopes.items()}
        ratios = sorted(a / b for a, b in zip(slopes[32], slopes[64]))
        print(f"{label}: B64 {med[64]*1e9:6.1f} ns/key   "
              f"B32 {med[32]*1e9:6.1f} ns/key   "
              f"median per-rep ratio B32/B64 {ratios[len(ratios)//2]:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
