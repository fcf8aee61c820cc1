"""Within-run A/B of the Pallas kernel geometry on the FULL-HIT step.

Monkeypatches pallas_ops' module constants (read at trace time) to build
one jitted train step per geometry, then times all variants INTERLEAVED
(the tunnel's throughput drifts ±20% across seconds; adjacent timings
keep variants comparable). Median-of-reps per-key slope.

    python tools/ab_tile.py
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

# (label, TILE, SUB, FUSED_NSEM, G_GROUP, G_NSEM)
GEOMS = [
    ("base 1024/64/4 g16", 1024, 64, 4, 16, 8),
    ("tile 2048", 2048, 64, 4, 16, 8),
    ("tile 4096", 4096, 64, 4, 16, 8),
    ("sub 128", 1024, 128, 4, 16, 8),
    ("sub 32/nsem8", 1024, 32, 8, 16, 8),
    ("g32", 1024, 64, 4, 32, 8),
]


def main():
    var = de.Variable(name="abtile", dim=DIM, init_capacity=CAP,
                      initializer=jax.nn.initializers.normal(0.05))
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    rng = np.random.default_rng(0)
    pool = rng.choice(np.arange(1, CAP * 2, dtype=np.int64),
                      size=sum(BATCHES), replace=False)
    ids = {BATCHES[0]: jnp.asarray(pool[:BATCHES[0]]),
           BATCHES[1]: jnp.asarray(pool[BATCHES[0]:])}
    fill = jax.jit(lambda s, k: var.upsert(
        s, k, jnp.zeros((k.shape[0], DIM))), donate_argnums=0)
    for b in BATCHES:
        state = fill(state, ids[b])
    state = jax.block_until_ready(state)

    runs = {}
    for label, tile, sub, nsem, ggrp, gnsem in GEOMS:
        pallas_ops._TILE, pallas_ops._SUB = tile, sub
        pallas_ops._FUSED_NSEM = nsem
        pallas_ops._G_GROUP, pallas_ops._G_NSEM = ggrp, gnsem

        def make(label=label):
            @jax.jit
            def run(state, ids):
                def step(st, i):
                    emb, ctx = var.embedding_lookup(st, ids)
                    st = var.apply_gradients(st, ctx, emb * 0.01, opt,
                                             step=i)
                    return st, ()
                out, _ = jax.lax.scan(
                    step, state, jnp.arange(STEPS, dtype=jnp.int32))
                return out
            return run

        run = make()
        for b in BATCHES:  # compile now, with the patched constants
            _ = float(jnp.sum(run(state, ids[b]).scores[:2]))
        runs[label] = run
        print("compiled", label, flush=True)

    slopes = {label: [] for label, *_ in GEOMS}
    b0, b1 = BATCHES
    for _rep in range(5):
        for label, *_ in GEOMS:
            ts = {}
            for b in BATCHES:
                t0 = time.perf_counter()
                _ = float(jnp.sum(runs[label](state, ids[b]).scores[:2]))
                ts[b] = time.perf_counter() - t0
            slopes[label].append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
    for label, *_ in GEOMS:
        s = sorted(slopes[label])[len(slopes[label]) // 2]
        print(f"{label:>22}: {s * 1e9:6.1f} ns/key", flush=True)


if __name__ == "__main__":
    main()
