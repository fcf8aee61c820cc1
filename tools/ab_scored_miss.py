"""A/B classic vs scored lookup on the all-miss insert cycle, timed
ADJACENTLY per rep (tunnel drift discipline — bench.py _pair_slope).

    python tools/ab_scored_miss.py [dim] [log2_capacity]
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


def main():
    var = de.Variable(name="ab_sm", dim=DIM, init_capacity=CAP,
                      initializer=jax.nn.initializers.normal(0.05))
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    rng = np.random.default_rng(0)
    b0, b1 = BATCHES
    pool = rng.choice(np.arange(1, CAP * 2, dtype=np.int64),
                      size=b0 + b1, replace=False)
    ids0, ids1 = jnp.asarray(pool[:b0]), jnp.asarray(pool[b0:])
    fill = jax.jit(lambda s, k: var.upsert(
        s, k, jnp.zeros((k.shape[0], DIM))), donate_argnums=0)
    for ids in (ids0, ids1):
        state = fill(state, ids)
    state = jax.block_until_ready(state)

    def make_run(scored):
        @jax.jit
        def run(state, ids):
            def step(st, i):
                sub = ids ^ (i + 1).astype(ids.dtype)  # all-miss
                kw = {"step": i + 2} if scored else {}
                emb, ctx = var.embedding_lookup(st, sub, **kw)
                st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
                return st, ()
            out, _ = jax.lax.scan(step, state,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return out
        return run

    runs = {"classic": make_run(False), "scored": make_run(True)}
    for run in runs.values():
        for ids in (ids0, ids1):
            _ = float(jnp.sum(run(state, ids).scores[:2]))
    slopes = {k: [] for k in runs}
    for _rep in range(REPS):
        for name, run in runs.items():
            ts = {}
            for ids in (ids0, ids1):
                t0 = time.perf_counter()
                _ = float(jnp.sum(run(state, ids).scores[:2]))
                ts[ids.shape[0]] = time.perf_counter() - t0
            slopes[name].append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
    med = {k: sorted(v)[len(v) // 2] for k, v in slopes.items()}
    ratios = sorted(s / c for s, c in zip(slopes["scored"],
                                          slopes["classic"]))
    print(f"MISS classic {med['classic']*1e9:6.1f} ns/key   "
          f"scored {med['scored']*1e9:6.1f} ns/key   "
          f"median per-rep ratio scored/classic "
          f"{ratios[len(ratios)//2]:.3f}", flush=True)


if __name__ == "__main__":
    main()
