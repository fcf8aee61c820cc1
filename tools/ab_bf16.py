"""Within-run f32 vs bf16 FULL-HIT train-step slopes (interleaved
timings; median of per-rep slopes — see bench.py _pair_slope).

    python tools/ab_bf16.py [dim] [log2_cap]
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


def build(value_dtype, name):
    var = de.Variable(name=name, dim=DIM, init_capacity=CAP,
                      value_dtype=value_dtype,
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

    @jax.jit
    def run(state, ids):
        def step(st, i):
            emb, ctx = var.embedding_lookup(st, ids)
            st = var.apply_gradients(
                st, ctx, (emb * 0.01).astype(emb.dtype), opt, step=i)
            return st, ()
        out, _ = jax.lax.scan(step, state,
                              jnp.arange(STEPS, dtype=jnp.int32))
        return out

    for b in BATCHES:
        _ = float(jnp.sum(run(state, ids[b]).scores[:2]))
    return run, state, ids


def main():
    variants = {
        "f32": build(jnp.float32, "ab16_f32"),
        "bf16": build(jnp.bfloat16, "ab16_bf16"),
    }
    b0, b1 = BATCHES
    slopes = {k: [] for k in variants}
    for _rep in range(5):
        for k, (run, state, ids) in variants.items():
            ts = {}
            for b in BATCHES:
                t0 = time.perf_counter()
                _ = float(jnp.sum(run(state, ids[b]).scores[:2]))
                ts[b] = time.perf_counter() - t0
            slopes[k].append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
    for k in variants:
        s = sorted(slopes[k])[len(slopes[k]) // 2]
        print(f"{k:>5}: {s * 1e9:6.1f} ns/key "
              f"({1.0 / s / 1e6:.1f} M keys/s)", flush=True)


if __name__ == "__main__":
    main()
