"""Decompose plan_lookup (miss-path planning) cost on the chip: full plan
vs kth-eviction stubbed vs sort alone — one process, min-of-3.

    python tools/ab_plan_miss.py
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
from recommenders_addons_tpu.ops import hashing, hashtable

DIM = 64
CAP = 1 << 21
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def timed(body, state, ids):
    def fn(state, ids):
        def step(acc, i):
            out = body(state, ids ^ (i + 1).astype(ids.dtype))
            return acc + out, ()
        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    run = jax.jit(fn)
    acc = run(state, ids)
    _ = float(acc)
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        acc = run(state, ids)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    var = de.Variable(name="abp_table", dim=DIM, init_capacity=CAP,
                      initializer=jax.nn.initializers.normal(0.05))
    spec = var.spec
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    # fill the table so eviction planning is exercised (full buckets)
    rng = np.random.default_rng(0)
    chunk = 1 << 14
    fill_fn = jax.jit(lambda st, k, v: var.upsert(st, k, v),
                      donate_argnums=0)
    zeros = jnp.zeros((chunk, DIM))
    for off in range(0, CAP + chunk, chunk):
        keys = rng.integers(1, 2**62, chunk, dtype=np.int64)
        state = fill_fn(state, jnp.asarray(keys), zeros)
    state = jax.block_until_ready(state)
    print(f"table filled: size={int(var.size(state))}/{CAP}", flush=True)

    def v_sort_only(st, ids):
        m = hashing.mix(ids)
        nb_bits = spec.num_buckets.bit_length() - 1
        rot = (m << (64 - nb_bits)) | (m >> nb_bits)
        rot_s, order = jax.lax.sort(
            (rot, jnp.arange(ids.shape[0], dtype=jnp.int32)), num_keys=1)
        return rot_s[0].astype(jnp.float32) + order[0]

    def v_plan_full(st, ids):
        u, inv, (slot, found, ins, drop) = hashtable.plan_lookup(
            spec, st, ids)
        return (jnp.sum(slot) + inv[0]).astype(jnp.float32)

    real_kth = hashtable._kth_lowest_slot

    def v_plan_nokth(st, ids):
        hashtable._kth_lowest_slot = lambda sc, k: jnp.zeros_like(k)
        try:
            u, inv, (slot, found, ins, drop) = hashtable.plan_lookup(
                spec, st, ids)
        finally:
            hashtable._kth_lowest_slot = real_kth
        return (jnp.sum(slot) + inv[0]).astype(jnp.float32)

    b0, b1 = BATCHES
    for name, body in (("sort only", v_sort_only),
                       ("plan full", v_plan_full),
                       ("plan nokth", v_plan_nokth)):
        ts = {}
        for b in BATCHES:
            ids = jnp.asarray(rng.integers(1, 2**62, b, dtype=np.int64))
            ts[b] = timed(body, state, ids)
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>11}: {s*1e9:6.1f} ns/key  "
              f"[{ts[b0]*1e3:6.2f} ms, {ts[b1]*1e3:6.2f} ms]", flush=True)


if __name__ == "__main__":
    main()
