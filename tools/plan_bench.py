"""Microbenchmark the all-hit dedup plan's pieces on the real chip.

The fastplan HIT stage costs ~21 ns/key over find (tools/profile_step.py).
It is three ops: a scatter-min of batch positions into a [C+1] buffer, an
element gather back out of it, and compare/where glue. This isolates each
(scan-slope methodology, min-of-3 — see bench.py docstring).

    python tools/plan_bench.py [log2_capacity]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CAP = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 21)
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def timed(body, *args):
    @jax.jit
    def run(*args):
        def step(acc, i):
            return acc + body(i, *args), ()
        acc, _ = jax.lax.scan(
            step, jnp.zeros((), jnp.float32),
            jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    acc = run(*args)
    _ = float(acc)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(*args)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    rng = np.random.default_rng(0)
    print(f"cap={CAP} device={jax.devices()[0].device_kind} "
          f"batches={BATCHES}")

    variants = {}

    def v_scatter_min(i, slot):
        n = slot.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        s = (slot + i) & (CAP - 1)
        first = jnp.full((CAP + 1,), n, jnp.int32).at[s].min(pos)
        return first[0].astype(jnp.float32)

    def v_scatter_set_uniq(i, slot):
        n = slot.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        s = (slot + i) & (CAP - 1)
        first = jnp.full((CAP + 1,), n, jnp.int32).at[s].set(
            pos, unique_indices=True, mode="drop")
        return first[0].astype(jnp.float32)

    def v_scatter_min_gather(i, slot):
        n = slot.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        s = (slot + i) & (CAP - 1)
        first = jnp.full((CAP + 1,), n, jnp.int32).at[s].min(pos)
        return jnp.sum(first[s]).astype(jnp.float32)

    def v_gather_only(i, slot, table):
        s = (slot + i) & (CAP - 1)
        return jnp.sum(table[s]).astype(jnp.float32)

    def v_full_hitplan(i, slot):
        n = slot.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        s = (slot + i) & (CAP - 1)
        found = slot >= 0  # all true, shape [N]
        sidx = jnp.where(found, s, CAP)
        first = jnp.full((CAP + 1,), n, jnp.int32).at[sidx].min(pos)
        rep = first[sidx]
        is_rep = (rep == pos) & found
        inverse = jnp.where(found, rep, pos)
        return (jnp.sum(inverse) + jnp.sum(is_rep)).astype(jnp.float32)

    def v_sort_dedup_i32(i, slot):
        # sort-based alternative on int32 slots
        n = slot.shape[0]
        s = (slot + i) & (CAP - 1)
        sk, order = jax.lax.sort(
            (s, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid)
        return (jnp.sum(inverse) + sk[0]).astype(jnp.float32)

    def v_rowgather_lane(i, slot, table):
        # element gather reformulated as row gather + lane select
        s = (slot + i) & (CAP - 1)
        tab_rows = table[: CAP + 128].reshape(-1, 128)
        rows = tab_rows[s >> 7]  # [N, 128]
        lane = (s & 127)[:, None]
        onehot = lane == jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        picked = jnp.sum(jnp.where(onehot, rows, 0), axis=1)
        return jnp.sum(picked).astype(jnp.float32)

    def v_full_hitplan_rowgather(i, slot):
        # full hit plan with the [C] element gather as row gather+select
        n = slot.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        s = (slot + i) & (CAP - 1)
        found = slot >= 0
        sidx = jnp.where(found, s, CAP)
        first = jnp.full((CAP + 128,), n, jnp.int32).at[sidx].min(pos)
        rows = first.reshape(-1, 128)[sidx >> 7]
        onehot = (sidx & 127)[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1)
        rep = jnp.sum(jnp.where(onehot, rows, 0), axis=1)
        is_rep = (rep == pos) & found
        inverse = jnp.where(found, rep, pos)
        return (jnp.sum(inverse) + jnp.sum(is_rep)).astype(jnp.float32)

    def v_full_hitplan_sort(i, slot, keys):
        # full sort-based hit plan incl. uniq keys + per-unique slot/found
        n = slot.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        s = (slot + i) & (CAP - 1)
        found = slot >= 0
        sidx = jnp.where(found, s, CAP)
        sk, order = jax.lax.sort((sidx, pos), num_keys=1)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid)
        ordered_keys = keys[order]  # [N] int64 gather from [N]
        klo = ordered_keys.astype(jnp.int32)
        khi = (ordered_keys >> 32).astype(jnp.int32)
        u_lo = jnp.zeros((n,), jnp.int32).at[gid].set(klo)
        u_hi = jnp.zeros((n,), jnp.int32).at[gid].set(khi)
        slot_u = jnp.zeros((n,), jnp.int32).at[gid].set(sk)
        found_u = jnp.zeros((n,), bool).at[gid].set(sk != CAP)
        return (jnp.sum(inverse) + u_lo[0] + u_hi[0] + slot_u[0]
                + jnp.sum(found_u)).astype(jnp.float32)

    n = BATCHES[1]
    slot = jnp.asarray(rng.integers(0, CAP, size=n, dtype=np.int32))
    table = jnp.asarray(rng.integers(0, n, size=CAP + 128, dtype=np.int32))
    keys64 = jnp.asarray(rng.integers(1, 1 << 62, size=n, dtype=np.int64))

    variants = [
        ("scatter-min [C]", v_scatter_min, (slot,)),
        ("scatter-set uniq [C]", v_scatter_set_uniq, (slot,)),
        ("scatter-min + gather", v_scatter_min_gather, (slot,)),
        ("elem gather [C]", v_gather_only, (slot, table)),
        ("rowgather+lane [C]", v_rowgather_lane, (slot, table)),
        ("full hit plan", v_full_hitplan, (slot,)),
        ("hit plan rowgather", v_full_hitplan_rowgather, (slot,)),
        ("hit plan sort", v_full_hitplan_sort, (slot, keys64)),
    ]
    b0, b1 = BATCHES
    for name, body, args in variants:
        ts = {}
        for b in BATCHES:
            a0 = tuple(x[:b] if x.shape[0] == n else x for x in args)
            ts[b] = timed(body, *a0)
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>22}: {s * 1e9:6.1f} ns/key  "
              f"[{ts[b0]*1e3:6.2f} ms, {ts[b1]*1e3:6.2f} ms]", flush=True)


if __name__ == "__main__":
    main()
