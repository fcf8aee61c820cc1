"""Price the sharded routing glue's primitives on the chip (VERDICT r4:
close the sharded-vs-single gap 1.51x -> 1.3x).

The 1-device-mesh sharded step pays, over the single-table step: two
int32 key-plane element scatters into the [S*K] send buffer, the
``taken = back[send_pos]`` [N, D] row gather, the grad-route
``gbuf.at[pos].set(g)`` [N, D] row scatter, plus hash/valid/misc
elementwise passes. All buffers here are BATCH-sized (the measured
3-6 ns/key element-scatter price in CLAUDE.md is for [C]-sized columns;
batch-sized behavior is what routing actually sees).

    python tools/ab_route.py [dim] [log2_n] [name-substr ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ONLY = [a.lower() for a in sys.argv[3:]]
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def timed_scan(body, ids, steps=STEPS):
    @jax.jit
    def run(ids):
        def step(acc, i):
            acc2 = body(ids, i)
            return acc + acc2, ()
        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(steps, dtype=jnp.int32))
        return acc

    acc = run(ids)
    _ = float(acc)
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        acc = run(ids)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    rng = np.random.default_rng(0)

    def _perm(ids, i):
        # pseudo send positions: a permutation-ish index vector dependent
        # on i (defeats hoisting); int32 in [0, N)
        n = ids.shape[0]
        x = (ids ^ i.astype(ids.dtype)).astype(jnp.uint32)
        return (x % np.uint32(n)).astype(jnp.int32)

    def v_noop(ids, i):
        return (ids[0] + i).astype(jnp.float32)

    def v_scatter_2planes(ids, i):
        n = ids.shape[0]
        pos = _perm(ids, i)
        lo = ids.astype(jnp.int32)
        hi = (ids >> 32).astype(jnp.int32)
        a = jnp.zeros((n,), jnp.int32).at[pos].set(lo, mode="drop")
        b = jnp.zeros((n,), jnp.int32).at[pos].set(hi, mode="drop")
        return (a[0] + b[0]).astype(jnp.float32)

    def v_scatter_iota_gather2(ids, i):
        n = ids.shape[0]
        pos = _perm(ids, i)
        iota = jnp.arange(n, dtype=jnp.int32)
        inv = jnp.zeros((n,), jnp.int32).at[pos].set(iota, mode="drop")
        lo = ids.astype(jnp.int32)[inv]
        hi = (ids >> 32).astype(jnp.int32)[inv]
        return (lo[0] + hi[0]).astype(jnp.float32)

    def v_scatter_rows2(ids, i):
        n = ids.shape[0]
        pos = _perm(ids, i)
        lo = ids.astype(jnp.int32)
        hi = (ids >> 32).astype(jnp.int32)
        rows = jnp.stack([lo, hi], axis=-1)  # [N, 2]
        buf = jnp.zeros((n, 2), jnp.int32).at[pos].set(rows, mode="drop")
        return (buf[0, 0] + buf[0, 1]).astype(jnp.float32)

    def v_gather_rows_d(ids, i):
        n = ids.shape[0]
        pos = _perm(ids, i)
        back = jnp.broadcast_to(
            ids[:, None].astype(jnp.float32), (n, DIM)) + 0.0
        taken = back[pos]
        return taken[0, 0]

    def v_scatter_rows_d(ids, i):
        n = ids.shape[0]
        pos = _perm(ids, i)
        g = jnp.broadcast_to(
            (ids + i.astype(ids.dtype))[:, None].astype(jnp.float32),
            (n, DIM))
        buf = jnp.zeros((n, DIM), jnp.float32).at[pos].set(g, mode="drop")
        return buf[0, 0]

    def v_hash_owner(ids, i):
        from recommenders_addons_tpu.ops import hashing
        owner = hashing.shard_of(ids ^ i.astype(ids.dtype), 8)
        return owner[0].astype(jnp.float32)

    def v_onehot_rank8(ids, i):
        n = ids.shape[0]
        owner = (_perm(ids, i) & 7)
        valid = ids != jnp.int64(-(2 ** 63))
        oh = owner[:, None] == jnp.arange(8, dtype=owner.dtype)[None, :]
        oh = jnp.where(valid[:, None], oh, False)
        csum = jnp.cumsum(oh.astype(jnp.int32), axis=0)
        rank = jnp.sum(jnp.where(oh, csum - 1, 0), axis=1,
                       dtype=jnp.int32)
        return rank[0].astype(jnp.float32)

    variants = [
        ("noop", v_noop),
        ("scatter_2planes", v_scatter_2planes),
        ("scatter_iota_gather2", v_scatter_iota_gather2),
        ("scatter_rows2", v_scatter_rows2),
        ("gather_rows_d", v_gather_rows_d),
        ("scatter_rows_d", v_scatter_rows_d),
        ("hash_owner", v_hash_owner),
        ("onehot_rank8", v_onehot_rank8),
    ]

    b0, b1 = BATCHES
    print(f"dim={DIM} batches={BATCHES} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    ids_by_b = {
        b: jnp.asarray(rng.integers(1, 1 << 62, size=b, dtype=np.int64))
        for b in BATCHES
    }
    for name, body in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        ts = {b: timed_scan(body, ids_by_b[b]) for b in BATCHES}
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>20}: {s * 1e9:7.2f} ns/key   "
              f"[{ts[b0]*1e3:7.2f} ms @ {b0}, {ts[b1]*1e3:7.2f} ms @ {b1}]",
              flush=True)


if __name__ == "__main__":
    main()
