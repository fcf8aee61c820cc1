"""Price the XLA glue around the hot-path kernels on the real chip.

Each variant isolates one suspected cost of the FULL HIT train step
(profile_step.py waterfall). Scan-slope methodology (bench.py docstring);
every body consumes the iteration index so loop-invariant code motion
cannot hoist it, and returns a scalar read so nothing is DCE'd.

    python tools/ab_glue.py [dim] [log2_cap] [name-substr ...]
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
from recommenders_addons_tpu.ops import hashtable

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CAP = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 21)
ONLY = [a.lower() for a in sys.argv[3:]]
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def timed_scan(body, state, ids, steps=STEPS):
    @jax.jit
    def run(state, ids):
        def step(carry, i):
            st, acc = carry
            st, acc2 = body(st, ids, i)
            return (st, acc + acc2), ()
        (st, acc), _ = jax.lax.scan(
            step, (state, jnp.zeros((), jnp.float32)),
            jnp.arange(steps, dtype=jnp.int32),
        )
        return st, acc

    st, acc = run(state, ids)
    _ = float(acc)
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        st, acc = run(state, ids)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    var = de.Variable(
        name="abglue_table", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05),
    )
    spec = var.spec
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)

    def v_noop(st, ids, i):
        return st, (ids[0] + i).astype(jnp.float32)

    def _slots(ids, i):
        # pseudo slots, dependent on i (defeat hoisting)
        return ((hashtable.hashing.mix64(ids ^ i.astype(ids.dtype))
                 % np.uint64(CAP))).astype(jnp.int32)

    def v_scatter_set_i32(st, ids, i):
        idx = _slots(ids, i)
        sc = st.scores.at[idx].set(
            jnp.broadcast_to(i, idx.shape).astype(st.scores.dtype),
            mode="drop")
        return st.replace(scores=sc), sc[0].astype(jnp.float32)

    def v_scatter_min_i32(st, ids, i):
        n = ids.shape[0]
        idx = _slots(ids, i)
        pos = jnp.arange(n, dtype=jnp.int32)
        size = (CAP + 1 + 127) // 128 * 128
        first = jnp.full((size,), n, jnp.int32).at[idx].min(pos)
        return st, first[0].astype(jnp.float32)

    def v_first_occurrence(st, ids, i):
        n = ids.shape[0]
        idx = _slots(ids, i)
        rep = hashtable._first_occurrence(idx, n, CAP)
        return st, rep[0].astype(jnp.float32)

    def v_split_key(st, ids, i):
        lo, hi = hashtable.split_key(ids ^ i.astype(ids.dtype))
        return st, (lo[0] + hi[0]).astype(jnp.float32)

    def v_take_elem(st, ids, i):
        idx = _slots(ids, i)
        v = hashtable.take_elem(st.scores, idx)
        return st, v[0].astype(jnp.float32)

    def v_mask_prep(st, ids, i):
        found = (ids & 1) == (i & 1).astype(ids.dtype)
        dt = jnp.float32
        mask = found[:, None].astype(dt) * jnp.ones((1, DIM), dt)
        return st, mask[0, 0]

    def v_copy_n64(st, ids, i):
        g = jnp.broadcast_to(
            (ids + i.astype(ids.dtype))[:, None].astype(jnp.float32),
            (ids.shape[0], DIM))
        out = g + 0.0  # one materialized [N, 64] pass
        return st, out[0, 0]

    def v_cond_passthrough(st, ids, i):
        n = ids.shape[0]
        big = jnp.broadcast_to(
            (ids + i.astype(ids.dtype))[:, None].astype(jnp.float32),
            (n, 4 * DIM))
        pred = (i & 1) == 0

        def a(_):
            return big * 1.0, ids
        def b(_):
            return big * 2.0, ids
        out, u = jax.lax.cond(pred, a, b, None)
        return st, out[0, 0] + u[0].astype(jnp.float32)

    def v_scores_commit(st, ids, i):
        # the full commit_keys_scores call with an all-hit plan shape
        n = ids.shape[0]
        slot = _slots(ids, i)
        found = jnp.ones((n,), bool)
        ins = jnp.zeros((n,), bool)
        plan = (slot, found, ins, ins)
        scores, mode = var.scores_for(ids, step=i)
        st = hashtable.commit_keys_scores(spec, st, ids, plan,
                                          scores=scores, score_mode=mode)
        return st, st.scores[0].astype(jnp.float32)

    def v_emb_gather_iden(st, ids, i):
        # rows[inverse] when inverse is an iota (the all-hit no-dup case)
        n = ids.shape[0]
        rows = jnp.broadcast_to(
            (ids + i.astype(ids.dtype))[:, None].astype(jnp.float32),
            (n, DIM))
        inv = jnp.arange(n, dtype=jnp.int32)
        emb = rows[inv]
        return st, emb[0, 0]

    def v_reduce_gradient(st, ids, i):
        # the production reduce_gradient on a dup-free batch
        n = ids.shape[0]
        g = jnp.broadcast_to(
            (ids + i.astype(ids.dtype))[:, None].astype(jnp.float32),
            (n, DIM))
        inv = jnp.arange(n, dtype=jnp.int32)
        out = jax.lax.cond(
            jnp.all(inv == jnp.arange(n, dtype=inv.dtype)),
            lambda _: g,
            lambda _: jax.ops.segment_sum(g, inv, num_segments=n),
            None,
        )
        return st, out[0, 0]

    variants = [
        ("noop", v_noop),
        ("scatter_set_i32", v_scatter_set_i32),
        ("scatter_min_i32", v_scatter_min_i32),
        ("first_occurrence", v_first_occurrence),
        ("split_key", v_split_key),
        ("take_elem", v_take_elem),
        ("mask_prep", v_mask_prep),
        ("copy_n64", v_copy_n64),
        ("cond_passthrough", v_cond_passthrough),
        ("scores_commit", v_scores_commit),
        ("emb_gather_iden", v_emb_gather_iden),
        ("reduce_gradient", v_reduce_gradient),
    ]

    b0, b1 = BATCHES
    rng = np.random.default_rng(0)
    print(f"dim={DIM} cap={CAP} batches={BATCHES} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    for name, body in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        ts = {}
        for b in BATCHES:
            ids = jnp.asarray(
                rng.integers(1, CAP * 2, size=b, dtype=np.int64))
            ts[b] = timed_scan(body, state, ids)
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>18}: {s * 1e9:7.2f} ns/key   "
              f"[{ts[b0]*1e3:7.2f} ms @ {b0}, {ts[b1]*1e3:7.2f} ms @ {b1}]",
              flush=True)


if __name__ == "__main__":
    main()
