"""Decompose the train-step per-key cost on the real chip.

Stage variants run inside one jit'd lax.scan at two batch sizes; the
difference of marginal slopes isolates each stage's per-key cost
(tunnel-safe methodology — see bench.py docstring). Every variant carries
the state through the scan AND returns it from the jit, with an
accumulator reading a post-write element, so XLA cannot dead-code-eliminate
the stage under test. Hit-path variants draw ids from the prefilled pool
(every key resident) and perturb one key plane element per iteration so
loop-invariant code motion cannot hoist the stage.

    python tools/profile_step.py [dim] [log2_capacity] [name-substr ...]

Trailing args filter the variant list by substring (case-insensitive), e.g.
``python tools/profile_step.py 64 21 "FULL HIT" segsum``.
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
    _ = float(acc)  # force completion through the tunnel
    best = float("inf")
    for _rep in range(3):  # min over reps: robust to tunnel hiccups
        t0 = time.perf_counter()
        st, acc = run(state, ids)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    var = de.Variable(
        name="prof_table", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05),
        bucket_size=int(os.environ.get("TFRA_PROF_BUCKET", "64")),
    )
    spec = var.spec
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    rng = np.random.default_rng(0)
    pool = rng.integers(1, CAP * 2, size=1 << 17, dtype=np.int64)
    pool = np.unique(pool)
    # prefill in fixed-size chunks: one small jit reused, bounded peak HBM
    print(f"prefill {len(pool)} keys ...", flush=True)
    chunk = 1 << 14
    n_fill = len(pool) // chunk * chunk
    fill_fn = jax.jit(
        lambda st, k, v: var.upsert(st, k, v), donate_argnums=0)
    zeros = jnp.zeros((chunk, DIM))
    for off in range(0, n_fill, chunk):
        state = fill_fn(state, jnp.asarray(pool[off:off + chunk]), zeros)
    pool = pool[:n_fill]
    state = jax.block_until_ready(state)
    print("prefill done", flush=True)
    # an EMPTY slot whose key_lo we can perturb without evicting any pool
    # key (perturbing an OCCUPIED slot would silently turn hit-path
    # variants into miss-path ones)
    empty_slot = int(np.argmin(np.asarray(
        hashtable.occupancy_mask(spec, state))))

    def touch_state(st):
        return (st.rows[0, 0].astype(jnp.float32)
                + st.scores[0].astype(jnp.float32)
                + st.key_lo[0].astype(jnp.float32))

    def perturb(st, i):
        # defeat loop-invariant hoisting for read-only bodies; the touched
        # slot is EMPTY so no resident key changes (its key_hi keeps the
        # EMPTY sentinel high bits, so no batch key can false-match either)
        return st.replace(key_lo=st.key_lo.at[empty_slot].add(i))

    def fresh(ids, i):
        return ids ^ (i + 1).astype(ids.dtype)

    # -- stage variants ----------------------------------------------------

    def v_unique(st, ids, i):
        u, inv = hashtable.unique_static(fresh(ids, i))
        return st, u[0].astype(jnp.float32) + inv[0]

    def v_find_hit(st, ids, i):
        st = perturb(st, i)
        slot, found = hashtable.find(spec, st, ids)
        return st, (jnp.sum(slot) + jnp.sum(found)).astype(jnp.float32)

    def v_fastplan_hit(st, ids, i):
        st = perturb(st, i)
        u, inv, (slot, found, ins, drop) = hashtable.plan_lookup_fast(
            spec, st, ids)
        return st, (jnp.sum(slot) + inv[0]).astype(jnp.float32)

    def v_plan_miss(st, ids, i):
        u, inv, (slot, found, ins, drop) = hashtable.plan_lookup_fast(
            spec, st, fresh(ids, i))
        return st, (jnp.sum(slot) + inv[0]).astype(jnp.float32)

    def v_gather_hit(st, ids, i):
        u, inv = hashtable.unique_static(fresh(ids, i))
        slot = (hashtable.hashing.mix64(u) & np.uint64(CAP - 1)).astype(
            jnp.int32)
        packed = hashtable.gather_packed(
            st, slot, jnp.ones(slot.shape, bool))
        return st, packed[0, 0] + inv[0]

    def v_scatter_hit(st, ids, i):
        u, inv = hashtable.unique_static(fresh(ids, i))
        slot = (hashtable.hashing.mix64(u) & np.uint64(CAP - 1)).astype(
            jnp.int32)
        packed = jnp.full((slot.shape[0], st.width), 0.5, st.value_dtype)
        st = hashtable.scatter_packed(
            st, slot, jnp.ones(slot.shape, bool), packed)
        return st, touch_state(st)

    def v_lookup_hit(st, ids, i):
        st = perturb(st, i)
        emb, ctx = var.embedding_lookup(st, ids)
        return st, jnp.sum(emb[:, 0]) + jnp.sum(ctx.packed[:, 0])

    def v_full_miss(st, ids, i):
        emb, ctx = var.embedding_lookup(st, fresh(ids, i))
        st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
        return st, touch_state(st)

    def v_full_hit(st, ids, i):
        emb, ctx = var.embedding_lookup(st, ids)
        st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
        return st, touch_state(st)

    def v_full_hit_scored(st, ids, i):
        # step at lookup: the LRU score scatter doubles as the dup probe
        # (i+2 stays fresh vs the prefill's score-1 stamps)
        emb, ctx = var.embedding_lookup(st, ids, step=i + 2)
        st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
        return st, touch_state(st)

    def v_lookup_scored(st, ids, i):
        # scored lookup ONLY (no apply): with dup ids this isolates the
        # dedup branch's lookup-side cost vs the pristine branch
        emb, ctx = var.embedding_lookup(st, ids, step=i + 2)
        return st, jnp.sum(emb[:, 0]) + jnp.sum(
            ctx.scores[:4].astype(jnp.float32))

    def v_full_miss_scored(st, ids, i):
        emb, ctx = var.embedding_lookup(st, fresh(ids, i), step=i + 2)
        st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
        return st, touch_state(st)

    def v_segsum(st, ids, i):
        # cost of reduce_gradient's scatter-add alone (random indices)
        st = perturb(st, i)
        g = jnp.broadcast_to(
            ids[:, None].astype(jnp.float32) * 1e-9, (ids.shape[0], DIM))
        inv = (hashtable.hashing.mix64(fresh(ids, i))
               % np.uint64(ids.shape[0])).astype(jnp.int32)
        out = jax.ops.segment_sum(g, inv, num_segments=ids.shape[0])
        return st, out[0, 0]

    def v_emb_gather(st, ids, i):
        st = perturb(st, i)
        g = jnp.broadcast_to(
            ids[:, None].astype(jnp.float32) * 1e-9, (ids.shape[0], DIM))
        inv = (hashtable.hashing.mix64(fresh(ids, i))
               % np.uint64(ids.shape[0])).astype(jnp.int32)
        return st, g[inv][0, 0]

    def v_keyscore(st, ids, i):
        st = perturb(st, i)
        u, inv, plan = hashtable.plan_lookup_fast(spec, st, ids)
        scores, mode = var.scores_for(u, step=i)
        st = hashtable.commit_keys_scores(spec, st, u, plan, scores=scores,
                                          score_mode=mode)
        return st, touch_state(st)

    def v_full_hit_unique(st, ids, i):
        # FULL HIT minus segment-sum + emb materialization: grads fed
        # per-unique-row directly
        from recommenders_addons_tpu.ops import optimizer as opt_lib

        emb, ctx = var.embedding_lookup(st, ids)
        st = opt_lib.apply_gradients(var, st, ctx, ctx.rows * 0.01, opt,
                                     step=i, already_unique=True)
        return st, touch_state(st)

    def v_plan_gather(st, ids, i):
        # fastplan + the packed gather, no ctx/emb plumbing: the gather's
        # true in-situ cost is this minus "fastplan HIT"
        st = perturb(st, i)
        u, inv, (slot, found, ins, drop) = hashtable.plan_lookup_fast(
            spec, st, ids)
        packed = hashtable.gather_packed(st, slot, found)
        return st, jnp.sum(packed[:, 0]) + inv[0].astype(jnp.float32)

    def v_plan_gather_phys(st, ids, i):
        # same but consuming the PHYSICAL gather output (no [N*ch,128] ->
        # [N,W] relayout): prices the relayout by difference
        from recommenders_addons_tpu.ops import pallas_ops

        st = perturb(st, i)
        u, inv, (slot, found, ins, drop) = hashtable.plan_lookup_fast(
            spec, st, ids)
        idx = jnp.where(found, slot, st.capacity)
        phys = pallas_ops.gather_rows_2d(st.rows, st.chunks, idx,
                                         cap=st.capacity, masked=False,
                                         flat=True)
        return st, jnp.sum(phys[:, 0]) + inv[0].astype(jnp.float32)

    def v_plan_gather2(st, ids, i):
        # plan + TWO packed gathers: (this - "plan+gather") = the gather's
        # true in-situ marginal cost, immune to cross-variant drift
        st = perturb(st, i)
        u, inv, (slot, found, ins, drop) = hashtable.plan_lookup_fast(
            spec, st, ids)
        packed = hashtable.gather_packed(st, slot, found)
        packed2 = hashtable.gather_packed(st, jnp.roll(slot, 1), found)
        return st, (jnp.sum(packed[:, 0]) + jnp.sum(packed2[:, 0])
                    + inv[0].astype(jnp.float32))

    def v_apply_noscore(st, ids, i):
        # lookup + fused kernel WITHOUT the key/score commit: isolates the
        # kernel + block prep from commit_keys_scores in situ
        from recommenders_addons_tpu.ops import optimizer as opt_lib

        emb, ctx = var.embedding_lookup(st, ids)
        grads = ctx.rows * 0.01
        o = opt_lib.resolve_for(opt, var)
        blocks, tile_fn = opt_lib._fused_rows_pf1(var, st, ctx, grads, o)
        from recommenders_addons_tpu.ops import pallas_ops
        write = ctx.found | ctx.inserted
        idx = jnp.where(write, ctx.slot, st.capacity)
        new_rows = pallas_ops.fused_update_scatter_refs(
            st.rows, st.chunks, idx, blocks, tile_fn,
            cap=st.capacity, step=jnp.asarray(i, jnp.float32))
        st = st.replace(rows=new_rows)
        return st, touch_state(st)

    def v_blocks_prep(st, ids, i):
        # lookup + the fused kernel's XLA-side block prep, fully consumed
        # (no kernel): prices the mask/grads materializations
        emb, ctx = var.embedding_lookup(st, ids)
        grads = ctx.rows * 0.01
        dt = ctx.rows.dtype
        mask = ctx.found[:, None].astype(dt) * jnp.ones((1, DIM), dt)
        write = ctx.found | ctx.inserted
        idx = jnp.where(write, ctx.slot, st.capacity)
        acc = (jnp.sum(mask) + jnp.sum(grads)
               + jnp.sum(idx.astype(jnp.float32))
               + jnp.sum(ctx.packed[:, 0]))
        return st, acc

    variants = [
        ("unique", v_unique, False),
        ("find HIT", v_find_hit, True),
        ("fastplan HIT", v_fastplan_hit, True),
        ("plan MISS", v_plan_miss, False),
        ("gather DMA", v_gather_hit, False),
        ("scatter DMA", v_scatter_hit, False),
        ("lookup HIT", v_lookup_hit, True),
        ("segsum", v_segsum, True),
        ("emb gather", v_emb_gather, True),
        ("keyscore HIT", v_keyscore, True),
        ("FULL HIT uniq", v_full_hit_unique, True),
        ("blocks prep", v_blocks_prep, True),
        ("plan+gather", v_plan_gather, True),
        ("plan+gather2", v_plan_gather2, True),
        ("plan+gatherP", v_plan_gather_phys, True),
        ("apply noscore", v_apply_noscore, True),
        ("FULL MISS", v_full_miss, False),
        ("FULL HIT", v_full_hit, True),
        ("FULL HIT scored", v_full_hit_scored, True),
        ("FULL MISS scored", v_full_miss_scored, False),
        # dup-batch tier: same bodies on 50%-unique resident batches (the
        # dedup branch runs for the whole batch) — deltas vs the pristine
        # variants price the dedup branch in situ
        ("lookupS HIT", v_lookup_scored, True),
        ("lookupS dup", v_lookup_scored, "dup"),
        ("FULL dup scored", v_full_hit_scored, "dup"),
    ]

    b0, b1 = BATCHES
    print(f"dim={DIM} cap={CAP} batches={BATCHES} "
          f"device={jax.devices()[0].device_kind} pool={len(pool)}",
          flush=True)
    for name, body, hit in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        ts = {}
        for b in BATCHES:
            if hit == "dup":
                half = pool[rng.permutation(len(pool))[:b // 2]]
                ids = jnp.asarray(rng.permutation(np.tile(half, 2)))
            elif hit:
                ids = jnp.asarray(
                    pool[rng.permutation(len(pool))[:b]]
                    if b <= len(pool)
                    else np.resize(pool, b)
                )
            else:
                ids = jnp.asarray(
                    rng.integers(1, CAP * 2, size=b, dtype=np.int64))
            ts[b] = timed_scan(body, state, ids)
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>14}: {s * 1e9:7.1f} ns/key   "
              f"[{ts[b0]*1e3:7.2f} ms @ {b0}, {ts[b1]*1e3:7.2f} ms @ {b1}]",
              flush=True)


if __name__ == "__main__":
    main()
