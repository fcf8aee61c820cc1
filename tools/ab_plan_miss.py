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

    # -- surgical stage variants: re-implementations of plan_lookup with
    # one stage stubbed/replaced (TIMING ONLY — outputs are wrong) ---------

    def _plan_body(st, ids, *, stub=()):
        """plan_lookup clone with named stages stubbed out."""
        spec_ = spec
        flat = ids.reshape(-1)
        n = flat.shape[0]
        cap = st.capacity
        bsz = spec_.bucket_size
        nb_bits = spec_.num_buckets.bit_length() - 1
        m = hashing.mix(flat)
        width = m.dtype.itemsize * 8
        rot = (m << (width - nb_bits)) | (m >> nb_bits)
        rot_s, order = jax.lax.sort(
            (rot, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        b_s = (rot_s >> (width - nb_bits)).astype(jnp.int32)
        m_s = (rot_s >> (width - nb_bits)) | (rot_s << nb_bits)
        if "unmix" in stub:
            sk = m_s.astype(flat.dtype)
        else:
            sk = hashing.unmix(m_s, flat.dtype)
        sk_lo, sk_hi = hashtable.split_key(sk.astype(jnp.int64))
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), rot_s[1:] != rot_s[:-1]])
        gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        if "dedup_scatter" in stub:
            uniq = sk
            inverse = gid
        else:
            f_lo, f_hi = hashtable.split_key(
                jnp.asarray(spec_.empty_key, jnp.int64))
            u_lo = jnp.full((n,), f_lo, jnp.int32).at[gid].set(sk_lo)
            u_hi = jnp.full((n,), f_hi, jnp.int32).at[gid].set(sk_hi)
            uniq = hashtable.join_key(u_lo, u_hi).astype(flat.dtype)
            inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid)
        e_lo, e_hi = hashtable.split_key(
            jnp.asarray(spec_.empty_key, jnp.int64))
        if "probe" in stub:
            match = jnp.zeros((n, bsz), bool)
            cl = jnp.zeros((n, bsz), jnp.int32)
            ch = jnp.zeros((n, bsz), jnp.int32)
        else:
            cl = hashtable._bucket_gather(spec_, st.key_lo, b_s)
            ch = hashtable._bucket_gather(spec_, st.key_hi, b_s)
            match = (cl == sk_lo[:, None]) & (ch == sk_hi[:, None])
        valid_s = sk != spec_.empty_key
        found_s = jnp.any(match, axis=-1) & valid_s
        pos_s = jnp.argmax(match, axis=-1).astype(jnp.int32)
        slot_found_s = b_s * np.int32(bsz) + pos_s
        need_s = is_start & valid_s & ~found_s
        ind = need_s.astype(jnp.int32)
        pre = jnp.cumsum(ind) - ind
        is_bstart = jnp.concatenate(
            [jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
        base = jax.lax.cummax(jnp.where(is_bstart, pre, 0))
        rank_s = pre - base
        if "claimed" in stub:
            claimed_b = jnp.zeros((n, bsz), bool)
        else:
            claim_idx = jnp.where(is_start & found_s, slot_found_s, cap)
            claimed = jnp.zeros((cap,), jnp.bool_).at[claim_idx].set(
                True, mode="drop")
            claimed_b = hashtable._bucket_gather(spec_, claimed, b_s)
        empty_b = (cl == e_lo) & (ch == e_hi)
        free_b = empty_b & ~claimed_b
        num_free = jnp.sum(free_b, axis=-1).astype(jnp.int32)
        if "cf" in stub:
            kth_free = jnp.zeros((n,), jnp.int32)
        elif "cf_matmul" in stub:
            tri = jnp.tril(jnp.ones((bsz, bsz), jnp.float32))  # inclusive
            cf = jax.lax.dot(
                free_b.astype(jnp.float32), tri.T,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
            kth_free = jnp.argmax(cf == (rank_s + 1)[:, None],
                                  axis=-1).astype(jnp.int32)
        else:
            cf = jnp.cumsum(free_b.astype(jnp.int32), axis=-1)
            kth_free = jnp.argmax(cf == (rank_s + 1)[:, None],
                                  axis=-1).astype(jnp.int32)
        evictable_b = ~empty_b & ~claimed_b
        if "kth" in stub:
            kth_evict = jnp.zeros((n,), jnp.int32)
        else:
            sc = hashtable._bucket_gather(spec_, st.scores, b_s)
            sc = jnp.where(evictable_b, sc, np.int32(2**31 - 1))
            evict_rank = jnp.clip(rank_s - num_free, 0, bsz - 1)
            kth_evict = hashtable._kth_lowest_slot(sc, evict_rank)
        num_evictable = jnp.sum(evictable_b, axis=-1).astype(jnp.int32)
        use_free = rank_s < num_free
        dropped_s = need_s & (rank_s >= num_free + num_evictable)
        inserted_s = need_s & ~dropped_s
        pos_new = jnp.where(use_free, kth_free, kth_evict)
        slot_new_s = b_s * np.int32(bsz) + pos_new
        slot_s = jnp.where(found_s, slot_found_s, slot_new_s)
        if "out_scatter" in stub:
            return (jnp.sum(slot_s) + inverse[0] + uniq[0]).astype(
                jnp.float32)
        sidx = jnp.where(is_start, gid, n)
        slot = jnp.zeros((n,), jnp.int32).at[sidx].set(slot_s, mode="drop")
        found = jnp.zeros((n,), bool).at[sidx].set(found_s, mode="drop")
        inserted = jnp.zeros((n,), bool).at[sidx].set(
            inserted_s, mode="drop")
        return (jnp.sum(slot) + jnp.sum(inserted) + inverse[0]
                + uniq[0]).astype(jnp.float32)

    def stubbed(*names):
        return lambda st, ids: _plan_body(st, ids, stub=names)

    b0, b1 = BATCHES
    for name, body in (("sort only", v_sort_only),
                       ("plan full", v_plan_full),
                       ("plan nokth", v_plan_nokth),
                       ("clone full", stubbed()),
                       ("no unmix", stubbed("unmix")),
                       ("no dedup sc", stubbed("dedup_scatter")),
                       ("no probe", stubbed("probe")),
                       ("no claimed", stubbed("claimed")),
                       ("no cf", stubbed("cf")),
                       ("cf matmul", stubbed("cf_matmul")),
                       ("no kth", stubbed("kth")),
                       ("no out sc", stubbed("out_scatter"))):
        ts = {}
        for b in BATCHES:
            ids = jnp.asarray(rng.integers(1, 2**62, b, dtype=np.int64))
            ts[b] = timed(body, state, ids)
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>11}: {s*1e9:6.1f} ns/key  "
              f"[{ts[b0]*1e3:6.2f} ms, {ts[b1]*1e3:6.2f} ms]", flush=True)


if __name__ == "__main__":
    main()
