"""Attribute the sharded train step's cost over the single-table step on
a 1-device mesh (VERDICT r4: sharded 13.6-13.9 M vs 20.9 M headline).

Variants (adjacent timing, pair slopes, bench config dim 64 / cap 2Mi /
Adam / dup-free resident batches):

    single        the single-table scored train step (the headline)
    single_smap   the SAME step wrapped in shard_map over the 1-device
                  mesh (prices shard_map/jit plumbing alone)
    route_only    routing glue without the table: route + key exchange +
                  row exchange back + emb tail (zeros for rows)
    sharded       the full ShardedVariable step (the bench metric)
    sharded_fused the one-shard_map train_step API

Recorded results (v5e, 2026-08-20): single 44.2, single_smap 44.5-50.3
(wrap cost is within drift), route_only 13.7, sharded 72.0,
sharded_fused 72.4. Two findings: (a) the routing glue itself is ~14
ns/key — dominated by the [N, D] grad-route row scatter (~5.6,
tools/ab_route.py) and the valid/emb masking passes, NOT the key
scatters (the [N, 2] row-scatter form is ~free); (b) fusing
lookup+grads+apply into one shard_map is NEUTRAL — XLA fuses across
shard_map boundaries within a jit, the ctx never hits HBM. The
remaining sharded-vs-single gap beyond route_only (~14 ns) is diffuse
composition cost (probe/plan reading exchanged buffers instead of the
raw batch).

Round-5 results (after the scatter-iota grad route + the static skip
of the hot-key fallback at k >= n; adjacent run 2026-08-20): single
46.3, single_lookup 26.1, sharded_lookup 33.9 (lookup-side overhead
7.8 ns/key: key-buffer scatter + two degenerate all_to_alls + rank
cumsum + taken-gather masks), sharded 65.0, sharded_fused 63.4
(1.37-1.40x single; apply-side overhead ~11: grad route + recv copy +
combine cond). The same session's earlier run WITH the always-on
psum+fallback cond measured sharded 78.1 — the cond cost ~6 ns/key on
a mesh where overflow is impossible, hence the static skip.

    python tools/ab_sharded.py [name-substr ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops import hashtable
from recommenders_addons_tpu.parallel.sharded import ShardedVariable

ONLY = [a.lower() for a in sys.argv[1:]]
DIM = 64
CAP = 1 << 21
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def consume(out):
    if isinstance(out, hashtable.TableState):
        _ = float(jnp.sum(out.scores.reshape(-1)[:2]))
    else:
        _ = float(out.ravel()[0])


def timed_scan(run, state, ids):
    out = run(state, ids)
    consume(out)
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out = run(state, ids)
        consume(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    var = de.Variable(name="abs_t", dim=DIM, init_capacity=CAP,
                      initializer=jax.nn.initializers.normal(0.05))
    opt = de.Adam(0.001)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("ep",))
    svar = ShardedVariable(var=var, mesh=mesh)

    rng = np.random.default_rng(1)
    b0, b1 = BATCHES
    pool = rng.choice(np.arange(1, CAP * 2, dtype=np.int64),
                      size=b0 + b1, replace=False)
    ids_by_b = {b0: jnp.asarray(pool[:b0]), b1: jnp.asarray(pool[b0:])}

    # --- single-table state -------------------------------------------
    st1 = de.create_slots(var, var.init(), opt)
    fill1 = jax.jit(lambda s, k: var.upsert(
        s, k, jnp.zeros((k.shape[0], DIM))), donate_argnums=0)
    for b in BATCHES:
        st1 = fill1(st1, ids_by_b[b])

    # --- sharded state ------------------------------------------------
    sts = svar.create_slots(svar.init(), opt)
    fills = jax.jit(lambda s, k: svar.upsert(
        s, k, jnp.zeros((k.shape[0], DIM))), donate_argnums=0)
    for b in BATCHES:
        sts = fills(sts, ids_by_b[b])

    def mk_single():
        @jax.jit
        def run(state, ids):
            def step(st, i):
                emb, ctx = var.embedding_lookup(st, ids, step=i + 2)
                return var.apply_gradients(st, ctx, emb * 0.01, opt,
                                           step=i), ()
            out, _ = jax.lax.scan(step, state,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return out  # full state: nothing DCE-able
        return run, st1

    def mk_single_smap():
        sp = svar.state_pspec(sts)

        @jax.jit
        def run(state, ids):
            def step(st, i):
                def fn(st_b, ids_blk, i_b):
                    st_l = jax.tree.map(lambda x: x[0], st_b)
                    emb, ctx = var.embedding_lookup(
                        st_l, ids_blk, step=i_b + 2)
                    st_l = var.apply_gradients(st_l, ctx, emb * 0.01,
                                               opt, step=i_b)
                    return jax.tree.map(lambda x: x[None], st_l)
                st = shard_map(
                    fn, mesh=mesh, in_specs=(sp, P("ep"), P()),
                    out_specs=sp, check_vma=False)(st, ids, i)
                return st, ()
            out, _ = jax.lax.scan(step, state,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return out  # full state: nothing DCE-able
        return run, sts

    def mk_route_only():
        sp = svar.state_pspec(sts)
        s = svar.num_shards

        @jax.jit
        def run(state, ids):
            def step(carry, i):
                acc, st = carry

                def fn(st_b, ids_blk, i_b):
                    flat = ids_blk.reshape(-1)
                    n = flat.shape[0]
                    k = svar._k_per_pair(n)
                    buf2, send_pos, routed, num_dropped = svar._route(
                        flat ^ i_b.astype(flat.dtype), k)
                    recv = svar._exchange_keys(buf2, k)
                    rows = jnp.broadcast_to(
                        recv[:, None].astype(jnp.float32), (s * k, DIM))
                    back = jax.lax.all_to_all(
                        rows.reshape(s, k, DIM), "ep", 0, 0
                    ).reshape(s * k, DIM)
                    taken = back[jnp.clip(send_pos, 0, s * k - 1)]
                    valid = flat != svar.spec.empty_key
                    emb = jnp.where(valid[:, None], taken, 0)
                    # grad route-back glue
                    g = emb * 0.01
                    gbuf = jnp.zeros((s * k, DIM), g.dtype)
                    gbuf = gbuf.at[jnp.where(
                        routed, send_pos, s * k)].set(g, mode="drop")
                    # full-array reductions: single-element reads would
                    # let XLA slice the gathers/scatters down to nothing
                    return (jnp.sum(emb) + jnp.sum(gbuf)
                            + num_dropped.astype(emb.dtype))
                out = shard_map(
                    fn, mesh=mesh, in_specs=(sp, P("ep"), P()),
                    out_specs=P(), check_vma=False)(st, ids, i)
                return (acc + out, st), ()
            (acc, _), _ = jax.lax.scan(
                step, (jnp.zeros(()), state),
                jnp.arange(STEPS, dtype=jnp.int32))
            return acc.reshape(1)
        return run, sts

    def mk_single_lookup():
        @jax.jit
        def run(state, ids):
            def step(acc, i):
                emb, ctx = var.embedding_lookup(state, ids, step=i + 2)
                # consume emb AND the committed score plane so neither
                # the gather nor the scored probe can be DCE'd
                return acc + jnp.sum(emb) + jnp.sum(
                    ctx.scores.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc.reshape(1)
        return run, st1

    def mk_sharded_lookup():
        @jax.jit
        def run(state, ids):
            def step(acc, i):
                emb, ctx = svar.embedding_lookup(state, ids, step=i + 2)
                return acc + jnp.sum(emb) + jnp.sum(
                    ctx.octx.scores.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc.reshape(1)
        return run, sts

    def mk_sharded():
        @jax.jit
        def run(state, ids):
            def step(st, i):
                emb, ctx = svar.embedding_lookup(st, ids, step=i + 2)
                return svar.apply_gradients(st, ctx, emb * 0.01, opt,
                                            step=i), ()
            out, _ = jax.lax.scan(step, state,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return out  # full state: nothing DCE-able
        return run, sts

    def mk_sharded_fused():
        @jax.jit
        def run(state, ids):
            def step(st, i):
                st, _ = svar.train_step(
                    st, ids, lambda e: (e * 0.01, ()), opt, step=i + 2)
                return st, ()
            out, _ = jax.lax.scan(step, state,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return out  # full state: nothing DCE-able
        return run, sts

    variants = [
        ("single", mk_single),
        ("single_smap", mk_single_smap),
        ("route_only", mk_route_only),
        ("single_lookup", mk_single_lookup),
        ("sharded_lookup", mk_sharded_lookup),
        ("sharded", mk_sharded),
        ("sharded_fused", mk_sharded_fused),
    ]

    print(f"dim={DIM} cap={CAP} batches={BATCHES} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    for name, mk in variants:
        if ONLY and not any(sub in name.lower() for sub in ONLY):
            continue
        run, state = mk()
        ts = {b: timed_scan(run, state, ids_by_b[b]) for b in BATCHES}
        sl = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>12}: {sl * 1e9:7.2f} ns/key  "
              f"({1.0 / max(sl, 1e-12) / 1e6:6.1f} M keys/s)   "
              f"[{ts[b0]*1e3:7.2f} ms @ {b0}, {ts[b1]*1e3:7.2f} ms @ {b1}]",
              flush=True)


if __name__ == "__main__":
    main()
