"""Miss-path radix-partition prototype: can a Pallas binning pass beat
the XLA sort-based plan? (VERDICT r4 next #4 — "numbers either way".)

``plan_lookup`` derives same-bucket contiguity (for the within-bucket
insert rank) and equal-key adjacency (for dedup) from ONE rotated-mix
sort. The long-standing ROADMAP idea was a Pallas "radix-partition plan"
that bins keys by bucket in VMEM instead. This harness prices the
pieces:

  * ``sort_pair``     — the actual sort the radix pass would replace
                        ((u64 rotated mix, i32 iota) two-operand sort),
                        fully consumed.
  * ``plan_miss``     — plan_lookup on all-miss batches (the full plan).
  * ``plan_hit``      — plan_lookup on all-hit batches (probe+dedup
                        share; miss-only extras = miss - hit).
  * ``pallas_hist``   — the fundamental radix primitive on TPU: a
                        scalar-core histogram over bucket ids (one RMW
                        per key). A full binning pass is a histogram +
                        prefix + a permutation scatter (>= 2 such passes
                        + data movement), so this LOWER-bounds any
                        Pallas radix pass.

Methodology: adjacently-timed pair slopes, median of 7 (bench.py).

Measured (v5e, dim 64, cap 2Mi, N=64Ki, 2026-08-20):

    sort_pair      2.40 ns/key    (fully consumed: position-weighted
                                   sums — plain sums of sort outputs are
                                   permutation invariants XLA computes
                                   SORT-FREE, reading 0.07 ns/key)
    pallas_hist   11.00 ns/key    (ONE SMEM pass at 1024 buckets)
    plan_hit      33.53 ns/key    (full sort-based plan_lookup, all-hit)
    plan_miss     31.98 ns/key    (same, all-miss w/ eviction ranking)

Structural findings along the way: Mosaic REJECTS scalar stores to
VMEM ("Cannot store scalars to VMEM"), so a [32Ki]-bucket histogram
cannot live in vector memory at all; SMEM accepts scalar RMW but is
KiB-scale, capping one radix digit at ~1024 buckets — a full 32Ki-
bucket binning would need 2+ passes plus a data permutation pass.

Verdict: the sort a radix pass would replace costs 2.4 ns/key — ~7% of
the ~32 ns plan — while ONE Pallas binning pass already costs 11.0.
A radix-partition plan cannot reach break-even on any term. The XLA
sort-based plan stands; the miss path's non-sort cost lives in the
bucket probes / insert-rank cumsums / eviction ranking / packed-plan
scatter (tools/profile_step.py miss waterfall). Closed as a measured
negative after three rounds on the roadmap.

    python tools/ab_radix_plan.py [name-substr ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops import hashing, hashtable

ONLY = [a.lower() for a in sys.argv[1:]]
DIM = 64
CAP = 1 << 21
BATCHES = (1 << 13, 1 << 16)
STEPS = 10
REPS = 7


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def pair_slope(mk_run):
    runs = {b: mk_run(b) for b in BATCHES}
    for b in BATCHES:
        _ = float(runs[b]())
    slopes = []
    b0, b1 = BATCHES
    for _ in range(REPS):
        ts = {}
        for b in BATCHES:
            t0 = time.perf_counter()
            _ = float(runs[b]())
            ts[b] = time.perf_counter() - t0
        slopes.append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
    return _median(slopes)


# ---------------------------------------------------------------------------
# pallas histogram: one scalar-core VMEM RMW per key over bucket ids
# ---------------------------------------------------------------------------

_TILE = 8192


# VMEM variant rejected by Mosaic: "Cannot store scalars to VMEM" — the
# scalar core cannot random-address VMEM, so a [32Ki]-bucket histogram
# cannot live in vector memory at all. SMEM accepts scalar RMW but is
# KiB-scale: _HIST_NB below is the largest radix digit that fits, i.e. a
# full 32Ki-bucket binning needs multi-pass radix through SMEM.
_HIST_NB = 1024


def _hist_kernel(bid_ref, out_ref, hist):
    g = pl.program_id(0)
    i32 = jnp.int32

    @pl.when(g == 0)
    def _():
        def clr(j, _):
            hist[j] = i32(0)
            return ()
        jax.lax.fori_loop(i32(0), i32(_HIST_NB), clr, ())

    def body(j, _):
        b = bid_ref[g * i32(_TILE) + j]
        hist[b] = hist[b] + i32(1)
        return ()

    jax.lax.fori_loop(i32(0), i32(_TILE), body, ())

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        def out(j, _):
            out_ref[j] = hist[j]
            return ()
        jax.lax.fori_loop(i32(0), i32(_HIST_NB), out, ())


def pallas_hist(bids: jax.Array, nb: int) -> jax.Array:
    del nb  # SMEM cap: histogram over the low _HIST_NB bits only
    n = bids.shape[0]
    assert n % _TILE == 0
    return pl.pallas_call(
        _hist_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // _TILE,),
            in_specs=[],
            # explicit index_map: the default emits python-int literals,
            # which promote to i64 under x64 and crash Mosaic (CLAUDE.md)
            out_specs=pl.BlockSpec(
                (_HIST_NB,), lambda i, bid_ref: (i * 0,),
                memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((_HIST_NB,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((_HIST_NB,), jnp.int32),
    )(jax.lax.bitwise_and(bids.astype(jnp.int32),
                          jnp.int32(_HIST_NB - 1)))


def main():
    var = de.Variable(name="abradix", dim=DIM, init_capacity=CAP,
                      initializer=jax.nn.initializers.normal(0.05))
    spec = var.spec
    state = var.init()
    rng = np.random.default_rng(0)
    b0, b1 = BATCHES
    pool = rng.choice(np.arange(1, CAP * 2, dtype=np.int64),
                      size=b0 + b1, replace=False)
    ids_by_b = {b0: jnp.asarray(pool[:b0]), b1: jnp.asarray(pool[b0:])}
    fill = jax.jit(lambda s, k: var.upsert(
        s, k, jnp.zeros((k.shape[0], DIM))), donate_argnums=0)
    for b in BATCHES:
        state = fill(state, ids_by_b[b])

    nb = spec.num_buckets

    def mk_sort_pair(b):
        ids = ids_by_b[b]

        @jax.jit
        def run(ids):
            def step(acc, i):
                keys = jax.lax.select((i & 1) == 0, ids, ids[::-1])
                m = hashing.mix(keys)
                w = m.dtype.itemsize * 8
                nb_bits = nb.bit_length() - 1
                rot = (m << (w - nb_bits)) | (m >> nb_bits)
                rs, order = jax.lax.sort(
                    (rot, jnp.arange(b, dtype=jnp.int32)), num_keys=1)
                # position-weighted sums: plain sums of a sort's outputs
                # are permutation-invariant constants XLA computes
                # SORT-FREE (first version measured 0.07 ns/key)
                w = jnp.arange(b, dtype=jnp.float32) * 1e-6
                return (acc + jnp.sum(order.astype(jnp.float32) * w)
                        + jnp.sum(rs.astype(jnp.uint32)
                                  .astype(jnp.float32) * w)), ()
            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc
        return lambda: run(ids)

    def mk_pallas_hist(b):
        ids = ids_by_b[b]

        @jax.jit
        def run(ids):
            def step(acc, i):
                keys = jax.lax.select((i & 1) == 0, ids, ids[::-1])
                bid = hashing.bucket_of(keys, nb)
                h = pallas_hist(bid, nb)
                return acc + jnp.sum(h).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc
        return lambda: run(ids)

    def mk_plan(miss: bool):
        def mk(b):
            ids = ids_by_b[b]

            @jax.jit
            def run(ids):
                def step(acc, i):
                    keys = jax.lax.select((i & 1) == 0, ids, ids[::-1])
                    if miss:
                        keys = keys ^ (i.astype(keys.dtype) + 7) << 42
                    u, inv, (slot, found, ins, drop), nd = (
                        hashtable.plan_lookup(spec, state, keys))
                    return acc + jnp.sum(slot).astype(jnp.float32) + jnp.sum(
                        inv).astype(jnp.float32) + jnp.sum(
                        ins.astype(jnp.int32)).astype(jnp.float32), ()
                acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                      jnp.arange(STEPS, dtype=jnp.int32))
                return acc
            return lambda: run(ids)
        return mk

    variants = [
        ("sort_pair", mk_sort_pair),
        ("pallas_hist", mk_pallas_hist),
        ("plan_hit", mk_plan(False)),
        ("plan_miss", mk_plan(True)),
    ]
    for name, mk in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        try:
            ns = pair_slope(mk) * 1e9
            print(f"{name:12s} {ns:6.2f} ns/key", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
