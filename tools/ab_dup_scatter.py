"""A/B (NEGATIVE RESULT): duplicate-index [C]-column element
scatter-SETs do NOT serialize on hot keys.

Hypothesis after the MXU grad combine landed (tools/ab_segsum.py): the
dup-batch lookup's remaining cost is hot-key serialization in the two
[C]-plane element scatters the scored dedup branch issues (the LRU
score stamp and the dup-probe position scatter), analogous to the
scatter-ADD serialization the combine fixed. The fix candidate was a
chunk-representative filter (``set_zipf_rep`` below: a 128-lane
pairwise compare redirects non-first-in-chunk occurrences to the trash
cell so at most one live write per (chunk, slot) remains).

Measured (v5e, C=2Mi, N=64Ki, adjacent pair slopes, 2026-08-20):

    set_distinct     2.29 ns/key
    set_zipf         2.04 ns/key   <- NO duplicate-index penalty
    set_zipf_rep     3.60 ns/key   <- the "fix" only ADDS compare work
    dup_probe_zipf   4.04 ns/key   (scatter + [C] count — the dedup
                                    branch's extra probe, dup-immune)
    take_elem_zipf   2.66 ns/key   (the rep read-back, dup-immune)

HYPOTHESIS REFUTED: scatter-SET is priced per issued write regardless
of index duplication (unlike scatter-ADD, which must serialize the
read-modify-write chain). The dup-batch lookup's +6.5 ns/key over
pristine (tools/profile_step.py ``lookupS dup`` vs ``lookupS HIT``) is
the dedup branch's own stages (extra probe scatter ~2-3, take_elem
read-back ~2.3, rep/inverse elementwise), not contention — and the
remaining dup-apply extra is the grad combine itself. Kept as the
recorded negative; ``chunk_rep_mask`` lives only here.

    python tools/ab_dup_scatter.py [name-substr ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable


def chunk_rep_mask(sidx):
    """[N] bool: first occurrence of sidx[i] within its 128-lane chunk
    (the refuted fix candidate — see module docstring)."""
    n = sidx.shape[0]
    b = 128
    n_pad = -(-n // b) * b
    x = sidx.astype(jnp.int32)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.full((n_pad - n,), -1, jnp.int32)])
    t3 = x.reshape(-1, b)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    eq = t3[:, :, None] == t3[:, None, :]
    first = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    return (first == lane).reshape(-1)[:n]

ONLY = [a.lower() for a in sys.argv[1:]]
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


def zipf_slots(rng, n):
    z = np.minimum(rng.zipf(1.2, size=n), CAP - 1).astype(np.int64)
    return (z * 2654435761 % CAP).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    size = (CAP + 1 + 127) // 128 * 128
    col = jnp.zeros((size,), jnp.int32)
    idx_by = {}
    for b in BATCHES:
        idx_by[b] = {
            "distinct": jnp.asarray(rng.choice(
                CAP, size=b, replace=False).astype(np.int32)),
            "zipf": jnp.asarray(zipf_slots(rng, b)),
        }

    def scatter_variant(pattern, rep_filter):
        def mk(b):
            idx = idx_by[b][pattern]
            rev = idx[::-1]

            @jax.jit
            def run(col, idx, rev):
                def step(c, i):
                    sidx = jax.lax.select((i & 1) == 0, idx, rev)
                    if rep_filter:
                        rep = chunk_rep_mask(sidx)
                        sidx = jnp.where(rep, sidx, CAP)
                    pos = jnp.arange(sidx.shape[0], dtype=jnp.int32)
                    c = c.at[sidx].set(pos + i, mode="drop")
                    return c, ()
                c, _ = jax.lax.scan(step, col,
                                    jnp.arange(STEPS, dtype=jnp.int32))
                return jnp.sum(c[:8])
            return lambda: run(col, idx, rev)
        return mk

    def dup_probe_variant(b):
        idx = idx_by[b]["zipf"]
        rev = idx[::-1]
        n = b

        @jax.jit
        def run(idx, rev):
            def step(acc, i):
                sidx = jax.lax.select((i & 1) == 0, idx, rev)
                pos, buf, n_distinct = hashtable._dup_probe(n, CAP, sidx)
                return acc + (n_distinct + buf[0]).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc
        return lambda: run(idx, rev)

    def take_elem_variant(b):
        idx = idx_by[b]["zipf"]
        rev = idx[::-1]
        buf = jnp.arange(size, dtype=jnp.int32)

        @jax.jit
        def run(buf, idx, rev):
            def step(acc, i):
                sidx = jax.lax.select((i & 1) == 0, idx, rev)
                got = hashtable.take_elem(buf, sidx)
                return acc + jnp.sum(got).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc
        return lambda: run(buf, idx, rev)

    variants = [
        ("set_distinct", scatter_variant("distinct", False)),
        ("set_zipf", scatter_variant("zipf", False)),
        ("set_zipf_rep", scatter_variant("zipf", True)),
        ("dup_probe_zipf", dup_probe_variant),
        ("take_elem_zipf", take_elem_variant),
    ]
    for name, mk in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        try:
            ns = pair_slope(mk) * 1e9
            print(f"{name:16s} {ns:6.2f} ns/key", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
