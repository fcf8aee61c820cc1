"""A/B: the dup-batch DEDUP-BRANCH CONTRACT on the real chip (roadmap #1).

The all-hit dedup branch's extras over the dup-free path exist to keep
"representatives at original batch positions" (ROADMAP r5 next #1):

  contract A (current): probe scatter of positions into slot space
    (~4.0 ns/key) + ``take_elem`` read-back (~2.7) to get ``inverse``,
    then the grad combine scatters chunk-rep partial rows back to rep
    BATCH positions (``hashtable.segment_sum_rows``: one-hot MXU local
    reduce + [N, D] scatter-add, 8.6 ns/key zipf).

  contract B (slot-sorted, prototyped here): sort occurrences by slot
    (2.4 ns/key) and let the APPLY consume sorted order — the row-DMA
    scatter is position-agnostic, so nothing ever maps back to batch
    positions. Duplicates are then ADJACENT: the one-hot MXU combine
    collapses each 128-chunk locally, and groups straddling chunk
    boundaries are fixed up with a segmented associative scan over the
    [nc, D] per-chunk continuation-head sums (9 levels at nc=512 —
    no scatter-add AT ALL, no probe, no read-back). The prices B adds
    are the sort itself plus two [N, *] row gathers (grads and the
    packed block into sorted order; ~0.8 ns/key per 64 f32 lanes,
    tools/ab_route.py).

Per-variant work (g [N, D] grads, sidx [N] slot ids, packed [N, W]
stored-row proxy; every output consumed position-weighted — plain sums
of sort outputs are permutation invariants XLA computes sort-free):

  * a_probe_readback — probe scatter + take_elem alone (stage price).
  * a_full           — probe + read-back + segment_sum_rows to rep
                       positions; packed consumed unpermuted.
  * b_sort_permute   — sort + grad/packed row gathers alone (floor).
  * b_full           — sort + permutes + chunk one-hot combine +
                       segmented boundary carry; combined rows land at
                       sorted global-rep positions.

Scan-slope methodology (bench.py): two batch sizes timed adjacently per
rep, median per-rep slope; bodies parity-select between TWO resident
(g, sidx) pairs so the sort/probe cannot hoist out of the scan.

    python tools/ab_dup_contract.py [dim] [name-substr ...]

Measured (v5e, N=64Ki, D=64, W=192, C=2Mi, ns/key, 2026-08-21;
zipf = ~13% distinct, see __main__ printout):

                        distinct   zipf
    a_probe_readback       8.74     6.61
    a_full                14.01    23.17
    b_sort_permute        10.62     9.20
    b_full                11.05     9.87   <- 2.3x cheaper on zipf

The isolated redesign is REAL: ~13 ns/key on zipf batches, ~3 on
distinct, and the combine+carry itself is nearly free on top of the
sort+permute floor (b_full - b_sort_permute < 0.7). Integrated as
``hashtable.sorted_combine_batch`` behind the opt-in DEFERRED
occurrence contract (``Variable(defer_dedup=True)`` ->
``plan_lookup_train(defer_dedup=True)`` + ``reduce_gradient_deferred``)
— but the CONTAINED integration (grads scatter back to batch positions
so the apply is untouched) measured NEUTRAL in situ
(tools/ab_defer_e2e.py): realizing this win requires the apply to
consume sorted order, the b_full shape above. Parity:
tests/test_defer_dedup.py; conclusion: ROADMAP.md round-5 late session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import recommenders_addons_tpu  # noqa: F401  (enables x64)
from recommenders_addons_tpu.ops import hashtable

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ONLY = [a.lower() for a in sys.argv[2:]]
WIDTH = 192  # value + Adam m/v columns (the packed-row proxy)
CAP = 1 << 21
BATCHES = (1 << 13, 1 << 16)
STEPS = 10
REPS = 7
HIGHEST = jax.lax.Precision.HIGHEST


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


# ---------------------------------------------------------------------------
# contract variants: (g [N,D], sidx [N], packed [N,W], w [N,1]) -> scalar
# ---------------------------------------------------------------------------


def _probe_readback(sidx, n):
    pos = jnp.arange(n, dtype=jnp.int32)
    size = (CAP + 1 + 127) // 128 * 128
    buf = jnp.full((size,), -1, jnp.int32).at[sidx].set(pos)
    rep = hashtable.take_elem(buf, sidx)
    return pos, rep


def a_probe_readback(g, sidx, packed, w):
    n = g.shape[0]
    pos, rep = _probe_readback(sidx, n)
    is_rep = rep == pos
    return (jnp.sum(rep.astype(jnp.float32) * w[:, 0])
            + jnp.sum(jnp.where(is_rep, 1.0, 0.0) * w[:, 0]))


def a_full(g, sidx, packed, w):
    n = g.shape[0]
    pos, rep = _probe_readback(sidx, n)
    is_rep = rep == pos
    combined = hashtable.segment_sum_rows(g, rep, n)
    out = jnp.sum(combined * jnp.where(is_rep, 1.0, 0.0)[:, None] * w)
    return out + jnp.sum(packed * w)


def _sorted_parts(g, sidx, packed):
    n, d = g.shape
    idx = jnp.arange(n, dtype=jnp.int32)
    s_s, order = jax.lax.sort((sidx, idx), num_keys=1)
    return s_s, order, g[order], packed[order]


def b_sort_permute(g, sidx, packed, w):
    s_s, order, g_s, packed_s = _sorted_parts(g, sidx, packed)
    return (jnp.sum(g_s * w) + jnp.sum(packed_s * w)
            + jnp.sum(s_s.astype(jnp.float32) * w[:, 0]))


def b_combine_sorted(g_s, s_s):
    """Chunk-local one-hot MXU combine + segmented boundary carry.

    Returns ``(partial [nc, B, D], is_grep [nc, B])``: each group's TOTAL
    grad sits at its global representative (first occurrence in sorted
    order); other positions hold dropped partials. Exact: the one-hot
    matmul runs precision=HIGHEST (the 0/1 selector survives the default
    bf16 operand rounding but the grads do not), the carry is plain f32
    adds of raw rows.
    """
    n, d = g_s.shape
    b = 128
    nc = n // b
    s3 = s_s.reshape(nc, b)
    g3 = g_s.reshape(nc, b, d)
    lane = jnp.arange(b, dtype=jnp.int32)
    eq = s3[:, :, None] == s3[:, None, :]  # [nc, B, B]
    first = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # chunk-local rep
    onehot = (first[:, None, :] == lane[None, :, None]).astype(g_s.dtype)
    partial = jnp.einsum("cji,cid->cjd", onehot, g3,
                         preferred_element_type=jnp.float32,
                         precision=HIGHEST)
    is_lrep = first == lane[None, :]
    # sorted order => a group continuing from the previous chunk is
    # exactly the PREFIX of rows equal to the previous chunk's last slot
    prev_last = jnp.concatenate(
        [jnp.full((1,), -1, s3.dtype), s3[:-1, -1]])
    cont = s3 == prev_last[:, None]  # [nc, B]
    is_grep = is_lrep & ~cont
    head_sum = jnp.sum(g3 * cont[..., None].astype(g_s.dtype), axis=1)
    chain = jnp.all(cont, axis=1)  # whole chunk is one continuing group
    # carry[c] = head_sum[c+1] + chain[c+1] * carry[c+1]  (suffix affine
    # recurrence -> segmented associative scan, reverse)
    hs = jnp.concatenate([head_sum[1:], jnp.zeros((1, d), g_s.dtype)])
    ch = jnp.concatenate(
        [chain[1:], jnp.zeros((1,), bool)]).astype(g_s.dtype)[:, None]

    def comb(x, y):
        # reverse=True folds LATER elements on the left (reverse-scan-
        # reverse), so the combine must compose y AFTER x: (y∘x)(t) =
        # ya + yf*(xa + xf*t) — the numpy check below pins orientation
        xf, xa = x
        yf, ya = y
        return yf * xf, ya + yf * xa

    _, carry = jax.lax.associative_scan(comb, (ch, hs), reverse=True)
    # deposit each chunk's carry on the local rep of its OPEN (last) group;
    # if that rep is itself a continuation the row is masked by is_grep
    # and its raw rows were already counted in the upstream head_sum chain
    openrep = first[:, -1]  # [nc]
    partial = partial + carry[:, None, :] * (
        lane[None, :] == openrep[:, None])[..., None].astype(g_s.dtype)
    return partial, is_grep


def b_full(g, sidx, packed, w):
    n, d = g.shape
    s_s, order, g_s, packed_s = _sorted_parts(g, sidx, packed)
    partial, is_grep = b_combine_sorted(g_s, s_s)
    out = jnp.sum(partial.reshape(n, d)
                  * jnp.where(is_grep, 1.0, 0.0).reshape(n)[:, None] * w)
    return (out + jnp.sum(packed_s * w)
            + jnp.sum(s_s.astype(jnp.float32) * w[:, 0]))


VARIANTS = [
    ("a_probe_readback", a_probe_readback),
    ("a_full", a_full),
    ("b_sort_permute", b_sort_permute),
    ("b_full", b_full),
]


# ---------------------------------------------------------------------------
# slot patterns + correctness
# ---------------------------------------------------------------------------


def make_sidx(rng, n, pattern):
    if pattern == "distinct":
        return rng.choice(CAP, size=n, replace=False).astype(np.int32)
    if pattern == "zipf":
        z = np.minimum(rng.zipf(1.2, size=n), n * 4)
        uniq, inverse = np.unique(z, return_inverse=True)
        slots = rng.choice(CAP, size=len(uniq), replace=False)
        return slots[inverse].astype(np.int32)
    raise ValueError(pattern)


def check_b():
    """b_combine_sorted vs a float64 numpy group sum, plus rep uniqueness
    (hot keys spanning many chunks exercise the chained carry)."""
    rng = np.random.default_rng(0)
    n, d = 1 << 12, 8
    for pattern in ("zipf", "distinct"):
        sidx = make_sidx(rng, n, pattern)
        if pattern == "zipf":  # force a >2-chunk hot group
            sidx[: 5 * 128 + 17] = sidx[0]
        g = rng.normal(size=(n, d)).astype(np.float32)
        order = np.argsort(sidx, kind="stable")
        s_s, g_s = sidx[order], g[order]
        partial, is_grep = jax.jit(b_combine_sorted)(
            jnp.asarray(g_s), jnp.asarray(s_s))
        partial = np.asarray(partial).reshape(n, d)
        is_grep = np.asarray(is_grep).reshape(n)
        uniq = np.unique(sidx)
        assert is_grep.sum() == len(uniq), (is_grep.sum(), len(uniq))
        want = {}
        for s in uniq:
            want[s] = g[sidx == s].astype(np.float64).sum(axis=0)
        for i in np.nonzero(is_grep)[0]:
            err = np.abs(partial[i] - want[s_s[i]]).max()
            assert err < 1e-4, (pattern, i, err)
    print("  [b_combine_sorted] exact vs f64 numpy group sums")


def pair_slope(fn, data_by_n):
    outs = {}
    for n in BATCHES:
        ga, gb, sa, sb, packed, w = data_by_n[n]

        @jax.jit
        def run(ga, gb, sa, sb, packed, w):
            def step(acc, i):
                even = (i & 1) == 0
                g = jax.lax.select(even, ga, gb)
                sidx = jax.lax.select(even, sa, sb)
                return acc + fn(g, sidx, packed, w), ()
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc

        outs[n] = (run, (ga, gb, sa, sb, packed, w))
    for n in BATCHES:  # compile + warm
        run, args = outs[n]
        _ = float(run(*args))
    slopes = []
    b0, b1 = BATCHES
    for _rep in range(REPS):
        ts = {}
        for n in BATCHES:
            run, args = outs[n]
            t0 = time.perf_counter()
            _ = float(run(*args))
            ts[n] = time.perf_counter() - t0
        slopes.append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
    return _median(slopes)


def main():
    check_b()
    rng = np.random.default_rng(1)
    for pattern in ("distinct", "zipf"):
        data_by_n = {}
        for n in BATCHES:
            sa = make_sidx(rng, n, pattern)
            sb = make_sidx(rng, n, pattern)
            data_by_n[n] = (
                jnp.asarray(rng.normal(size=(n, DIM)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(n, DIM)).astype(np.float32)),
                jnp.asarray(sa),
                jnp.asarray(sb),
                jnp.asarray(rng.normal(size=(n, WIDTH)).astype(np.float32)),
                jnp.asarray(
                    rng.uniform(0.5, 1.5, size=(n, 1)).astype(np.float32)),
            )
        frac = {n: len(np.unique(np.asarray(data_by_n[n][2]))) / n
                for n in BATCHES}
        print(f"pattern={pattern} (distinct frac "
              + ", ".join(f"{n >> 10}Ki={frac[n]:.2f}" for n in BATCHES)
              + ")")
        for name, fn in VARIANTS:
            if ONLY and not any(s in name.lower() for s in ONLY):
                continue
            ns = pair_slope(fn, data_by_n) * 1e9
            print(f"  {name:18s} {ns:6.2f} ns/key")


if __name__ == "__main__":
    main()
