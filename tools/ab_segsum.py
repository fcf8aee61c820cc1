"""A/B: the dup-path grad combine (segment-sum) on the real chip.

The training apply reduces per-occurrence grads onto unique rows:
``out[t] = sum(g[i] for inv[i] == t)`` with N-sized target space
(representatives at their original batch positions). Round-4 measured the
XLA scatter-add at 8.3 ns/key with DISTINCT targets but 10.5-13.9 with
zipf-duplicate targets (hot-key scatter serialization), and the R-way
split alternative 2-3x WORSE (ROADMAP r4 #1). This harness prices the
remaining candidates:

  * ``xla_segsum``     — the baseline ``jax.ops.segment_sum``.
  * ``sort_only``      — the [N] int32 (inv, iota) sort alone (floor for
                         every sorted variant).
  * ``sorted_segsum``  — sort by target, row-gather grads into sorted
                         order, ``segment_sum(..., indices_are_sorted=
                         True)`` straight into target space (sorted
                         targets ARE monotone segment ids).
  * ``sorted_cumsum32/64`` — sort + cumsum + per-group boundary
                         difference (two row gathers); contention-free by
                         construction. f64 kills the cancellation error
                         (x64 is on); f32 reports max |err| vs f64.
  * ``onehot_mxu``     — per-128-chunk pairwise dedup + one-hot MXU
                         matmul local reduce, then a scatter-add of chunk
                         representatives (duplicate targets only across
                         chunks).

Scan-slope methodology (bench.py): two batch sizes timed adjacently per
rep, median per-rep slope; bodies select between two resident grad
arrays by step parity (anti-hoisting) and consume a full reduction.

    python tools/ab_segsum.py [dim] [name-substr ...]

Measured (v5e, N=64Ki, D=64, ns/key, 2026-08-20; zipf = 13% distinct):

                      distinct   zipf
    xla_segsum         11.26    18.02    <- hot-key serialization
    sorted_segsum      12.26    15.25
    sorted_cumsum32    14.68    13.41    (1.3e-5 abs err vs f64)
    onehot_mxu         11.12     8.60    <- WINNER; exact; integrated
                                            as hashtable.segment_sum_rows

sorted_cumsum64 is not viable: f64 is software-emulated on TPU (its
scan-harness slopes were wildly negative — the b0 run alone blew the
budget). sort_only originally read 0.07 ns/key because plain sums of a
sort's outputs are permutation invariants XLA computes sort-free; the
properly-consumed sort is ~2.4 ns/key (tools/ab_radix_plan.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import recommenders_addons_tpu  # noqa: F401  (enables x64 — f64 cumsum)

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ONLY = [a.lower() for a in sys.argv[2:]]
BATCHES = (1 << 13, 1 << 16)
STEPS = 10
REPS = 7


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


# ---------------------------------------------------------------------------
# combine variants: (g [N, D], inv [N] int32) -> out [N, D]
# ---------------------------------------------------------------------------


def xla_segsum(g, inv):
    return jax.ops.segment_sum(g, inv, num_segments=g.shape[0])


def sort_only(g, inv):
    n = g.shape[0]
    inv_s, order = jax.lax.sort(
        (inv, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    # consume both outputs so the sort can't be DCE'd; NOT a correct
    # combine — floor-pricing only
    return g + (inv_s[0] + order[0]).astype(g.dtype)


def sorted_segsum(g, inv):
    n = g.shape[0]
    inv_s, order = jax.lax.sort(
        (inv, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    g_s = g[order]
    return jax.ops.segment_sum(
        g_s, inv_s, num_segments=n, indices_are_sorted=True)


def _sorted_cumsum(g, inv, dt):
    n = g.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    inv_s, order = jax.lax.sort((inv, idx), num_keys=1)
    g_s = g[order]
    csum = jnp.cumsum(g_s.astype(dt), axis=0)
    csum_z = jnp.concatenate([jnp.zeros((1, g.shape[1]), dt), csum])
    brk = inv_s[1:] != inv_s[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), brk])
    is_end = jnp.concatenate([brk, jnp.ones((1,), bool)])
    # per-target sorted [start, end] positions (int32 element scatters on
    # batch-sized buffers); absent targets read the zero row of csum_z
    endp = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(is_end, inv_s, n)].set(idx, mode="drop")
    startp = jnp.full((n,), 0, jnp.int32).at[
        jnp.where(is_start, inv_s, n)].set(idx, mode="drop")
    out = csum_z[endp + 1] - csum_z[startp]
    return out.astype(g.dtype)


def sorted_cumsum32(g, inv):
    return _sorted_cumsum(g, inv, jnp.float32)


def sorted_cumsum64(g, inv):
    return _sorted_cumsum(g, inv, jnp.float64)


def onehot_mxu(g, inv):
    n, d = g.shape
    b = 128
    nc = n // b
    g3 = g.reshape(nc, b, d)
    t3 = inv.reshape(nc, b)
    lane = jnp.arange(b, dtype=jnp.int32)
    eq = t3[:, :, None] == t3[:, None, :]  # [nc, B, B]
    first = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # chunk-local rep
    onehot = (first[:, None, :] == lane[None, :, None]).astype(g.dtype)
    # HIGHEST: the default TPU f32 matmul rounds operands to bf16 —
    # 0/1 one-hots survive that but the grads do not (measured 7e-2
    # abs error); full-precision passes keep the combine exact
    partial = jnp.einsum("cji,cid->cjd", onehot, g3,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    is_rep = first == lane[None, :]
    tgt = jnp.where(is_rep, t3, n)
    return jnp.zeros((n, d), g.dtype).at[tgt.reshape(-1)].add(
        partial.reshape(-1, d), mode="drop")


VARIANTS = [
    ("xla_segsum", xla_segsum),
    ("sort_only", sort_only),
    ("sorted_segsum", sorted_segsum),
    ("sorted_cumsum32", sorted_cumsum32),
    ("sorted_cumsum64", sorted_cumsum64),
    ("onehot_mxu", onehot_mxu),
]

EXACT = {"xla_segsum", "sorted_segsum", "sorted_cumsum64", "onehot_mxu"}


# ---------------------------------------------------------------------------
# target patterns
# ---------------------------------------------------------------------------


def make_inv(rng, n, pattern):
    """Representative-position targets: duplicates map to their FIRST
    occurrence's position (the plan's layout)."""
    if pattern == "distinct":
        return rng.permutation(n).astype(np.int32)
    if pattern == "zipf":
        # heavy head like a real id stream; ~30-40% distinct at 64Ki
        z = np.minimum(rng.zipf(1.2, size=n), n * 4).astype(np.int64)
        uniq, first_idx, inverse = np.unique(
            z, return_index=True, return_inverse=True)
        return first_idx[inverse].astype(np.int32)
    raise ValueError(pattern)


def check(fn, name):
    rng = np.random.default_rng(0)
    n, d = 1 << 10, DIM
    g = rng.normal(size=(n, d)).astype(np.float32)
    inv = make_inv(rng, n, "zipf")
    want = np.zeros((n, d), np.float64)
    np.add.at(want, inv, g.astype(np.float64))
    got = np.asarray(jax.jit(fn)(jnp.asarray(g), jnp.asarray(inv)),
                     np.float64)
    err = np.abs(got - want).max()
    tol = 1e-4 if name in EXACT else np.inf
    if name == "sorted_cumsum32":
        print(f"  [{name}] max |err| vs f64 = {err:.3e} "
              f"(cancellation; exact variants < 1e-4)")
        return
    if name == "sort_only":
        return
    assert err < tol, (name, err)


def pair_slope(fn, inv_by_n, g_by_n):
    outs = {}

    for n in BATCHES:
        ga, gb = g_by_n[n]
        inv = inv_by_n[n]

        @jax.jit
        def run(ga, gb, inv):
            def step(acc, i):
                g = jax.lax.select((i & 1) == 0, ga, gb)
                out = fn(g, inv)
                return acc + jnp.sum(out.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc

        outs[n] = (run, (ga, gb, inv))

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
    rng = np.random.default_rng(1)
    g_by_n = {
        n: (jnp.asarray(rng.normal(size=(n, DIM)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(n, DIM)).astype(np.float32)))
        for n in BATCHES
    }
    for pattern in ("distinct", "zipf"):
        inv_by_n = {n: jnp.asarray(make_inv(rng, n, pattern))
                    for n in BATCHES}
        frac = {n: len(np.unique(np.asarray(inv_by_n[n]))) / n
                for n in BATCHES}
        print(f"pattern={pattern} (distinct frac "
              + ", ".join(f"{n >> 10}Ki={frac[n]:.2f}" for n in BATCHES)
              + ")")
        for name, fn in VARIANTS:
            if ONLY and not any(s in name.lower() for s in ONLY):
                continue
            if pattern == "distinct" and name == "sort_only":
                pass
            check(fn, name)
            ns = pair_slope(fn, inv_by_n, g_by_n) * 1e9
            print(f"  {name:16s} {ns:6.2f} ns/key")


if __name__ == "__main__":
    main()
