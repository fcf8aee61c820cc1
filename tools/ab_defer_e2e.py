"""End-to-end A/B of the deferred-dedup contract on the real chip.

Full production train steps (embedding_lookup + fused Adam apply) through
``bench.run_scan``'s pair-slope harness, alternating the two contracts
ADJACENTLY (the tunnel's throughput drifts +-20% between blocks):

  * eager    — Variable(defer_dedup=False): probe scatter + take_elem at
               lookup, segment_sum_rows at apply (the r4 pipeline).
  * deferred — Variable(defer_dedup=True): occurrence contract at lookup,
               sorted MXU combine at apply (hashtable.sorted_combine_batch).

Two duplicate regimes: ``uniform`` (bench.py's dup metric: ~99% distinct,
the probe/read-back cost dominates) and ``zipf`` (~13% distinct at 64Ki,
the combine cost dominates — the DLRM sparse-feature regime).

    python tools/ab_defer_e2e.py

Measured (v5e, N=64Ki, D=64, Adam, C=2Mi, ns/key, 2026-08-21, median of
3 alternated rounds):

                 uniform     zipf
    eager          69.03     69.53
    deferred       70.04     70.52   <- NEUTRAL in situ

The isolated ~13 ns/key zipf win (ab_dup_contract.py b_full vs a_full)
does NOT survive this composition: the deferred apply scatters combined
grads BACK to batch positions (~5.6 ns [N, D] row scatter the isolated
harness's sorted-consuming apply avoids) and the nested reduce-cond
materializes its [N, D] operands. Conclusion recorded in ROADMAP.md:
the contract only pays if the APPLY consumes sorted order (permuted
packed block + sorted write plan); defer_dedup ships default-OFF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from recommenders_addons_tpu import dynamic_embedding as de


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def make_ids(rng, n, pattern):
    if pattern == "uniform":
        return rng.integers(1, bench.CAP * 2, size=n, dtype=np.int64)
    z = np.minimum(rng.zipf(1.2, size=n), n * 4).astype(np.int64)
    return z + 7  # off the EMPTY/0 floor


def main():
    rng = np.random.default_rng(3)
    opt = de.Adam(0.001)
    setups = {}
    for defer in (False, True):
        var = de.Variable(
            name="ab_defer",  # same name: same init stream
            dim=bench.DIM,
            init_capacity=bench.CAP,
            initializer=jax.nn.initializers.normal(0.05),
            defer_dedup=defer,
        )
        state = de.create_slots(var, var.init(), opt)
        fill = jax.jit(
            lambda s, k: var.upsert(s, k, jnp.zeros((k.shape[0],
                                                     bench.DIM))),
            donate_argnums=0)
        ids = {}
        for pattern in ("uniform", "zipf"):
            for n in bench.BATCHES:
                ids[(pattern, n)] = jnp.asarray(make_ids(rng, n, pattern))
                state = fill(state, ids[(pattern, n)])
        setups[defer] = (var, state, ids)

    results = {k: [] for k in
               [(d, p) for d in (False, True)
                for p in ("uniform", "zipf")]}
    b0, b1 = bench.BATCHES
    for _round in range(3):
        for pattern in ("uniform", "zipf"):
            for defer in (False, True):  # adjacent pairs
                var, state, ids = setups[defer]
                slope = bench.run_scan(
                    var, opt, state, ids[(pattern, b0)],
                    ids[(pattern, b1)], bench.SCAN_STEPS)
                results[(defer, pattern)].append(slope * 1e9)
    print(f"{'':10s} {'uniform':>9s} {'zipf':>9s}")
    for defer in (False, True):
        name = "deferred" if defer else "eager"
        row = [f"{_median(results[(defer, p)]):8.2f}"
               for p in ("uniform", "zipf")]
        print(f"{name:10s} " + " ".join(row) + " ns/key")


if __name__ == "__main__":
    main()
