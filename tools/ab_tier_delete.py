"""A/B: host-tier delete cost vs tier size (VERDICT r4 weak #7 / next #8).

Round-4 `HostKVStore.delete` rebuilt the WHOLE store on every call
(`_rehash_cluster`), so a promote's delete cost was O(tier size) — at the
terabyte-story sizes (>= 10M rows) each promote batch paid a full-table
rehash. Round 5 replaces that with:

  * numpy store: tombstones + insert-time reclamation + a compaction
    sweep only when tombstones exceed capacity/4 (amortized O(1)/delete);
  * native C++ store: backward-shift deletion (Knuth 6.4 R), O(cluster)
    per key, no tombstones.

This harness times `delete` batches of 64Ki keys at 1Mi vs 8Mi resident
rows. Sublinear = the per-batch delete time must NOT scale with the tier
size (the old rebuild scaled ~8x).

Measured (this machine, 2026-08-20, dim=8, 64Ki-key delete batches,
median of 5, CPU shared with a concurrent test run; `rebuild` = the
round-4 delete→full-rehash behavior, reproduced for comparison):

    numpy   store: 1Mi rows    44.3 ms/batch  8Mi rows    17.8 ms/batch
    native  store: 1Mi rows    15.9 ms/batch  8Mi rows    24.7 ms/batch
    rebuild store: 1Mi rows  1253.5 ms/batch  8Mi rows 30171.0 ms/batch
                   (24.1x for 8x rows)

Delete cost is now FLAT in tier size (the 0.4x/1.5x wobble between the
two sizes is host noise); the old rebuild path scaled super-linearly —
a single 64Ki-key promote against an 8Mi-row tier paid 30 SECONDS.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommenders_addons_tpu.native import NativeHostKVStore, native_available
from recommenders_addons_tpu.ops.spill import HostKVStore

DIM = 8
BATCH = 1 << 16
REPS = 5


def bench(mk_store, n_rows: int) -> float:
    rng = np.random.default_rng(0)
    store = mk_store()
    keys = rng.choice(
        np.arange(1, 4 * n_rows, dtype=np.int64), size=n_rows, replace=False
    )
    vals = np.zeros((n_rows, DIM), np.float32)
    for off in range(0, n_rows, 1 << 20):
        store.put(keys[off:off + (1 << 20)], vals[off:off + (1 << 20)])
    assert len(store) == n_rows
    ts = []
    for r in range(REPS):
        batch = keys[r * BATCH:(r + 1) * BATCH]
        t0 = time.perf_counter()
        store.delete(batch)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


class _RebuildStore(HostKVStore):
    """The round-4 delete behavior: tombstone then immediately rebuild
    the whole store (O(capacity) per delete batch) — the baseline this
    harness exists to beat."""

    def delete(self, keys):
        keys = np.unique(np.asarray(keys, np.int64).reshape(-1))
        pos = self._probe(keys, for_insert=False)
        hit = pos >= 0
        if hit.any():
            self.tomb[pos[hit]] = True
            n = int(hit.sum())
            self.count -= n
            self.tombs += n
            self._rehash_cluster()


def main():
    sizes = (1 << 20, 1 << 23)
    for name, mk in (
        ("numpy", lambda cap: lambda: HostKVStore(DIM, np.float32, cap)),
        ("native", lambda cap: lambda: NativeHostKVStore(
            DIM, np.float32, cap)),
        ("rebuild", lambda cap: lambda: _RebuildStore(
            DIM, np.float32, cap)),
    ):
        if name == "native" and not native_available():
            print("native store unavailable; skipping")
            continue
        times = [bench(mk(n * 2), n) for n in sizes]
        print(f"{name:7s} store: "
              + "  ".join(f"{n >> 20}Mi rows {t * 1e3:7.1f} ms/batch"
                          for n, t in zip(sizes, times))
              + f"  ({times[1] / times[0]:.1f}x for 8x rows)")


if __name__ == "__main__":
    main()
