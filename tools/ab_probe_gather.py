"""Price the serving lookup's pieces and candidate fusions on the chip.

VERDICT r3 weak #3 / next #3: serving measures ~27 M keys/s against a
~51 M gather-only floor — find where the other ~50% goes and prototype a
fused probe+gather. Each variant isolates one piece of
``hashtable.lookup`` (find -> gather_packed -> mask), plus candidates:

  * ``gather_chunk0``  — DMA ONLY the value chunks of each row instead of
    the full ``ch``-chunk packed row (serving reads values, never slots:
    with Adam slots at dim 64 the packed row is 2 chunks/512B, values are
    1 chunk/256B) and skip the [N*ch,128] -> [N, ch*128] relayout pass.
  * ``lookup_chunk0``  — find + chunk0 gather + mask: the candidate
    serving path end-to-end.

Scan-slope methodology (bench.py docstring): every body consumes the
iteration index so nothing hoists, returns a scalar so nothing DCEs;
variants are timed ADJACENTLY (tunnel throughput drifts +-20% between
blocks) and reported as the per-rep slope between two batch sizes.

    python tools/ab_probe_gather.py [dim] [log2_cap] [name-substr ...]
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
from recommenders_addons_tpu.ops import hashtable, pallas_ops

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
        name="abpg_table", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05),
    )
    spec = var.spec
    opt = de.Adam(0.001)  # slots widen the packed row: ch=2 at dim 64
    state = de.create_slots(var, var.init(), opt)
    ch = state.chunks
    vc = (DIM + 127) // 128  # value chunks (f32)
    assert ch % vc == 0, (ch, vc)

    # resident keys so the probe hits (serving measures the hit path)
    rng = np.random.default_rng(0)
    pool = rng.choice(np.arange(1, CAP * 2, dtype=np.int64),
                      size=sum(BATCHES), replace=False)
    fill = jax.jit(
        lambda s, k: hashtable.upsert(
            spec, s, k, jnp.zeros((k.shape[0], DIM))),
        donate_argnums=0)

    def _slots(ids, i):
        return ((hashtable.hashing.mix64(ids ^ i.astype(ids.dtype))
                 % np.uint64(CAP))).astype(jnp.int32)

    def _keys(ids, i):
        """i-dependent resident keys: parity-select between the batch and
        its reverse (both resident). An ``ids ^ (i & 0)`` style no-op gets
        CONSTANT-FOLDED and the whole probe hoisted out of the scan (first
        run of this harness measured find at 0 ns/key that way); a select
        between two live arrays costs one [N] pass and defeats licm."""
        return jax.lax.select((i & 1) == 0, ids, ids[::-1])

    def v_noop(st, ids, i):
        return st, (_keys(ids, i)[0] + i).astype(jnp.float32)

    def v_find_only(st, ids, i):
        slot, found = hashtable.find(spec, st, _keys(ids, i))
        return st, (slot[0] + found[0].astype(jnp.int32)).astype(
            jnp.float32)

    def v_gather_full(st, ids, i):
        idx = _slots(ids, i)
        packed = hashtable.gather_packed(st, idx,
                                         jnp.ones_like(idx, bool))
        return st, packed[0, 0].astype(jnp.float32)

    def v_gather_flat(st, ids, i):
        # physical-layout gather: the DMA without the relayout pass
        idx = _slots(ids, i)
        phys = pallas_ops.gather_rows_2d(st.rows, ch, idx,
                                         cap=st.capacity, masked=False,
                                         flat=True)
        return st, phys[0, 0].astype(jnp.float32)

    def v_gather_chunk0(st, ids, i):
        # value-chunk-only DMA: premultiply by the real chunk stride,
        # copy vc chunks per key (gather_rows_2d's own premul is x vc)
        idx = _slots(ids, i) * np.int32(ch // vc)
        out = pallas_ops.gather_rows_2d(st.rows, vc, idx,
                                        masked=False)
        return st, out[0, 0].astype(jnp.float32)

    def v_lookup_full(st, ids, i):
        vals, found = hashtable.lookup(spec, st, _keys(ids, i))
        return st, vals[0, 0] + found[0].astype(jnp.float32)

    def v_lookup_chunk0(st, ids, i):
        keys = _keys(ids, i)
        slot, found = hashtable.find(spec, st, keys)
        idx = jnp.where(found, slot, st.capacity) * np.int32(ch // vc)
        out = pallas_ops.gather_rows_2d(st.rows, vc, idx, masked=False)
        vals = jnp.where(found[:, None], out[:, :DIM], 0.0)
        return st, vals[0, 0] + found[0].astype(jnp.float32)

    def v_rotate_only(st, ids, i):
        # bench run_lookup_scan's per-step rotation, isolated
        n = ids.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        sub = ids[(pos + i) % n]
        return st, sub[0].astype(jnp.float32)

    def v_bench_serving(st, ids, i):
        # exact bench body: rotation + full lookup
        n = ids.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        sub = ids[(pos + i) % n]
        vals, found = hashtable.lookup(spec, st, sub)
        return st, vals[0, 0] + found[0].astype(jnp.float32)

    variants = [
        ("noop", v_noop),
        ("find_only", v_find_only),
        ("gather_full", v_gather_full),
        ("gather_flat", v_gather_flat),
        ("gather_chunk0", v_gather_chunk0),
        ("lookup_full", v_lookup_full),
        ("lookup_chunk0", v_lookup_chunk0),
        ("rotate_only", v_rotate_only),
        ("bench_serving", v_bench_serving),
    ]

    b0, b1 = BATCHES
    print(f"dim={DIM} cap={CAP} ch={ch} vc={vc} batches={BATCHES} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    ids_by_b = {}
    off = 0
    for b in BATCHES:
        ids_by_b[b] = jnp.asarray(pool[off:off + b])
        state = fill(state, ids_by_b[b])
        off += b
    for name, body in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        ts = {}
        for b in BATCHES:
            ts[b] = timed_scan(body, state, ids_by_b[b])
        s = (ts[b1] - ts[b0]) / (b1 - b0)
        print(f"{name:>16}: {s * 1e9:7.2f} ns/key  "
              f"({1.0 / max(s, 1e-12) / 1e6:7.1f} M keys/s)   "
              f"[{ts[b0]*1e3:7.2f} ms @ {b0}, {ts[b1]*1e3:7.2f} ms @ {b1}]",
              flush=True)


if __name__ == "__main__":
    main()
