"""A/B the fused-apply variants on the real chip: correctness vs the
unfused path, then FULL HIT / FULL MISS marginal timing.

    python tools/ab_fused.py
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

DIM = 64
CAP = 1 << 21
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def time_full(var, opt, state, ids, fresh):
    @jax.jit
    def run(state, ids):
        def step(st, i):
            sub = ids ^ (i + 1).astype(ids.dtype) if fresh else ids
            emb, ctx = var.embedding_lookup(st, sub)
            st = var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)
            return st, ()
        out, _ = jax.lax.scan(step, state,
                              jnp.arange(STEPS, dtype=jnp.int32))
        return out

    out = run(state, ids)
    _ = float(jnp.sum(out.scores[:2]))
    best = float("inf")
    for _rep in range(3):  # min over reps: robust to tunnel hiccups
        t0 = time.perf_counter()
        out = run(state, ids)
        _ = float(jnp.sum(out.scores[:2]))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    var = de.Variable(
        name="ab_table", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05),
    )
    opt = de.Adam(0.001)
    state0 = de.create_slots(var, var.init(), opt)
    rng = np.random.default_rng(0)

    # correctness: fused vs unfused on a mixed hit/miss batch
    keys = jnp.asarray(rng.integers(1, 1 << 20, 4096, dtype=np.int64))
    vals = jnp.asarray(rng.normal(size=(4096, DIM)).astype(np.float32))
    st = var.upsert(state0, keys[:2048], vals[:2048])  # half resident

    def one(st, use_fused):
        os.environ["TFRA_TPU_DISABLE_FUSED_APPLY"] = (
            "0" if use_fused else "1")
        emb, ctx = var.embedding_lookup(st, keys)
        g = jnp.asarray(rng.normal(size=emb.shape).astype(np.float32)) * 0.1
        # fixed grads for both variants
        g = jnp.ones_like(emb) * 0.03
        st2 = var.apply_gradients(st, ctx, g, opt, step=5)
        return st2

    st_f = one(st, True)
    st_u = one(st, False)
    dv = float(jnp.max(jnp.abs(st_f.values - st_u.values)))
    dk = int(jnp.sum(st_f.key_lo != st_u.key_lo))
    dm = float(jnp.max(jnp.abs(
        st_f.slots["m"] - st_u.slots["m"])))
    print(f"fused-vs-unfused: max|dvalues|={dv:.3e} keydiff={dk} "
          f"max|dm|={dm:.3e}", flush=True)
    assert dv < 1e-5 and dk == 0 and dm < 1e-5, "MISMATCH"
    os.environ["TFRA_TPU_DISABLE_FUSED_APPLY"] = "0"

    for use_fused in (True, False):
        os.environ["TFRA_TPU_DISABLE_FUSED_APPLY"] = (
            "0" if use_fused else "1")
        lbl = "fused " if use_fused else "unfuse"
        for fresh, tag in ((False, "FULL HIT"), (True, "FULL MISS")):
            ts = {}
            for b in BATCHES:
                ids = jnp.asarray(
                    rng.integers(1, CAP * 2, size=b, dtype=np.int64))
                ts[b] = time_full(var, opt, state0, ids, fresh)
            b0, b1 = BATCHES
            s = (ts[b1] - ts[b0]) / (b1 - b0)
            print(f"{lbl} {tag}: {s*1e9:6.1f} ns/key  "
                  f"[{ts[b0]*1e3:7.2f} ms @ {b0}, "
                  f"{ts[b1]*1e3:7.2f} ms @ {b1}]",
                  flush=True)
    os.environ["TFRA_TPU_DISABLE_FUSED_APPLY"] = "0"


if __name__ == "__main__":
    main()
