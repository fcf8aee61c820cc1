"""Decompose the DLRM train step's cost on the chip (VERDICT r3 weak #2:
the model reaches ~53% of the bare table's key rate — find the offender).

Variants (bench.py dlrm_examples_per_sec config: dim 32, cap 1Mi,
Adagrad, synthetic-Criteo zipf(1.2) ids — HEAVILY duplicated, ~realistic
CTR traffic; sizes 512/4096, scan 8, interleaved pair slopes):

    full_step     the real train_step (lookup + dense fwd/bwd + applies)
    lookup_only   embedding_lookup on the tagged batch keys
    lookup_apply  table-only step: lookup + apply_gradients(emb * 0.01)
    uniq_apply    same but with duplicate-free keys (isolates the dedup
                  branch: segment-sum, expansion gather, rep take_elem)
    dense_only    dense towers fwd/bwd + optax on a PRECOMPUTED emb
    tag_only      tag_keys + reshape

    python tools/profile_dlrm.py [name-substr ...]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.models.dlrm import (
    DLRM, DLRMConfig, synthetic_criteo_batch, tag_keys,
)

ONLY = [a.lower() for a in sys.argv[1:]]
SIZES = (512, 4096)
STEPS = 8
REPS = 5


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    cfg = DLRMConfig(dim=32, table_capacity=1 << 20,
                     bottom_sizes=(256, 64), top_sizes=(256, 64, 1))
    model = DLRM(cfg)
    state = model.init(jax.random.PRNGKey(0))
    state = dataclasses.replace(
        state, table=de.create_slots(model.var, state.table, model.opt))
    train_step, tx = model.make_train_step()
    opt_state = tx.init(state.dense)
    rng = np.random.default_rng(0)
    batches = {}
    for b in SIZES:
        raw = synthetic_criteo_batch(rng, b)
        batches[b] = {k: jnp.asarray(v) for k, v in raw.items()}
        dup = len(np.unique(tag_keys(raw["sparse"]).reshape(-1)))
        print(f"B={b}: {b * cfg.num_sparse} keys, {dup} unique "
              f"({dup / (b * cfg.num_sparse):.1%})", flush=True)

    def scan8(body):
        @jax.jit
        def run(state, opt_state, batch):
            def step(c, i):
                st, os_ = c
                st, os_, out = body(st, os_, batch, i)
                return (st, os_), out
            (st, os_), outs = jax.lax.scan(
                step, (state, opt_state),
                jnp.arange(STEPS, dtype=jnp.int32))
            return outs
        return run

    def v_full(st, os_, batch, i):
        st, os_, loss = train_step(st, os_, batch)
        return st, os_, loss

    def _keys(batch, i):
        # parity-flip the feature tag's low bit region keeps keys
        # resident? No — just parity-select batch order (resident either
        # way, defeats licm)
        k = tag_keys(batch["sparse"]).reshape(-1)
        return jax.lax.select((i & 1) == 0, k, k[::-1])

    def v_lookup(st, os_, batch, i):
        emb, ctx = model.params.embedding_lookup(
            st.table, _keys(batch, i), step=st.step + 1)
        return st, os_, emb[0, 0]

    def v_lookup_apply(st, os_, batch, i):
        emb, ctx = model.params.embedding_lookup(
            st.table, _keys(batch, i), step=st.step + 1)
        table = model.params.apply_gradients(
            st.table, ctx, emb * 0.01, model.opt, step=st.step)
        st = dataclasses.replace(st, table=table, step=st.step + 1)
        return st, os_, emb[0, 0]

    def mk_uniq_apply(b):
        n = b * cfg.num_sparse
        base = jnp.arange(1, n + 1, dtype=jnp.int64)

        def v(st, os_, batch, i):
            keys = jax.lax.select((i & 1) == 0, base, base[::-1])
            emb, ctx = model.params.embedding_lookup(
                st.table, keys, step=st.step + 1)
            table = model.params.apply_gradients(
                st.table, ctx, emb * 0.01, model.opt, step=st.step)
            st = dataclasses.replace(st, table=table, step=st.step + 1)
            return st, os_, emb[0, 0]
        return v

    def v_dense(st, os_, batch, i):
        b = batch["dense"].shape[0]
        emb_flat = jnp.broadcast_to(
            (batch["dense"][:, :1] + i).astype(cfg.value_dtype),
            (b, cfg.num_sparse * cfg.dim)).reshape(-1, cfg.dim)

        def wrapped(dense, emb_flat):
            loss, _ = model.loss_fn(
                dense, emb_flat, batch["dense"], batch["label"])
            return loss

        loss, (g_dense, _) = jax.value_and_grad(
            wrapped, argnums=(0, 1))(st.dense, emb_flat)
        import optax  # noqa: F401
        updates, os_ = tx.update(g_dense, os_, st.dense)
        from recommenders_addons_tpu.models.dlrm import optax_apply
        dense = optax_apply(st.dense, updates)
        st = dataclasses.replace(st, dense=dense)
        return st, os_, loss

    def v_tag(st, os_, batch, i):
        k = _keys(batch, i)
        return st, os_, k[0].astype(jnp.float32)

    variants = [
        ("full_step", lambda b: v_full),
        ("lookup_only", lambda b: v_lookup),
        ("lookup_apply", lambda b: v_lookup_apply),
        ("uniq_apply", mk_uniq_apply),
        ("dense_only", lambda b: v_dense),
        ("tag_only", lambda b: v_tag),
    ]

    b0, b1 = SIZES
    print(f"device={jax.devices()[0].device_kind} steps={STEPS}",
          flush=True)
    for name, mk in variants:
        if ONLY and not any(s in name.lower() for s in ONLY):
            continue
        runs = {b: scan8(mk(b)) for b in SIZES}
        for b in SIZES:
            _ = float(np.asarray(
                runs[b](state, opt_state, batches[b]))[-1].ravel()[0])
        slopes = []
        for _rep in range(REPS):
            ts = {}
            for b in SIZES:
                t0 = time.perf_counter()
                _ = float(np.asarray(
                    runs[b](state, opt_state, batches[b]))[-1].ravel()[0])
                ts[b] = time.perf_counter() - t0
            slopes.append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
        per_ex = _median(slopes)
        per_key = per_ex / cfg.num_sparse
        print(f"{name:>13}: {per_ex * 1e9:8.1f} ns/ex  "
              f"{per_key * 1e9:6.1f} ns/key  "
              f"({1.0 / max(per_ex, 1e-12) / 1e3:7.1f} K ex/s)",
              flush=True)


if __name__ == "__main__":
    main()
