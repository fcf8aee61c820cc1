"""Differential fuzz test: random op sequences against a python dict model
(the reference validates table semantics the same way, SURVEY.md §4 —
'unit-tested against a NumPy dict model')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops import hashtable as ht



# quick-iteration opt-out: this file dominates suite wall-time
pytestmark = pytest.mark.heavy

@pytest.mark.slow
def test_fuzz_against_dict_model():
    rng = np.random.default_rng(42)
    # capacity far above live count so no eviction interferes
    spec = ht.TableSpec(dim=3, capacity=1 << 12, bucket_size=16)
    state = ht.create(spec)
    model = {}
    key_space = 500

    for step in range(60):
        op = rng.choice(["upsert", "accum", "remove", "lookup", "export"])
        ks = np.unique(
            rng.integers(1, key_space, size=rng.integers(1, 40))
        ).astype(np.int64)
        kj = jnp.asarray(ks)
        if op == "upsert":
            vals = rng.normal(size=(len(ks), 3)).astype(np.float32)
            state = ht.upsert(spec, state, kj, jnp.asarray(vals),
                              scores=jnp.full((len(ks),), step))
            for k, v in zip(ks, vals):
                model[int(k)] = v.copy()
        elif op == "accum":
            deltas = rng.normal(size=(len(ks), 3)).astype(np.float32)
            state = ht.accum(spec, state, kj, jnp.asarray(deltas),
                             scores=jnp.full((len(ks),), step))
            for k, d in zip(ks, deltas):
                if int(k) in model:
                    model[int(k)] = model[int(k)] + d
                else:
                    model[int(k)] = d.copy()
        elif op == "remove":
            state = ht.remove(spec, state, kj)
            for k in ks:
                model.pop(int(k), None)
        elif op == "lookup":
            got, found = ht.lookup(spec, state, kj, -1.0)
            got, found = np.asarray(got), np.asarray(found)
            for i, k in enumerate(ks):
                if int(k) in model:
                    assert found[i], (step, k)
                    np.testing.assert_allclose(
                        got[i], model[int(k)], rtol=1e-5, atol=1e-5
                    )
                else:
                    assert not found[i], (step, k)
        else:  # export
            k, v, m = jax.device_get(ht.export(spec, state))
            k, v, m = np.asarray(k), np.asarray(v), np.asarray(m)
            live = {int(x) for x in k[m]}
            assert live == set(model), (step, len(live), len(model))

    assert int(ht.size(spec, state)) == len(model)


def test_fuzz_training_vs_dense_reference():
    """Random sparse training must match a dense-embedding reference run
    (the reference's optimizer-parity strategy,
    dynamic_embedding_optimizer_test.py)."""
    rng = np.random.default_rng(7)
    vocab, dim = 64, 4
    var = de.Variable(name="fuzz_train", dim=dim, init_capacity=1 << 10,
                      initializer=jax.nn.initializers.constant(0.0))
    opt = de.Adam(0.01)
    state = de.create_slots(var, var.init(), opt)
    dense = np.zeros((vocab, dim), np.float32)
    m = np.zeros_like(dense)
    v = np.zeros_like(dense)
    b1, b2, eps, lr = 0.9, 0.999, 1e-7, 0.01

    for step in range(20):
        ids = np.unique(rng.integers(0, vocab, size=16)).astype(np.int64)
        g = rng.normal(size=(len(ids), dim)).astype(np.float32)
        emb, ctx = var.embedding_lookup(state, jnp.asarray(ids))
        state = var.apply_gradients(state, ctx, jnp.asarray(g), opt,
                                    step=step)
        # dense adam on the touched rows, per-row step count == global step
        t = step + 1
        m[ids] = b1 * m[ids] + (1 - b1) * g
        v[ids] = b2 * v[ids] + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        dense[ids] -= lr_t * m[ids] / (np.sqrt(v[ids]) + eps)

    ids = jnp.arange(vocab, dtype=jnp.int64)
    got, found = var.lookup(state, ids, return_exists=True)
    got = np.asarray(got)
    touched = np.asarray(found)
    np.testing.assert_allclose(got[touched], dense[touched],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fuzz_sharded_matches_single():
    """Route-invariance: a mesh-sharded table must behave exactly like a
    single-shard table for the same operation sequence (the reference's
    Horovod-vs-local equivalence strategy, horovod_sync_train_test.py)."""
    from jax.sharding import Mesh
    from recommenders_addons_tpu.parallel.sharded import ShardedVariable

    rng = np.random.default_rng(3)
    var_s = de.Variable(name="fz_single", dim=4, init_capacity=1 << 12,
                        initializer=jax.nn.initializers.constant(0.25))
    var_m = de.Variable(name="fz_mesh", dim=4, init_capacity=1 << 12,
                        initializer=jax.nn.initializers.constant(0.25))
    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    sv = ShardedVariable(var=var_m, mesh=mesh)
    s1 = var_s.init()
    s2 = sv.init()
    opt1, opt2 = de.Adagrad(0.05), de.Adagrad(0.05)

    for step in range(6):
        ids = rng.integers(1, 400, size=64).astype(np.int64)
        ids_j = jnp.asarray(ids)
        emb1, ctx1 = var_s.embedding_lookup(s1, ids_j)
        emb2, ctx2 = sv.embedding_lookup(s2, ids_j)
        np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2),
                                   rtol=1e-5, atol=1e-6)
        g = jnp.asarray(
            rng.normal(size=emb1.shape).astype(np.float32)
        )
        s1 = var_s.apply_gradients(s1, ctx1, g, opt1, step=step)
        s2 = sv.apply_gradients(s2, ctx2, g, opt2, step=step)
        assert int(var_s.size(s1)) == int(sv.size(s2))

    probe = jnp.asarray(np.arange(1, 401, dtype=np.int64))  # %4 == 0
    v1 = np.asarray(var_s.lookup(s1, probe))
    v2 = np.asarray(sv.lookup(s2, probe))
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)
