"""Host-DRAM spill tier tests (the reference Redis-backend role +
HKV hybrid storage, SURVEY.md §2.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops.spill import HostKVStore, HybridTable, SpillTier


def test_host_store_put_get_grow():
    st = HostKVStore(dim=2, initial_capacity=8)
    keys = np.arange(1, 101, dtype=np.int64)
    vals = np.tile(keys[:, None].astype(np.float32), (1, 2))
    st.put(keys, vals, scores=keys)
    assert len(st) == 100
    got, sc, _, found = st.get(np.array([5, 50, 999], np.int64))
    assert found.tolist() == [True, True, False]
    np.testing.assert_allclose(got[0], 5.0)
    assert sc[1] == 50
    # overwrite wins
    st.put(np.array([5], np.int64), np.full((1, 2), -1.0, np.float32))
    got, _, _, _ = st.get(np.array([5], np.int64))
    np.testing.assert_allclose(got[0], -1.0)
    assert len(st) == 100


def test_host_store_delete():
    st = HostKVStore(dim=2, initial_capacity=8)
    keys = np.arange(1, 33, dtype=np.int64)
    st.put(keys, np.ones((32, 2), np.float32))
    st.delete(keys[:16])
    assert len(st) == 16
    _, _, _, found = st.get(keys)
    assert found[:16].sum() == 0 and found[16:].all()


def test_demote_promote_roundtrip():
    var = de.Variable(name="spill_a", dim=2, init_capacity=1 << 8,
                      evict_strategy=de.EvictStrategy.LRU)
    tier = SpillTier(var)
    state = var.init()
    # 60 keys at t=1 (cold), 40 at t=9 (hot)
    cold = jnp.arange(1, 61, dtype=jnp.int64)
    hot = jnp.arange(61, 101, dtype=jnp.int64)
    state = var.upsert(state, cold, jnp.full((60, 2), 1.5), step=1)
    state = var.upsert(state, hot, jnp.full((40, 2), 2.5), step=9)

    state = tier.demote(state, 60)
    assert int(var.size(state)) == 40
    assert len(tier.store) == 60
    # HBM misses the cold keys now
    _, found = var.lookup(state, cold, return_exists=True)
    assert not bool(np.asarray(found).any())
    # serving read-through still sees them
    got = tier.lookup_through(state, cold[:5])
    np.testing.assert_allclose(np.asarray(got), 1.5)
    # promote half back
    state = tier.promote(state, cold[:30])
    assert int(var.size(state)) == 70
    assert len(tier.store) == 30
    got = var.lookup(state, cold[:30])
    np.testing.assert_allclose(np.asarray(got), 1.5)


def test_demote_carries_optimizer_slots():
    var = de.Variable(name="spill_b", dim=2, init_capacity=1 << 8)
    opt = de.Adam(0.01)
    state = de.create_slots(var, var.init(), opt)
    keys = jnp.arange(1, 11, dtype=jnp.int64)
    emb, ctx = var.embedding_lookup(state, keys)
    state = var.apply_gradients(state, ctx, jnp.ones_like(emb), opt, step=0)
    m_before = np.asarray(jax.device_get(
        var.lookup(state, keys)))  # values after 1 step

    tier = SpillTier(var)
    state = tier.demote(state, 10)
    assert int(var.size(state)) == 0
    state = tier.promote(state, keys)
    # values and m/v slots restored: a second identical step must match a
    # never-demoted table's second step
    var2 = de.Variable(name="spill_b2", dim=2, init_capacity=1 << 8)
    state2 = de.create_slots(var2, var2.init(), opt)
    emb2, ctx2 = var2.embedding_lookup(state2, keys)
    state2 = var2.apply_gradients(state2, ctx2, jnp.ones_like(emb2), opt,
                                  step=0)
    emb_a, ctx_a = var.embedding_lookup(state, keys)
    state_a = var.apply_gradients(state, ctx_a, jnp.ones_like(emb_a), opt,
                                  step=1)
    emb_b, ctx_b = var2.embedding_lookup(state2, keys)
    state_b = var2.apply_gradients(state2, ctx_b, jnp.ones_like(emb_b), opt,
                                   step=1)
    va = np.asarray(jax.device_get(var.lookup(state_a, keys)))
    vb = np.asarray(jax.device_get(var2.lookup(state_b, keys)))
    np.testing.assert_allclose(va, vb, rtol=1e-6)


def test_hybrid_watermark():
    var = de.Variable(name="spill_c", dim=2, init_capacity=256,
                      bucket_size=64)
    hy = HybridTable(var, high=0.9, low=0.5)
    rng = np.random.default_rng(0)
    for t in range(8):
        ids = jnp.asarray(
            rng.integers(1, 10_000, size=64).astype(np.int64)
        )
        hy.prepare_batch(ids)
        hy.state = var.upsert(hy.state, ids, jnp.ones((64, 2)), step=t)
    # watermark is enforced at batch-prepare time
    hy.prepare_batch(jnp.asarray([1], dtype=jnp.int64))
    total = hy.tier.total_keys(hy.state)
    assert int(var.size(hy.state)) <= int(0.9 * 256) + 1
    assert total > 256  # "bigger than HBM" table works


def test_host_store_delete_churn_fuzz():
    """Tombstone deletion (r5: delete no longer rebuilds the store) must
    stay exact through heavy put/delete churn: chains extend past
    tombstones, inserts reclaim them, compaction sweeps are transparent.
    Fuzzed against a dict model, for BOTH store implementations."""
    from recommenders_addons_tpu.native import (
        NativeHostKVStore, native_available,
    )

    impls = [lambda: HostKVStore(dim=4, initial_capacity=64)]
    if native_available():
        impls.append(lambda: NativeHostKVStore(4, np.float32, 64))
    for mk in impls:
        rng = np.random.default_rng(7)
        store, model = mk(), {}
        for it in range(250):
            op = int(rng.integers(0, 3))
            ks = rng.integers(1, 400, size=int(rng.integers(1, 48))
                              ).astype(np.int64)
            if op == 0:
                vals = rng.normal(size=(len(ks), 4)).astype(np.float32)
                store.put(ks, vals)
                for k, v in zip(ks, vals):
                    model[int(k)] = v
            elif op == 1:
                store.delete(ks)
                for k in ks:
                    model.pop(int(k), None)
            else:
                vals, _, _, found = store.get(ks)
                for i, k in enumerate(ks):
                    assert found[i] == (int(k) in model)
                    if found[i]:
                        np.testing.assert_allclose(
                            vals[i], model[int(k)], rtol=1e-6)
            assert len(store) == len(model)
        k, _, _, _ = store.export_all()
        assert set(np.asarray(k).tolist()) == set(model)
