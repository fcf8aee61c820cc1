"""Restrict-policy + object-API tests (reference restrict_policies_test.py
and cuckoo/hkv table-op test contracts, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops.restrict import (
    FrequencyRestrictPolicy,
    TimestampRestrictPolicy,
)


def test_timestamp_restrict_evicts_oldest():
    var = de.Variable(name="rp_ts", dim=2, init_capacity=1 << 8,
                      evict_strategy=de.EvictStrategy.LRU)
    policy = TimestampRestrictPolicy(var)
    var = policy.var
    state = var.init()
    # insert 100 keys at increasing "times"
    for t in range(10):
        keys = jnp.arange(t * 10, t * 10 + 10, dtype=jnp.int64) + 1
        state = var.upsert(state, keys, jnp.ones((10, 2)), step=t)
    assert int(var.size(state)) == 100
    state = policy.apply_restriction(state, num_reserved=40, trigger=50)
    assert int(var.size(state)) == 40
    # the survivors are the newest 40 keys (steps 6..9)
    k, _, m = jax.device_get(var.export(state))
    live = np.sort(np.asarray(k)[np.asarray(m)])
    np.testing.assert_array_equal(live, np.arange(61, 101))


def test_restrict_noop_below_trigger():
    var = de.Variable(name="rp_noop", dim=2, init_capacity=1 << 8)
    policy = TimestampRestrictPolicy(var)
    var = policy.var
    state = var.upsert(var.init(), jnp.arange(1, 21, dtype=jnp.int64),
                       jnp.ones((20, 2)), step=1)
    state = policy.apply_restriction(state, num_reserved=10, trigger=50)
    assert int(var.size(state)) == 20  # 20 < trigger: untouched


def test_frequency_restrict_evicts_rarest():
    var = de.Variable(name="rp_freq", dim=2, init_capacity=1 << 8,
                      evict_strategy=de.EvictStrategy.LFU)
    policy = FrequencyRestrictPolicy(var)
    var = policy.var
    state = var.init()
    hot = jnp.arange(1, 11, dtype=jnp.int64)
    cold = jnp.arange(11, 31, dtype=jnp.int64)
    state = var.upsert(state, cold, jnp.ones((20, 2)))
    for _ in range(5):
        state = var.upsert(state, hot, jnp.ones((10, 2)))
    state = policy.apply_restriction(state, num_reserved=10, trigger=15)
    k, _, m = jax.device_get(var.export(state))
    live = np.sort(np.asarray(k)[np.asarray(m)])
    np.testing.assert_array_equal(live, np.arange(1, 11))


def test_policy_apply_update_bumps_scores():
    var = de.Variable(name="rp_upd", dim=2, init_capacity=1 << 8,
                      evict_strategy=de.EvictStrategy.LRU)
    policy = TimestampRestrictPolicy(var)
    var = policy.var
    state = var.upsert(var.init(), jnp.arange(1, 21, dtype=jnp.int64),
                       jnp.ones((20, 2)), step=1)
    # refresh keys 1..5 at t=99
    state = policy.apply_update(
        state, jnp.arange(1, 6, dtype=jnp.int64), step=99
    )
    k, s, m = jax.device_get(var.export_keys_and_scores(state))
    k, s, m = np.asarray(k), np.asarray(s), np.asarray(m)
    refreshed = s[np.isin(k, np.arange(1, 6)) & m]
    np.testing.assert_array_equal(refreshed, 99)


# ---------------------------------------------------------------------------
# object API (table wrappers + creators)
# ---------------------------------------------------------------------------


def test_radix_select_matches_sort():
    """The restrict threshold selection is exact vs a numpy sort oracle."""
    import jax.numpy as jnp

    from recommenders_addons_tpu.ops.restrict import (
        _radix_select_threshold, _to_unsigned_order,
    )

    rng = np.random.default_rng(7)
    for dtype in (np.int32, np.int64):
        sc = rng.integers(-1000, 1000, 4096).astype(dtype)
        mask = rng.random(4096) < 0.7
        u = np.asarray(_to_unsigned_order(jnp.asarray(sc)))
        u = np.where(mask, u, np.iinfo(u.dtype).max)
        for k in (1, 10, 500, int(mask.sum())):
            t, below = _radix_select_threshold(
                jnp.asarray(u), jnp.asarray(mask), jnp.asarray(k))
            vals = np.sort(u[mask])
            assert int(t) == int(vals[k - 1])
            assert int(below) == int((u[mask] < vals[k - 1]).sum())


def test_restrict_large_capacity_scales():
    """apply_restriction must work at capacities where a top_k(capacity)
    would be prohibitive — exercise 1Mi capacity and verify exact count +
    oldest-first victim choice."""
    var = de.Variable(name="restrict_big", dim=2, init_capacity=1 << 20,
                      evict_strategy=de.EvictStrategy.LRU)
    state = var.init()
    n = 4096
    keys = jnp.arange(1, n + 1, dtype=jnp.int64)
    # insert in 4 waves with increasing LRU timestamps
    for w in range(4):
        sl = slice(w * (n // 4), (w + 1) * (n // 4))
        state = var.upsert(state, keys[sl], jnp.ones((n // 4, 2)), step=w)
    state = var.restrict(state, num_reserved=n // 2, trigger=n // 4)
    assert int(var.size(state)) == n // 2
    # survivors are exactly the two newest waves
    _, found = var.lookup(state, keys, return_exists=True)
    f = np.asarray(found)
    assert not f[: n // 2].any() and f[n // 2:].all()


def test_epoch_strategies_default_to_int64_scores():
    """EPOCH* strategies auto-widen scores so (epoch<<shift|step) packing
    cannot wrap (round-1 used int32: broken after 2^20 steps/epoch)."""
    v_epoch = de.Variable(name="sdt_epoch", dim=2,
                          evict_strategy=de.EvictStrategy.EPOCHLRU)
    assert np.dtype(v_epoch.spec.score_dtype) == np.int64
    v_lru = de.Variable(name="sdt_lru", dim=2,
                        evict_strategy=de.EvictStrategy.LRU)
    assert np.dtype(v_lru.spec.score_dtype) == np.int32
    # forced int32 stays honored (documented fast mode)
    v_forced = de.Variable(name="sdt_forced", dim=2,
                           evict_strategy=de.EvictStrategy.EPOCHLRU,
                           score_dtype=jnp.int32)
    assert np.dtype(v_forced.spec.score_dtype) == np.int32
    # int64 packing keeps epoch ordering beyond the int32 wrap point
    big_step = 1 << 21  # > 2^20 steps: int32 packing would collide epochs
    s_e1, _ = v_epoch.scores_for(jnp.zeros((1,), jnp.int64),
                                 step=big_step, epoch=1)
    s_e2, _ = v_epoch.scores_for(jnp.zeros((1,), jnp.int64),
                                 step=0, epoch=2)
    assert int(s_e2[0]) > int(s_e1[0])


def test_cuckoo_table_surface():
    t = de.CuckooHashTable(dim=4, name="api_cuckoo", init_size=1 << 10)
    keys = np.arange(1, 51, dtype=np.int64)
    vals = np.tile(keys[:, None].astype(np.float32), (1, 4))
    t.insert(keys, vals)
    assert t.size() == 50
    got, found = t.lookup(keys, return_exists=True)
    assert bool(np.asarray(found).all())
    np.testing.assert_allclose(np.asarray(got), vals)
    t.remove(keys[:10])
    assert t.size() == 40
    k, v = t.export()
    assert len(k) == 40
    t.clear()
    assert t.size() == 0


def test_table_default_value_for_missing():
    t = de.CuckooHashTable(dim=2, default_value=[-1.0, -1.0],
                           name="api_default")
    got = t.lookup(np.array([42], dtype=np.int64))
    np.testing.assert_allclose(np.asarray(got), -1.0)


def test_hkv_table_scores():
    t = de.HkvHashTable(dim=2, name="api_hkv", init_capacity=1 << 8,
                        evict_strategy=de.EvictStrategy.LFU)
    keys = np.arange(1, 11, dtype=np.int64)
    t.insert(keys, np.ones((10, 2), np.float32))
    t.insert(keys[:5], np.ones((5, 2), np.float32))
    k, s = t.export_keys_and_scores()
    s_by_key = dict(zip(k.tolist(), s.tolist()))
    assert s_by_key[1] == 2 and s_by_key[10] == 1


def test_kv_creator_factory():
    creator = de.HkvHashTableCreator(
        de.HkvHashTableConfig(init_capacity=1 << 9, max_capacity=1 << 9,
                              evict_strategy=de.EvictStrategy.LFU)
    )
    t = creator.create(dim=2, name="api_created")
    assert isinstance(t, de.HkvHashTable)
    assert t.var.evict_strategy == de.EvictStrategy.LFU
    kw = creator.get_variable_kwargs()
    assert kw["max_capacity"] == 1 << 9


def test_table_file_roundtrip(tmp_path):
    t = de.CuckooHashTable(dim=2, name="api_file", init_size=1 << 8)
    keys = np.arange(1, 21, dtype=np.int64)
    t.insert(keys, np.full((20, 2), 7.0, np.float32))
    t.save_to_file_system(str(tmp_path))
    t2 = de.CuckooHashTable(dim=2, name="api_file", init_size=1 << 8)
    t2.load_from_file_system(str(tmp_path))
    assert t2.size() == 20
    np.testing.assert_allclose(np.asarray(t2.lookup(keys)), 7.0)


# ---------------------------------------------------------------------------
# shadow_ops
# ---------------------------------------------------------------------------


def test_shadow_variable_train_and_infer():
    var = de.Variable(name="shadow_t", dim=4, init_capacity=1 << 8,
                      initializer=jax.nn.initializers.constant(0.5))
    shadow = de.ShadowVariable(var)
    state = var.init()
    ids = jnp.array([1, 2, 3, 2], dtype=jnp.int64)
    emb = de.shadow_ops.embedding_lookup(shadow, state, ids, training=True)
    assert emb.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(emb), 0.5)
    state = shadow.apply_gradients(state, jnp.ones_like(emb),
                                   de.SGD(0.1), step=0)
    # id=2 appears twice: grad 2.0 -> 0.5 - 0.2 = 0.3
    got = var.lookup(state, jnp.array([1, 2], dtype=jnp.int64))
    np.testing.assert_allclose(np.asarray(got)[0], 0.4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got)[1], 0.3, rtol=1e-6)
    # inference mode: missing id -> default, no insert
    infer = de.shadow_ops.embedding_lookup(shadow, state,
                                           jnp.array([99], dtype=jnp.int64),
                                           training=False)
    assert int(var.size(state)) == 3


def test_trainable_wrapper_filter():
    var = de.Variable(name="filter_v", dim=2)
    shadow = de.ShadowVariable(var)
    dense = jnp.ones((3,))
    sparse, others = de.trainable_wrapper_filter([var, shadow, dense])
    assert len(sparse) == 2 and len(others) == 1


class TestAutoGrow:
    """CuckooHashTable auto-growth: the reference's CPU cuckoo table grows
    on insert and NEVER loses a key (libcuckoo resize); this pins that
    contract for the stateful view (table_api.CuckooHashTable)."""

    def test_insert_past_capacity_never_loses_keys(self):
        t = de.CuckooHashTable(dim=4, init_size=128, name="ag1")
        rng = np.random.default_rng(0)
        all_keys = rng.choice(100_000, 600, replace=False).astype(
            np.int64) + 1
        for off in range(0, 600, 100):
            ks = all_keys[off:off + 100]
            t.insert(ks, np.full((100, 4), float(off), np.float32))
        assert t.size() == 600
        assert t.var.spec.capacity > 128
        vals, found = t.lookup(all_keys, return_exists=True)
        assert bool(np.asarray(found).all())

    def test_auto_grow_off_is_bounded(self):
        t = de.CuckooHashTable(dim=4, init_size=128, name="ag2",
                               auto_grow=False)
        rng = np.random.default_rng(1)
        keys = rng.choice(100_000, 600, replace=False).astype(np.int64) + 1
        t.insert(keys, np.ones((600, 4), np.float32))
        assert t.var.spec.capacity == 128  # bounded, HKV-style eviction
        assert t.size() <= 128

    def test_same_bucket_flood_grows_until_fit(self):
        # keys engineered into ONE bucket overflow the bucket well below
        # the load threshold: the eviction-capture path must still keep
        # every key by growing and re-inserting
        t = de.CuckooHashTable(dim=2, init_size=256, name="ag3")
        spec = t.var.spec
        from recommenders_addons_tpu.ops import hashing
        ks, want = [], 100
        k = 1
        while len(ks) < want:
            if int(np.asarray(hashing.bucket_of(
                    jnp.asarray([k], jnp.int64), spec.num_buckets))[0]) == 0:
                ks.append(k)
            k += 1
        ks = np.asarray(ks, np.int64)
        for off in range(0, want, 25):
            t.insert(ks[off:off + 25],
                     np.ones((25, 2), np.float32) * off)
        _, found = t.lookup(ks, return_exists=True)
        assert bool(np.asarray(found).all()), (
            f"lost {int((~np.asarray(found)).sum())} of {want} keys"
        )
