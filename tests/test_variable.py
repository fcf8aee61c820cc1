"""Variable-level tests (reference: dynamic_embedding_variable_test.py,
shadow_embedding_ops_test.py — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de


def make_var(**kw):
    kw.setdefault("name", "test_var")
    kw.setdefault("dim", 4)
    kw.setdefault("init_capacity", 1024)
    kw.setdefault("bucket_size", 8)
    return de.Variable(**kw)


class TestLookup:
    def test_inference_default_value(self):
        var = make_var(initializer=3.5)
        state = var.init()
        ids = jnp.asarray([[1, 2], [3, 4]], dtype=jnp.int64)
        out = var.lookup(state, ids)
        assert out.shape == (2, 2, 4)
        np.testing.assert_allclose(np.asarray(out), 3.5)

    def test_upsert_then_lookup_nd(self):
        var = make_var()
        state = var.init()
        keys = jnp.asarray([1, 2, 3], dtype=jnp.int64)
        vals = jnp.stack([jnp.full((4,), float(k)) for k in [1, 2, 3]])
        state = var.upsert(state, keys, vals)
        out, exists = var.lookup(
            state, jnp.asarray([[3, 1]], dtype=jnp.int64), return_exists=True
        )
        np.testing.assert_allclose(np.asarray(out[0, 0]), 3.0)
        np.testing.assert_allclose(np.asarray(out[0, 1]), 1.0)
        assert bool(exists.all())

    def test_upsert_duplicate_keys_last_wins_shape(self):
        var = make_var()
        state = var.init()
        keys = jnp.asarray([7, 7, 8], dtype=jnp.int64)
        vals = jnp.stack(
            [jnp.full((4,), 1.0), jnp.full((4,), 2.0), jnp.full((4,), 9.0)]
        )
        state = var.upsert(state, keys, vals)
        assert int(var.size(state)) == 2

    def test_trainable_lookup_deterministic_init(self):
        var = make_var(
            initializer=jax.nn.initializers.normal(1.0), name="det_init"
        )
        state = var.init()
        ids = jnp.asarray([5, 6, 5], dtype=jnp.int64)
        emb1, ctx1 = var.embedding_lookup(state, ids)
        emb2, _ = var.embedding_lookup(state, ids)
        # per-key deterministic rows, duplicates share one row
        np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2))
        np.testing.assert_allclose(np.asarray(emb1[0]), np.asarray(emb1[2]))
        assert np.abs(np.asarray(emb1)).sum() > 0

    def test_accum_parity_signature(self):
        var = make_var()
        state = var.init()
        keys = jnp.asarray([1], dtype=jnp.int64)
        state = var.upsert(state, keys, jnp.full((1, 4), 10.0))
        old = jnp.full((1, 4), 10.0)
        new = jnp.full((1, 4), 12.0)
        state = var.accum(state, keys, old, new)
        out = var.lookup(state, keys)
        np.testing.assert_allclose(np.asarray(out[0]), 12.0)

    def test_get_variable_store(self):
        de.clear_variable_store()
        v1 = de.get_variable("shared", dim=8)
        v2 = de.get_variable("shared")
        assert v1 is v2
        with pytest.raises(ValueError):
            de.get_variable("shared", dim=16)
        de.clear_variable_store()


class TestTraining:
    def test_gradient_flow_and_insert(self):
        var = make_var(name="train_var")
        state = var.init()
        ids = jnp.asarray([3, 4, 3], dtype=jnp.int64)
        target = jnp.ones((3, 4))

        def loss_fn(emb):
            return 0.5 * jnp.sum((emb - target) ** 2)

        emb, ctx = var.embedding_lookup(state, ids)
        g = jax.grad(loss_fn)(emb)
        state = var.apply_gradients(state, ctx, g, de.SGD(0.5), step=0)
        assert int(var.size(state)) == 2  # 3 and 4 inserted
        out = var.lookup(state, jnp.asarray([3], dtype=jnp.int64))
        # id 3 appears twice: grad = 2*(0-1) rows summed -> rows = 0 + 0.5*2 = 1.0
        np.testing.assert_allclose(np.asarray(out[0]), 1.0, rtol=1e-6)
        out4 = var.lookup(state, jnp.asarray([4], dtype=jnp.int64))
        np.testing.assert_allclose(np.asarray(out4[0]), 0.5, rtol=1e-6)

    def test_training_converges(self):
        var = make_var(name="conv_var", initializer=0.0)
        state = var.init()
        opt = de.Adam(0.1)
        targets = {i: np.full(4, i * 0.1, np.float32) for i in range(1, 9)}

        @jax.jit
        def step(state, ids, tgt, i):
            emb, ctx = var.embedding_lookup(state, ids)
            g = jax.grad(lambda e: 0.5 * jnp.sum((e - tgt) ** 2))(emb)
            return var.apply_gradients(state, ctx, g, opt, step=i)

        rng = np.random.default_rng(0)
        for i in range(200):
            ids = rng.choice(list(targets), size=4, replace=False)
            tgt = jnp.asarray(np.stack([targets[j] for j in ids]))
            state = step(state, jnp.asarray(ids, dtype=jnp.int64), tgt, i)
        for k, t in targets.items():
            out = var.lookup(state, jnp.asarray([k], dtype=jnp.int64))
            np.testing.assert_allclose(np.asarray(out[0]), t, atol=1e-2)

    def test_bp_v2_delta_writeback(self):
        # two "workers" race on the same step from the same snapshot; bp_v2
        # accumulates both deltas (reference rationale
        # dynamic_embedding_variable.py:546-552)
        var = make_var(name="bpv2_var", bp_v2=True)
        state = var.init()
        keys = jnp.asarray([1], dtype=jnp.int64)
        state = var.upsert(state, keys, jnp.full((1, 4), 10.0))

        emb, ctx = var.embedding_lookup(state, keys)
        g1 = jnp.full((1, 4), 1.0)
        g2 = jnp.full((1, 4), 2.0)
        s1 = var.apply_gradients(state, ctx, g1, de.SGD(1.0))
        s2 = var.apply_gradients(s1, ctx, g2, de.SGD(1.0))
        out = var.lookup(s2, keys)
        # delta1 = -1, delta2 = -2 applied to shared base 10 -> 7
        np.testing.assert_allclose(np.asarray(out[0]), 7.0)


class TestEvictScores:
    def test_lru_scores_track_step(self):
        var = make_var(name="lru_var", evict_strategy=de.EvictStrategy.LRU)
        state = var.init()
        k1 = jnp.asarray([1], dtype=jnp.int64)
        k2 = jnp.asarray([2], dtype=jnp.int64)
        state = var.upsert(state, k1, jnp.ones((1, 4)), step=5)
        state = var.upsert(state, k2, jnp.ones((1, 4)), step=9)
        keys, scores, mask = var.export_keys_and_scores(state)
        got = {
            int(k): int(s)
            for k, s, m in zip(
                np.asarray(keys), np.asarray(scores), np.asarray(mask)
            )
            if m
        }
        assert got == {1: 5, 2: 9}

    def test_lfu_scores_count(self):
        var = make_var(name="lfu_var", evict_strategy=de.EvictStrategy.LFU)
        state = var.init()
        k = jnp.asarray([1], dtype=jnp.int64)
        for _ in range(3):
            state = var.upsert(state, k, jnp.ones((1, 4)))
        _, scores, mask = var.export_keys_and_scores(state)
        assert int(np.asarray(scores)[np.asarray(mask)][0]) == 3

    def test_customized_scores(self):
        var = make_var(
            name="cust_var",
            evict_strategy=de.EvictStrategy.CUSTOMIZED,
            gen_scores_fn=lambda keys: keys * 10,
        )
        state = var.init()
        k = jnp.asarray([4], dtype=jnp.int64)
        state = var.upsert(state, k, jnp.ones((1, 4)))
        _, scores, mask = var.export_keys_and_scores(state)
        assert int(np.asarray(scores)[np.asarray(mask)][0]) == 40


class TestGrow:
    """Explicit growth (the reference's CPU cuckoo table grows on insert;
    here growth is a host-driven rebuild — Variable.grow docstring)."""

    def test_grow_preserves_rows_slots_scores(self):
        var = de.Variable(name="grow_t1", dim=8, init_capacity=256,
                          initializer=0.0)
        opt = de.Adam(0.01)
        state = de.create_slots(var, var.init(), opt)
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.choice(10_000, 200, replace=False)
                           .astype(np.int64) + 1)
        vals = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
        state = var.upsert(state, keys, vals, step=7)
        # train one step so the Adam slots hold nonzero state
        emb, ctx = var.embedding_lookup(state, keys[:64])
        state = var.apply_gradients(state, ctx, emb * 0.1, opt, step=1)

        before_vals, before_ex = var.lookup(state, keys, return_exists=True)
        assert bool(np.asarray(before_ex).all())
        before_m = np.asarray(state.slots["m"])
        before_keys = np.asarray(state.keys)
        before_scores = np.asarray(state.scores)

        var2, state2 = var.grow(state, 2048, chunk_size=128)
        assert var2.spec.capacity == 2048
        assert int(var2.size(state2)) == int(var.size(state))
        after_vals, after_ex = var2.lookup(state2, keys, return_exists=True)
        assert bool(np.asarray(after_ex).all())
        np.testing.assert_array_equal(np.asarray(after_vals),
                                      np.asarray(before_vals))
        # per-key slot rows and scores survive the rebuild
        k2s = dict()
        occ = np.asarray(
            de.raw_table.occupancy_mask(var2.spec, state2))
        keys2 = np.asarray(state2.keys)
        m2 = np.asarray(state2.slots["m"])
        sc2 = np.asarray(state2.scores)
        for i in np.nonzero(occ)[0]:
            k2s[int(keys2[i])] = (m2[i], sc2[i])
        occ1 = before_keys != int(var.empty_key)
        for i in np.nonzero(occ1)[0]:
            m_new, sc_new = k2s[int(before_keys[i])]
            np.testing.assert_array_equal(m_new, before_m[i])
            assert sc_new == before_scores[i]

    def test_grow_rejects_shrink(self):
        var = de.Variable(name="grow_t2", dim=4, init_capacity=1024)
        state = var.init()
        with pytest.raises(ValueError):
            var.grow(state, 256)

    def test_grow_then_train_continues(self):
        var = de.Variable(name="grow_t3", dim=4, init_capacity=128,
                          initializer=jax.nn.initializers.normal(0.1))
        opt = de.SGD(0.1)
        state = de.create_slots(var, var.init(), opt)
        ids = jnp.arange(1, 100, dtype=jnp.int64)
        emb, ctx = var.embedding_lookup(state, ids)
        state = var.apply_gradients(state, ctx, emb * 0.1, opt)
        var2, state2 = var.grow(state, 1024)
        emb2, ctx2 = var2.embedding_lookup(state2, ids)
        state2 = var2.apply_gradients(state2, ctx2, emb2 * 0.1, opt)
        assert int(var2.size(state2)) == 99
