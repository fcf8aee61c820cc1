"""Round-3 hardening: radix-select eviction unification, checkpoint
treedef validation, get_variable initializer conflicts, ragged
FieldWiseEmbedding, and fused-path eviction capture (the round-2 advisor's
medium finding: victims' values must come from the PRE-commit table, not
the lookup's packed rows)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu.ops import hashtable as ht
from recommenders_addons_tpu.ops import optimizer as opt_lib
from recommenders_addons_tpu.ops.variable import (
    Variable, clear_variable_store, get_variable,
)


def _expected_victims(scores, mask, k):
    """Reference victim set: first-k by (score, slot) among masked."""
    idx = np.nonzero(mask)[0]
    order = idx[np.lexsort((idx, scores[idx]))]
    return set(order[: min(k, len(idx))].tolist())


class TestLowestKIndices:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sort_reference(self, seed):
        rng = np.random.default_rng(seed)
        c, k = 4096, 100
        scores = rng.integers(-50, 50, size=c).astype(np.int32)  # many ties
        mask = rng.random(c) < 0.7
        idx, valid = jax.jit(
            ht.lowest_k_indices, static_argnums=2
        )(jnp.asarray(scores), jnp.asarray(mask), k)
        idx, valid = np.asarray(idx), np.asarray(valid)
        got = set(idx[valid].tolist())
        assert got == _expected_victims(scores, mask, k)
        # invalid tail points at the drop sentinel
        assert (idx[~valid] == c).all()

    def test_fewer_live_than_k(self):
        scores = np.asarray([5, 3, 9, 1], np.int32)
        mask = np.asarray([True, False, True, True])
        idx, valid = ht.lowest_k_indices(
            jnp.asarray(scores), jnp.asarray(mask), 10)
        assert set(np.asarray(idx)[np.asarray(valid)].tolist()) == {0, 2, 3}
        assert int(np.asarray(valid).sum()) == 3

    def test_int64_scores(self):
        rng = np.random.default_rng(3)
        c, k = 2048, 64
        scores = (rng.integers(-(2**40), 2**40, size=c)).astype(np.int64)
        mask = rng.random(c) < 0.9
        idx, valid = ht.lowest_k_indices(
            jnp.asarray(scores), jnp.asarray(mask), k)
        got = set(np.asarray(idx)[np.asarray(valid)].tolist())
        assert got == _expected_victims(scores, mask, k)

    def test_multi_mi_capacity(self):
        """Production-capacity victim selection (the reason top_k was
        banned from every eviction path)."""
        rng = np.random.default_rng(7)
        c, k = 1 << 22, 1024  # 4Mi
        scores = rng.integers(0, 1 << 20, size=c).astype(np.int32)
        mask = np.ones(c, bool)
        idx, valid = jax.jit(
            ht.lowest_k_indices, static_argnums=2
        )(jnp.asarray(scores), jnp.asarray(mask), k)
        got = set(np.asarray(idx)[np.asarray(valid)].tolist())
        assert got == _expected_victims(scores, mask, k)

    @pytest.mark.slow
    def test_64mi_capacity(self):
        """64Mi-slot victim selection completes and is exact (VERDICT r2
        item 5)."""
        rng = np.random.default_rng(11)
        c, k = 1 << 26, 4096
        scores = rng.integers(0, 1 << 30, size=c).astype(np.int32)
        mask = np.ones(c, bool)
        idx, valid = jax.jit(
            ht.lowest_k_indices, static_argnums=2
        )(jnp.asarray(scores), jnp.asarray(mask), k)
        got = np.sort(np.asarray(idx)[np.asarray(valid)])
        want = np.sort(np.asarray(sorted(_expected_victims(
            scores, mask, k))))
        np.testing.assert_array_equal(got, want)


class TestGetVariableConflicts:
    def setup_method(self):
        clear_variable_store()

    def test_conflicting_initializer_raises(self):
        get_variable("gv_init", dim=4, initializer=0.5)
        with pytest.raises(ValueError, match="initializer"):
            get_variable("gv_init", dim=4, initializer=0.7)

    def test_same_initializer_ok(self):
        v1 = get_variable("gv_same", dim=4, initializer=0.5)
        v2 = get_variable("gv_same", dim=4, initializer=0.5)
        assert v1 is v2

    def test_array_initializer_compares_by_value(self):
        v1 = get_variable(
            "gv_arr", dim=2, initializer=np.asarray([1.0, 2.0], np.float32))
        v2 = get_variable(
            "gv_arr", dim=2, initializer=np.asarray([1.0, 2.0], np.float32))
        assert v1 is v2
        with pytest.raises(ValueError, match="initializer"):
            get_variable(
                "gv_arr", dim=2,
                initializer=np.asarray([9.0, 2.0], np.float32))


class TestCheckpointTreedefGuard:
    def test_changed_structure_raises(self, tmp_path):
        from recommenders_addons_tpu.train.checkpoint import DECheckpoint

        params = {"a": jnp.ones((2,)), "b": jnp.zeros((3,))}
        ckpt = DECheckpoint(dense=params)
        ckpt.save(str(tmp_path), state={"dense": params}, step=1)
        # same structure restores fine
        out = ckpt.restore(str(tmp_path), state={"dense": params}, step=1)
        np.testing.assert_array_equal(np.asarray(out["dense"]["a"]),
                                      np.ones((2,)))
        # renamed leaf -> different treedef -> must raise, not mis-assign
        bad = {"a": jnp.ones((2,)), "c": jnp.zeros((3,))}
        with pytest.raises(ValueError, match="tree structure changed"):
            ckpt.restore(str(tmp_path), state={"dense": bad}, step=1)
        # dropped leaf -> leaf-count mismatch -> must raise
        with pytest.raises(ValueError):
            ckpt.restore(str(tmp_path),
                         state={"dense": {"a": jnp.ones((2,))}}, step=1)


class TestFieldWiseRagged:
    def test_ragged_matches_dense(self):
        from recommenders_addons_tpu.nn.layers import FieldWiseEmbedding
        from recommenders_addons_tpu.ops import sparse as sparse_ops

        layer = FieldWiseEmbedding(
            embedding_size=8, nslots=3,
            slot_map_fn=lambda x: (x % 3).astype(jnp.int32),
            name="fw_ragged_t", init_capacity=1024,
        )
        state = layer.init_state()
        keys = jnp.arange(1, 13, dtype=jnp.int64)
        vals = jax.random.normal(jax.random.PRNGKey(0), (12, 8))
        state = layer.var.upsert(state, keys, vals)

        dense_ids = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int64)
        dense_out = layer(state, dense_ids, training=False)

        ragged = sparse_ops.RaggedIds(
            values=jnp.asarray([1, 2, 3, 4, 5, 6], jnp.int64),
            row_splits=jnp.asarray([0, 3, 6], jnp.int32),
        )
        ragged_out = layer(state, ragged, training=False)
        np.testing.assert_allclose(
            np.asarray(ragged_out), np.asarray(dense_out), rtol=1e-6)

    def test_ragged_uneven_rows(self):
        from recommenders_addons_tpu.nn.layers import FieldWiseEmbedding
        from recommenders_addons_tpu.ops import sparse as sparse_ops

        layer = FieldWiseEmbedding(
            embedding_size=4, nslots=2,
            slot_map_fn=lambda x: (x % 2).astype(jnp.int32),
            name="fw_ragged_u", init_capacity=1024,
        )
        state = layer.init_state()
        keys = jnp.asarray([10, 11, 12], jnp.int64)
        vals = jnp.asarray(
            [[1.0] * 4, [2.0] * 4, [4.0] * 4], jnp.float32)
        state = layer.var.upsert(state, keys, vals)
        # row 0 = [10, 11, 12], row 1 = [] (padding tail ignored)
        ragged = sparse_ops.RaggedIds(
            values=jnp.asarray([10, 11, 12, 99], jnp.int64),
            row_splits=jnp.asarray([0, 3, 3], jnp.int32),
        )
        out = np.asarray(layer(state, ragged, training=False))
        assert out.shape == (2, 2, 4)
        # slot 0 <- key 10 (even) + key 12 (even); slot 1 <- key 11
        np.testing.assert_allclose(out[0, 0], [5.0] * 4)
        np.testing.assert_allclose(out[0, 1], [2.0] * 4)
        np.testing.assert_allclose(out[1], 0.0)


class TestFusedEvictionCapture:
    def test_fused_capture_reads_victim_rows(self):
        """return_evicted on the FUSED apply path must surface the
        DISPLACED key's stored values — not the new key's init rows
        (advisor r2 medium: ctx.packed's value columns hold the new key's
        blend after plan_lookup_train)."""
        old_env = dict(os.environ)
        os.environ["TFRA_TPU_PALLAS_INTERPRET"] = "1"
        os.environ.pop("TFRA_TPU_DISABLE_PALLAS", None)
        os.environ.pop("TFRA_TPU_DISABLE_FUSED_APPLY", None)
        try:
            var = Variable(
                name="fused_evict_t", dim=64, init_capacity=64,
                bucket_size=64, initializer=0.25,
            )
            opt = opt_lib.Adam(learning_rate=0.1)
            state = var.init()
            state = opt_lib.create_slots(var, state, opt)
            # fill the single bucket completely with known values
            keys = jnp.arange(1, 65, dtype=jnp.int64)
            vals = (jnp.arange(64, dtype=jnp.float32)[:, None]
                    * jnp.ones((1, 64), jnp.float32))
            state = var.upsert(state, keys, vals, step=5)
            stored = {
                int(k): np.asarray(v) for k, v in zip(
                    np.asarray(keys),
                    np.asarray(var.lookup(state, keys)))
            }
            # batch of brand-new keys -> all insert-with-eviction
            new_keys = jnp.arange(1000, 1008, dtype=jnp.int64)
            emb, ctx = var.embedding_lookup(state, new_keys)
            assert bool(np.asarray(ctx.inserted).any())
            grads = jnp.ones_like(emb)
            new_state, ev = var.apply_gradients(
                state, ctx, grads, opt, step=6, return_evicted=True)
            ev = jax.device_get(ev)
            ev_keys = np.asarray(ev["keys"]).reshape(-1)
            ev_vals = np.asarray(ev["values"])
            displaced = ev_keys != var.empty_key
            assert displaced.sum() == 8
            for k, v in zip(ev_keys[displaced], ev_vals[displaced]):
                np.testing.assert_allclose(
                    v, stored[int(k)], rtol=1e-6,
                    err_msg=f"victim {k} spilled wrong values")
        finally:
            os.environ.clear()
            os.environ.update(old_env)
