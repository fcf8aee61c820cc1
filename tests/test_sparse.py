"""Sparse/ragged lookup + de.math tests (reference:
dynamic_embedding_ops_test.py sparse paths, ragged_embedding_ops.py,
math_ops tests — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de

DIM = 4
E = de.EMPTY_KEY


@pytest.fixture
def var_state():
    var = de.Variable(name="sp_var", dim=DIM, init_capacity=1024)
    state = var.init()
    keys = jnp.arange(1, 11, dtype=jnp.int64)
    vals = jnp.stack([jnp.full((DIM,), float(k)) for k in range(1, 11)])
    state = var.upsert(state, keys, vals)
    return var, state


class TestCombiners:
    def test_padded_dense_mean(self, var_state):
        var, state = var_state
        ids = jnp.asarray([[1, 2, E], [3, E, E]], dtype=jnp.int64)
        out = de.embedding_lookup_sparse(
            var, state, ids, combiner="mean", training=False
        )
        np.testing.assert_allclose(np.asarray(out[0]), 1.5)
        np.testing.assert_allclose(np.asarray(out[1]), 3.0)

    def test_padded_dense_sum_sqrtn(self, var_state):
        var, state = var_state
        ids = jnp.asarray([[1, 3, E]], dtype=jnp.int64)
        s = de.embedding_lookup_sparse(
            var, state, ids, combiner="sum", training=False
        )
        np.testing.assert_allclose(np.asarray(s[0]), 4.0)
        q = de.embedding_lookup_sparse(
            var, state, ids, combiner="sqrtn", training=False
        )
        np.testing.assert_allclose(
            np.asarray(q[0]), 4.0 / np.sqrt(2.0), rtol=1e-6
        )

    def test_weights(self, var_state):
        var, state = var_state
        ids = jnp.asarray([[1, 2]], dtype=jnp.int64)
        w = jnp.asarray([[1.0, 3.0]])
        out = de.embedding_lookup_sparse(
            var, state, ids, w, combiner="mean", training=False
        )
        np.testing.assert_allclose(np.asarray(out[0]), (1 + 6) / 4.0)

    def test_sparse_ids_coo(self, var_state):
        var, state = var_state
        sp = de.SparseIds(
            indices=jnp.asarray([[0, 0], [0, 1], [2, 0]], dtype=jnp.int32),
            values=jnp.asarray([1, 5, 2], dtype=jnp.int64),
            dense_shape=(3, 2),
        )
        out = de.embedding_lookup_sparse(
            var, state, sp, combiner="mean", training=False
        )
        np.testing.assert_allclose(np.asarray(out[0]), 3.0)
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)  # empty row
        np.testing.assert_allclose(np.asarray(out[2]), 2.0)

    def test_ragged_ids(self, var_state):
        var, state = var_state
        rg = de.RaggedIds(
            values=jnp.asarray([1, 2, 3, 0, 0], dtype=jnp.int64),
            row_splits=jnp.asarray([0, 2, 3, 3], dtype=jnp.int32),
        )
        out = de.embedding_lookup_sparse(
            var, state, rg, combiner="sum", training=False
        )
        assert out.shape == (3, DIM)
        np.testing.assert_allclose(np.asarray(out[0]), 3.0)
        np.testing.assert_allclose(np.asarray(out[1]), 3.0)
        np.testing.assert_allclose(np.asarray(out[2]), 0.0)


class TestRaggedOutput:
    """Ragged-in ragged-OUT lookup + ragged fill-empty-rows (reference
    ragged_embedding_ops.py:66-127, shadow_embedding_ops.py:284-328)."""

    def test_embedding_lookup_ragged_inference(self, var_state):
        var, state = var_state
        rg = de.RaggedIds(
            values=jnp.asarray([1, 2, 3, 0, 0], dtype=jnp.int64),
            row_splits=jnp.asarray([0, 2, 3, 3], dtype=jnp.int32),
        )
        out = de.embedding_lookup_ragged(var, state, rg, training=False)
        assert isinstance(out, de.RaggedValues)
        np.testing.assert_array_equal(
            np.asarray(out.row_splits), np.asarray(rg.row_splits))
        np.testing.assert_allclose(np.asarray(out.values[0]), 1.0)
        np.testing.assert_allclose(np.asarray(out.values[1]), 2.0)
        np.testing.assert_allclose(np.asarray(out.values[2]), 3.0)
        np.testing.assert_allclose(np.asarray(out.values[3:]), 0.0)  # pad
        padded = out.to_padded(2)
        assert padded.shape == (3, 2, DIM)
        np.testing.assert_allclose(np.asarray(padded[0, 1]), 2.0)
        np.testing.assert_allclose(np.asarray(padded[1, 1]), 0.0)
        np.testing.assert_allclose(np.asarray(padded[2]), 0.0)

    def test_embedding_lookup_ragged_training_grads(self, var_state):
        var, state = var_state
        opt = de.SGD(1.0)
        state = de.create_slots(var, state, opt)
        rg = de.RaggedIds(
            values=jnp.asarray([1, 1, 2, 0], dtype=jnp.int64),
            row_splits=jnp.asarray([0, 2, 3], dtype=jnp.int32),
        )
        out, ctx = de.embedding_lookup_ragged(var, state, rg)
        g = jnp.ones_like(out.values)
        state2 = var.apply_gradients(state, ctx, g, opt, step=0)
        after = var.lookup(state2, jnp.asarray([1, 2], jnp.int64))
        # key 1 appears twice -> grad 2; key 2 once -> grad 1 (SGD lr=1)
        np.testing.assert_allclose(np.asarray(after[0]), 1.0 - 2.0)
        np.testing.assert_allclose(np.asarray(after[1]), 2.0 - 1.0)

    def test_ragged_fill_empty_rows(self):
        rg = de.RaggedIds(
            values=jnp.asarray([7, 8, 9, 0], dtype=jnp.int64),
            row_splits=jnp.asarray([0, 2, 2, 3], dtype=jnp.int32),
        )
        filled, empty_ind = de.ragged_fill_empty_rows(rg, 42)
        np.testing.assert_array_equal(
            np.asarray(empty_ind), [False, True, False])
        splits = np.asarray(filled.row_splits)
        np.testing.assert_array_equal(splits, [0, 2, 3, 4])
        vals = np.asarray(filled.values)
        np.testing.assert_array_equal(vals[:4], [7, 8, 42, 9])

    def test_safe_ragged_end_to_end(self, var_state):
        """safe_embedding_lookup_sparse over ragged with invalid entries
        and an empty row (the reference's ragged safe_ contract)."""
        var, state = var_state
        rg = de.RaggedIds(
            values=jnp.asarray([1, -3, 2, 0], dtype=jnp.int64),
            row_splits=jnp.asarray([0, 2, 2, 3], dtype=jnp.int32),
        )
        out = de.safe_embedding_lookup_sparse(
            var, state, rg, combiner="mean", training=False)
        np.testing.assert_allclose(np.asarray(out[0]), 1.0)  # -3 pruned
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)  # empty row
        np.testing.assert_allclose(np.asarray(out[2]), 2.0)
        out2 = de.safe_embedding_lookup_sparse(
            var, state, rg, combiner="mean", default_id=5, training=False)
        np.testing.assert_allclose(np.asarray(out2[1]), 5.0)


class TestSafe:
    def test_safe_prunes_and_fills(self, var_state):
        var, state = var_state
        ids = jnp.asarray([[1, -5], [E, E]], dtype=jnp.int64)
        out = de.safe_embedding_lookup_sparse(
            var, state, ids, combiner="mean", training=False
        )
        np.testing.assert_allclose(np.asarray(out[0]), 1.0)
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)

    def test_safe_default_id(self, var_state):
        var, state = var_state
        ids = jnp.asarray([[E, E]], dtype=jnp.int64)
        out = de.safe_embedding_lookup_sparse(
            var, state, ids, combiner="mean", default_id=7, training=False
        )
        np.testing.assert_allclose(np.asarray(out[0]), 7.0)

    def test_safe_training_grads(self, var_state):
        var, state = var_state
        ids = jnp.asarray([[1, 2], [3, E]], dtype=jnp.int64)

        def loss(state):
            out, ctx = de.safe_embedding_lookup_sparse(
                var, state, ids, combiner="sum", training=True
            )
            return jnp.sum(out), ctx

        out, ctx = loss(state)
        assert ctx is not None


class TestMath:
    def test_sparse_segment_sum(self):
        data = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
        out = de.math.sparse_segment_sum(
            data,
            jnp.asarray([0, 2]),
            jnp.asarray([0, 0]),
            num_segments=2,
        )
        np.testing.assert_allclose(
            np.asarray(out), [[6.0, 8.0, 10.0], [0, 0, 0]]
        )

    def test_sparse_segment_mean_sqrtn(self):
        data = jnp.ones((4, 2), jnp.float32)
        m = de.math.sparse_segment_mean(
            data, jnp.asarray([0, 1]), jnp.asarray([0, 0]), num_segments=1
        )
        np.testing.assert_allclose(np.asarray(m), 1.0)
        q = de.math.sparse_segment_sqrt_n(
            data, jnp.asarray([0, 1]), jnp.asarray([0, 0]), num_segments=1
        )
        np.testing.assert_allclose(np.asarray(q), 2 / np.sqrt(2))

    def test_fill_empty_rows(self):
        sp = de.SparseIds(
            indices=jnp.asarray([[0, 0], [2, 1]], dtype=jnp.int32),
            values=jnp.asarray([10, 20], dtype=jnp.int64),
            dense_shape=(4, 3),
        )
        filled, is_empty = de.sparse_fill_empty_rows(sp, 99)
        np.testing.assert_array_equal(
            np.asarray(is_empty), [False, True, False, True]
        )
        vals = np.asarray(filled.values)
        rows = np.asarray(filled.indices[:, 0])
        live = vals != de.EMPTY_KEY
        got = sorted(zip(rows[live].tolist(), vals[live].tolist()))
        assert got == [(0, 10), (1, 99), (2, 20), (3, 99)]

    def test_sparse_reshape(self):
        sp = de.SparseIds(
            indices=jnp.asarray([[1, 2]], dtype=jnp.int32),
            values=jnp.asarray([5], dtype=jnp.int64),
            dense_shape=(2, 3),
        )
        r = de.sparse_reshape(sp, (3, 2))
        # linear index 1*3+2=5 -> (2, 1)
        np.testing.assert_array_equal(np.asarray(r.indices[0]), [2, 1])

    def test_dynamic_partition_stitch_roundtrip(self):
        data = jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.ones((1, 2))
        parts_ids = jnp.asarray([0, 1, 0, 2, 1, 0, 2, 2, 1, 0], jnp.int32)
        parts, counts, pos = de.data_flow.dynamic_partition(data, parts_ids, 3)
        np.testing.assert_array_equal(np.asarray(counts), [4, 3, 3])
        back = de.data_flow.dynamic_stitch_flat(parts, pos, 10)
        np.testing.assert_allclose(np.asarray(back), np.asarray(data))
