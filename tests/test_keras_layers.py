"""Keras-parity layer tests (reference keras/layers/embedding_test.py
contracts: forward shape, pooling semantics, trainability, serialization
namespace)."""

import numpy as np
import jax
import jax.numpy as jnp

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.keras import layers as kl


def test_embedding_layer_forward_backward():
    layer = kl.Embedding(8, name="kl_basic", init_capacity=1 << 10,
                         initializer=jax.nn.initializers.constant(0.1))
    state = layer.init_state()
    ids = jnp.array([[1, 2], [3, 1]], dtype=jnp.int64)
    emb, ctx = layer(state, ids, training=True)
    assert emb.shape == (2, 2, 8)
    np.testing.assert_allclose(np.asarray(emb), 0.1)
    state = layer.apply_gradients(state, ctx, jnp.ones_like(emb),
                                  de.SGD(0.1), step=0)
    out = layer(state, ids, training=False)
    # id 1 appears twice -> grad 2 -> 0.1 - 0.2 = -0.1
    np.testing.assert_allclose(np.asarray(out[0, 0]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1]), 0.0, atol=1e-7)


def test_basic_embedding_alias():
    assert kl.BasicEmbedding is kl.Embedding


def test_embedding_layer_ragged_input():
    """The layer accepts RaggedIds and returns ragged output with the
    same row_splits (reference Embedding over RaggedTensor via
    shadow_ops, shadow_embedding_ops.py:284-328)."""
    layer = kl.Embedding(4, name="kl_ragged", init_capacity=1 << 9,
                         initializer=jax.nn.initializers.constant(0.5))
    state = layer.init_state()
    rg = de.RaggedIds(
        values=jnp.asarray([1, 2, 3, 0], dtype=jnp.int64),
        row_splits=jnp.asarray([0, 2, 3, 3], dtype=jnp.int32),
    )
    out, ctx = layer(state, rg, training=True)
    assert isinstance(out, de.RaggedValues)
    np.testing.assert_allclose(np.asarray(out.values[:3]), 0.5)
    state = layer.apply_gradients(state, ctx, jnp.ones_like(out.values),
                                  de.SGD(0.1), step=0)
    after = layer(state, rg, training=False)
    np.testing.assert_allclose(np.asarray(after.values[0]), 0.4,
                               rtol=1e-6)


def test_squashed_embedding_pools():
    layer = kl.SquashedEmbedding(4, combiner="mean", name="kl_squash",
                                 initializer=jax.nn.initializers.constant(1.0))
    state = layer.init_state()
    ids = jnp.array(
        [[1, 2, int(de.EMPTY_KEY)], [3, int(de.EMPTY_KEY), int(de.EMPTY_KEY)]],
        dtype=jnp.int64,
    )
    pooled, _ = layer(state, ids, training=True)
    assert pooled.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(pooled), 1.0, rtol=1e-6)


def test_fieldwise_embedding():
    nslots = 3
    layer = kl.FieldWiseEmbedding(
        4, nslots, slot_map_fn=lambda ids: ids % nslots,
        name="kl_field", initializer=jax.nn.initializers.constant(1.0),
    )
    state = layer.init_state()
    ids = jnp.array([[3, 6, 4]], dtype=jnp.int64)  # slots 0,0,1
    pooled, _ = layer(state, ids, training=True)
    assert pooled.shape == (1, nslots, 4)
    np.testing.assert_allclose(np.asarray(pooled[0, 0]), 2.0)  # two ids
    np.testing.assert_allclose(np.asarray(pooled[0, 1]), 1.0)
    np.testing.assert_allclose(np.asarray(pooled[0, 2]), 0.0)


def test_layer_normalization():
    ln = kl.LayerNormalization()
    params = ln.init_params(8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)) * 3 + 5,
                    jnp.float32)
    y = ln(params, x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-2)


def test_alltoall_embedding_on_mesh():
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    layer = kl.AllToAllEmbedding(4, mesh=mesh, name="kl_a2a",
                                 init_capacity=1 << 10,
                                 initializer=jax.nn.initializers.constant(0.5))
    state = layer.init_state()
    ids = jnp.arange(1, 17, dtype=jnp.int64)
    emb, ctx = layer(state, ids, training=True)
    assert emb.shape == (16, 4)
    np.testing.assert_allclose(np.asarray(emb), 0.5)
    state = layer.apply_gradients(state, ctx, jnp.ones_like(emb),
                                  de.SGD(0.1), step=0)
    out = layer(state, ids, training=False)
    np.testing.assert_allclose(np.asarray(out), 0.4, rtol=1e-6)


def test_callbacks_and_models(tmp_path):
    from recommenders_addons_tpu.keras.callbacks import DEHvdModelCheckpoint
    from recommenders_addons_tpu.keras.models import de_load_model, de_save_model

    var = de.Variable(name="kl_ckpt", dim=2, init_capacity=1 << 8)
    state = var.upsert(var.init(), jnp.arange(1, 11, dtype=jnp.int64),
                       jnp.full((10, 2), 4.0))
    dense = {"w": jnp.ones((3,))}
    # periodic checkpoint callback
    cb = DEHvdModelCheckpoint(str(tmp_path / "cb"), save_freq=2, table=var)
    cb.on_step_end(2, {"table": state})
    from recommenders_addons_tpu.train import latest_checkpoint
    assert latest_checkpoint(str(tmp_path / "cb")) == 2
    # de_save_model / de_load_model
    d = de_save_model(str(tmp_path / "m"), {"table": state, "dense": dense},
                      table=var, dense=None)
    fresh = {"table": var.init(), "dense": {"w": jnp.zeros((3,))}}
    restored = de_load_model(d, fresh, table=var, dense=None)
    got = var.lookup(restored["table"], jnp.arange(1, 11, dtype=jnp.int64))
    np.testing.assert_allclose(np.asarray(got), 4.0)
    np.testing.assert_allclose(np.asarray(restored["dense"]["w"]), 1.0)


def test_seq_and_dense_model_learns():
    from recommenders_addons_tpu.models.seq_and_dense import run_demo

    _, eval_mse = run_demo(steps=150, batch_size=256)
    assert eval_mse < 0.5, eval_mse  # label variance is ~1.3


def test_broadcast_callback_filters_de_state():
    """The broadcast callback accepts the MIXED training-state pytree and
    excludes DE TableStates automatically plus user-registered local vars
    by key path (reference callbacks.py:38-106 filter_lambda)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from recommenders_addons_tpu import dynamic_embedding as de
    from recommenders_addons_tpu.keras.callbacks import (
        DEHvdBroadcastGlobalVariablesCallback,
    )

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    var = de.Variable(name="bcast_t", dim=4, init_capacity=256)
    table = var.init()
    state = {
        "dense": {"w": jnp.ones((8, 4)), "b": jnp.zeros((4,))},
        "table": table,
        "worker_stats": jnp.arange(3.0),
    }
    cb = DEHvdBroadcastGlobalVariablesCallback(
        local_variables="['worker_stats']")
    out = cb(state, mesh)
    assert cb.broadcast_done
    # dense leaves got the replicated sharding
    sh = out["dense"]["w"].sharding
    assert sh.is_fully_replicated
    # the table subtree is untouched (same object - no device_put)
    assert out["table"] is table
    # registered local var untouched
    assert out["worker_stats"] is state["worker_stats"]
    np.testing.assert_array_equal(np.asarray(out["dense"]["w"]),
                                  np.ones((8, 4)))
