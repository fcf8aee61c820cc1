"""Embedding layers — parity with the reference's Keras layer set
(python/keras/layers/embedding.py:111-594 and
dynamic_layer_normalization.py).

These are *functional* layers: a layer object is a static spec holding a
``de.Variable`` (or ``ShardedVariable``); table storage is an explicit state
pytree returned by ``init_state()`` and threaded through calls — idiomatic
JAX instead of Keras' implicit variable tracking. Flax users can wrap these
in a module trivially (state in a mutable collection); see models/ for
end-to-end usage.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable
from recommenders_addons_tpu.ops.variable import Variable
from recommenders_addons_tpu.parallel.sharded import ShardedVariable


class Embedding:
    """Dynamic-embedding layer (reference ``de.keras.layers.Embedding`` /
    ``BasicEmbedding``, keras/layers/embedding.py:111-294).

    ``call`` = deduplicated trainable lookup; missing ids materialize their
    deterministic init row and are inserted on the optimizer writeback.
    """

    def __init__(
        self,
        embedding_size: int,
        key_dtype=jnp.int64,
        value_dtype=jnp.float32,
        combiner: str = "sum",
        initializer=None,
        name: str = "DynamicEmbeddingLayer",
        init_capacity: int = 1024 * 1024,
        evict_strategy=None,
        bp_v2: bool = False,
        mesh=None,
        mesh_axis: str = "ep",
        capacity_factor: float = 2.0,
        **kwargs,
    ):
        from recommenders_addons_tpu.ops.variable import EvictStrategy

        self.embedding_size = embedding_size
        self.combiner = combiner
        self.name = name
        var = Variable(
            name=name,
            key_dtype=key_dtype,
            value_dtype=value_dtype,
            dim=embedding_size,
            init_capacity=init_capacity,
            initializer=initializer,
            bp_v2=bp_v2,
            evict_strategy=evict_strategy or EvictStrategy.LRU,
        )
        if mesh is not None:
            self.params = ShardedVariable(
                var=var,
                mesh=mesh,
                axis=mesh_axis,
                capacity_factor=capacity_factor,
            )
            self.var = self.params.var
        else:
            self.params = var
            self.var = var

    @property
    def dim(self) -> int:
        return self.embedding_size

    def get_config(self) -> dict:
        """Serialization parity (reference keras/layers/embedding.py:296-339).
        Mesh objects are not serialized (rebind at restore)."""
        var = self.var
        return {
            "embedding_size": self.embedding_size,
            "combiner": self.combiner,
            "name": self.name,
            "key_dtype": str(np.dtype(var.key_dtype).name),
            "value_dtype": str(np.dtype(var.value_dtype).name),
            "init_capacity": var.init_capacity,
            "bp_v2": var.bp_v2,
            "evict_strategy": var.evict_strategy.name,
        }

    @classmethod
    def from_config(cls, config: dict, mesh=None):
        from recommenders_addons_tpu.ops.variable import EvictStrategy

        cfg = dict(config)
        cfg["evict_strategy"] = EvictStrategy[cfg["evict_strategy"]]
        cfg["key_dtype"] = jnp.dtype(cfg["key_dtype"])
        cfg["value_dtype"] = jnp.dtype(cfg["value_dtype"])
        return cls(mesh=mesh, **cfg)

    def init_state(self) -> hashtable.TableState:
        return self.params.init()

    def __call__(self, state, ids, training: bool = True):
        from recommenders_addons_tpu.ops import sparse as sparse_ops

        if isinstance(ids, sparse_ops.RaggedIds):
            # ragged-in/ragged-out, keeping row_splits (the reference
            # Embedding accepts RaggedTensors through
            # shadow_ops.embedding_lookup_unique,
            # shadow_embedding_ops.py:284-328)
            var = self.var
            out = sparse_ops.embedding_lookup_ragged(
                var, state, ids, training=training,
                sharded=self.params if self.params is not var else None,
            )
            return out
        if training:
            emb, ctx = self.params.embedding_lookup(state, ids)
            return emb, ctx
        return self.params.lookup(state, ids)

    def apply_gradients(self, state, ctx, grads, optimizer, step=0, epoch=0):
        return self.params.apply_gradients(
            state, ctx, grads, optimizer, step=step, epoch=epoch
        )


BasicEmbedding = Embedding  # reference alias (embedding.py:111)


class SquashedEmbedding(Embedding):
    """Pools the hot axis: [batch, L] ids -> [batch, dim] via combiner
    (reference keras/layers/embedding.py:348-369)."""

    def __call__(self, state, ids, training: bool = True):
        out = super().__call__(state, ids, training)
        emb, ctx = out if training else (out, None)
        valid = (ids != self.var.empty_key)[..., None].astype(emb.dtype)
        emb = emb * valid
        if self.combiner == "mean":
            denom = jnp.maximum(valid.sum(axis=-2), 1.0)
            pooled = emb.sum(axis=-2) / denom
        else:  # sum
            pooled = emb.sum(axis=-2)
        return (pooled, ctx) if training else pooled


class FieldWiseEmbedding(Embedding):
    """Pools ids into ``nslots`` buckets by ``slot_map_fn`` ->
    [batch, nslots, dim] (reference keras/layers/embedding.py:372-542)."""

    def __init__(self, embedding_size, nslots: int,
                 slot_map_fn: Callable, **kwargs):
        super().__init__(embedding_size, **kwargs)
        self.nslots = nslots
        self.slot_map_fn = slot_map_fn

    def __call__(self, state, ids, training: bool = True):
        from recommenders_addons_tpu.ops import sparse as sparse_ops

        if isinstance(ids, sparse_ops.RaggedIds):
            # ragged input (the reference layer accepts RaggedTensors,
            # keras/layers/embedding.py:372-542): pool each value into its
            # (row, slot) bucket by segment-sum over row*nslots+slot
            b = ids.nrows
            out = Embedding.__call__(self, state, ids, training)
            rv, ctx = out if training else (out, None)
            emb = rv.values  # [NNZ, D]
            vals = ids.values
            valid = ids.valid_mask() & (vals != self.var.empty_key)
            slots = self.slot_map_fn(vals).astype(jnp.int32)  # [NNZ]
            seg = ids.row_ids() * np.int32(self.nslots) + slots
            seg = jnp.where(valid, seg, b * self.nslots)  # park invalid
            emb = emb * valid[:, None].astype(emb.dtype)
            pooled = jax.ops.segment_sum(
                emb, seg, num_segments=b * self.nslots + 1
            )[:-1].reshape(b, self.nslots, self.embedding_size)
            return (pooled, ctx) if training else pooled
        assert ids.ndim == 2, (
            "FieldWiseEmbedding expects [batch, n_ids] or RaggedIds")
        b, l = ids.shape
        out = Embedding.__call__(self, state, ids, training)
        emb, ctx = out if training else (out, None)
        slots = self.slot_map_fn(ids).astype(jnp.int32)  # [b, l]
        valid = (ids != self.var.empty_key)[..., None].astype(emb.dtype)
        emb = emb * valid
        row = jnp.repeat(jnp.arange(b, dtype=jnp.int32), l)
        seg = row * np.int32(self.nslots) + slots.reshape(-1)
        pooled = jax.ops.segment_sum(
            emb.reshape(b * l, -1), seg, num_segments=b * self.nslots
        ).reshape(b, self.nslots, self.embedding_size)
        return (pooled, ctx) if training else pooled


class AllToAllEmbedding(Embedding):
    """Mesh-sharded embedding layer — the reference's
    ``HvdAllToAllEmbedding`` (keras/layers/embedding.py:545-594) with the
    Horovod process group replaced by a mesh axis (``mesh`` is required)."""

    def __init__(self, embedding_size, mesh=None, **kwargs):
        if mesh is None:
            raise ValueError("AllToAllEmbedding requires a mesh")
        super().__init__(embedding_size, mesh=mesh, **kwargs)


HvdAllToAllEmbedding = AllToAllEmbedding  # reference name


class LayerNormalization:
    """Shape-tolerant LayerNorm (reference
    keras/layers/dynamic_layer_normalization.py:8-100). Functional params."""

    def __init__(self, axis: int = -1, epsilon: float = 1e-3):
        self.axis = axis
        self.epsilon = epsilon

    def init_params(self, dim: int, dtype=jnp.float32):
        return {
            "gamma": jnp.ones((dim,), dtype),
            "beta": jnp.zeros((dim,), dtype),
        }

    def __call__(self, params, x):
        mean = jnp.mean(x, axis=self.axis, keepdims=True)
        var = jnp.var(x, axis=self.axis, keepdims=True)
        norm = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return norm * params["gamma"] + params["beta"]
