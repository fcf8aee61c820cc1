"""`de.shadow_ops` — eager-trainability parity layer
(reference python/ops/shadow_embedding_ops.py:61-457).

The reference needs ShadowVariable/TrainableWrapper because TF's autodiff
only differentiates through `tf.Variable` reads; it therefore re-looks-up
rows into a buffer variable on every read and writes them back after the
optimizer step. JAX differentiates through the lookup directly, so the
"shadow" here is just a thin stateful wrapper over
``Variable.embedding_lookup`` that remembers the last LookupContext — the
exact information the reference's ids/exists buffers carry
(shadow_embedding_ops.py:114-163).

Functional code should use ``var.embedding_lookup`` directly; this module
exists so reference call sites translate 1:1::

    shadow = de.shadow_ops.ShadowVariable(var)
    emb = de.shadow_ops.embedding_lookup(shadow, state, ids)
    ...
    state = shadow.apply_gradients(state, grads, optimizer, step)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from recommenders_addons_tpu.ops.variable import (
    LookupContext,
    ModelMode,
    Variable,
    get_model_mode,
)


class ShadowVariable:
    """Trainable-lookup handle for one ``de.Variable``
    (reference ShadowVariable, shadow_embedding_ops.py:61-236).

    Holds the variable + the residuals (ids/exists equivalents) of the most
    recent lookup. Not thread-safe across concurrent steps — mirror of the
    reference's per-replica shadow requirement
    (keras/layers/embedding.py:226-273); create one per in-flight step.
    """

    def __init__(self, params, name: Optional[str] = None,
                 max_norm=None, trainable: bool = True, **_compat):
        self.params = params
        self.name = name or f"shadow_{getattr(params, 'name', 'de')}"
        self.max_norm = max_norm
        self.trainable = trainable
        self.ctx: Optional[LookupContext] = None

    @property
    def var(self) -> Variable:
        return getattr(self.params, "var", self.params)

    def lookup(self, state, ids, training: Optional[bool] = None):
        if training is None:
            training = get_model_mode() == ModelMode.TRAIN
        if not training:
            return self.params.lookup(state, ids)
        emb, ctx = self.params.embedding_lookup(state, ids)
        self.ctx = ctx
        if self.max_norm is not None:
            norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
            emb = emb * jnp.minimum(1.0, self.max_norm / (norm + 1e-12))
        return emb

    def apply_gradients(self, state, grads, optimizer, step=0, epoch=0):
        if self.ctx is None:
            raise ValueError("no lookup recorded; call lookup() first")
        return self.params.apply_gradients(
            state, self.ctx, grads, optimizer, step=step, epoch=epoch
        )


def embedding_lookup(shadow: ShadowVariable, state, ids, training=None):
    """Reference shadow_ops.embedding_lookup
    (shadow_embedding_ops.py:239-281): trainable lookup in TRAIN mode,
    plain probe in INFERENCE mode."""
    return shadow.lookup(state, ids, training=training)


def embedding_lookup_unique(shadow: ShadowVariable, state, ids,
                            training=None):
    """Reference shadow_ops.embedding_lookup_unique
    (shadow_embedding_ops.py:284-356). Dedup is built into the TPU lookup
    path, so this is the same op."""
    return shadow.lookup(state, ids, training=training)


# --------------------------------------------------------------------------
# TF-variable-machinery parity names (reference embedding_weights.py,
# distributed_embedding_variable.py). In the functional design these are
# honest aliases: there is no resource-variable buffer to wrap.
# --------------------------------------------------------------------------

TrainableWrapper = ShadowVariable
DEResourceVariable = ShadowVariable
HvdVariable = ShadowVariable  # all-to-all routing lives in ShardedVariable
DistributedVariableWrapper = ShadowVariable


class EmbeddingWeights:
    """ABC parity (reference embedding_weights.py:50-95)."""

    @staticmethod
    def verify_embedding_weights(weights, ids=None):
        if not isinstance(weights, (ShadowVariable, Variable)) and not (
            hasattr(weights, "embedding_lookup")
        ):
            raise TypeError(f"not an embedding weight: {type(weights)}")

    def embedding_lookup(self, *a, **k):
        raise NotImplementedError


def trainable_wrapper_filter(variables):
    """Split a variable list into (dynamic-embedding handles, dense others)
    (reference dynamic_embedding_ops.py:462-475) — used to apply allreduce
    to dense grads only (half-sync training)."""
    sparse, dense = [], []
    for v in variables:
        if isinstance(v, (ShadowVariable, Variable)) or hasattr(
            v, "embedding_lookup"
        ):
            sparse.append(v)
        else:
            dense.append(v)
    return sparse, dense
