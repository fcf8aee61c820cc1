"""DCN-v2 (Deep & Cross Network) on dynamic-embedding tables.

A second CTR architecture alongside DLRM (models/dlrm.py): explicit
feature crosses via full-rank cross layers

    x_{l+1} = x_0 * (W_l x_l + b_l) + x_l

stacked with a deep MLP tower (the "stacked" DCN-v2 topology,
Wang et al. 2021). The embedding side is the same TPU-first design as
DLRM — one shared dynamic table for all categorical features, keys
tagged with the feature id, a single fused lookup — so the model is a
drop-in workload for the sharded path too (reference demo-suite role:
demo/dynamic_embedding/* models, SURVEY.md §7 acceptance workloads).

The cross layer is one [B, I] x [I, I] matmul per layer — pure MXU work.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.models.dlrm import (
    batch_auc,
    optax_apply,
    optax_sigmoid_bce,
    synthetic_criteo_batch,
    tag_keys,
)
from recommenders_addons_tpu.nn import mlp
from recommenders_addons_tpu.parallel.sharded import ShardedVariable


@dataclasses.dataclass(frozen=True)
class DCNConfig:
    num_dense: int = 13
    num_sparse: int = 26
    dim: int = 32
    num_cross: int = 3
    deep_sizes: Tuple[int, ...] = (256, 128)
    table_capacity: int = 1 << 22
    value_dtype: Any = jnp.float32
    learning_rate: float = 0.01
    sparse_lr: float = 0.01

    @property
    def input_dim(self) -> int:
        return self.num_dense + self.num_sparse * self.dim


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("table", "dense", "step"),
    meta_fields=(),
)
@dataclasses.dataclass
class DCNState:
    table: Any
    dense: Any
    step: jax.Array


class DCN:
    def __init__(self, cfg: DCNConfig = DCNConfig(), mesh=None,
                 axis: str = "ep"):
        self.cfg = cfg
        self.mesh = mesh
        var = de.Variable(
            name="dcn_embeddings",
            dim=cfg.dim,
            init_capacity=cfg.table_capacity,
            value_dtype=cfg.value_dtype,
            initializer=jax.nn.initializers.uniform(scale=0.05),
            evict_strategy=de.EvictStrategy.LRU,
        )
        if mesh is not None:
            self.params = ShardedVariable(var=var, mesh=mesh, axis=axis)
            self.var = self.params.var
        else:
            self.params = var
            self.var = var
        self.opt = de.Adagrad(cfg.sparse_lr)

    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> DCNState:
        cfg = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        i = cfg.input_dim
        cross = []
        for li in range(cfg.num_cross):
            rW, r1 = jax.random.split(r1)
            cross.append({
                # small init keeps early crosses near-identity
                "w": (jax.random.normal(rW, (i, i), cfg.value_dtype)
                      * (0.5 / np.sqrt(i))),
                "b": jnp.zeros((i,), cfg.value_dtype),
            })
        dense = {
            "cross": cross,
            "deep": mlp.init_mlp(r2, (i,) + cfg.deep_sizes, cfg.value_dtype),
            "head": mlp.init_mlp(
                r3, (i + cfg.deep_sizes[-1], 1), cfg.value_dtype
            ),
        }
        table = self.params.init()
        return DCNState(
            table=table, dense=dense, step=jnp.zeros((), jnp.int32)
        )

    # ------------------------------------------------------------------

    def _forward_dense(self, dense, x_dense, emb):
        """emb: [B, F, D]; returns logits [B]."""
        b = x_dense.shape[0]
        x0 = jnp.concatenate(
            [x_dense, emb.reshape(b, -1)], axis=-1
        )  # [B, I]
        x = x0
        for layer in dense["cross"]:
            xw = (
                jax.lax.dot(x, layer["w"],
                            precision=jax.lax.Precision.DEFAULT)
                + layer["b"]
            )
            x = x0 * xw + x  # DCN-v2 cross
        deep = mlp.apply_mlp(dense["deep"], x0)
        head_in = jnp.concatenate([x, deep], axis=-1)
        return mlp.apply_mlp(dense["head"], head_in)[:, 0]

    def loss_fn(self, dense, emb_flat, x_dense, labels):
        b = x_dense.shape[0]
        emb = emb_flat.reshape(b, self.cfg.num_sparse, self.cfg.dim)
        logits = self._forward_dense(dense, x_dense, emb)
        loss = jnp.mean(
            optax_sigmoid_bce(logits, labels.astype(logits.dtype))
        )
        return loss, logits

    # ------------------------------------------------------------------

    def make_train_step(self, dense_optimizer=None):
        import optax

        cfg = self.cfg
        tx = dense_optimizer or optax.adagrad(cfg.learning_rate)

        def train_step(state: DCNState, opt_state, batch):
            keys = tag_keys(batch["sparse"]).reshape(-1)
            # step at lookup: score scatter doubles as the dup probe
            kw = {"step": state.step + 1} if self.mesh is None else {}
            emb_flat, ctx = self.params.embedding_lookup(
                state.table, keys, **kw)

            def wrapped(dense, emb_flat):
                loss, _ = self.loss_fn(
                    dense, emb_flat, batch["dense"], batch["label"]
                )
                return loss

            loss, (g_dense, g_emb) = jax.value_and_grad(
                wrapped, argnums=(0, 1)
            )(state.dense, emb_flat)
            table = self.params.apply_gradients(
                state.table, ctx, g_emb, self.opt, step=state.step
            )
            updates, opt_state = tx.update(g_dense, opt_state, state.dense)
            dense = optax_apply(state.dense, updates)
            return (
                DCNState(table=table, dense=dense, step=state.step + 1),
                opt_state,
                loss,
            )

        return train_step, tx

    def predict(self, state: DCNState, batch):
        keys = tag_keys(batch["sparse"]).reshape(-1)
        emb_flat = (
            self.params.lookup(state.table, keys)
            if self.mesh is not None
            else self.var.lookup(state.table, keys)
        )
        b = batch["dense"].shape[0]
        emb = emb_flat.reshape(b, self.cfg.num_sparse, self.cfg.dim)
        return self._forward_dense(state.dense, batch["dense"], emb)


def run_demo(steps: int = 100, batch_size: int = 512,
             dim: int = 16, log_every: int = 25):
    """Train a small DCN on the synthetic Criteo generator; returns
    (final train loss, held-out AUC)."""
    import dataclasses as dc

    import optax

    cfg = DCNConfig(dim=dim, table_capacity=1 << 16,
                    deep_sizes=(64, 32), num_cross=2)
    model = DCN(cfg)
    state = model.init(jax.random.PRNGKey(0))
    state = dc.replace(
        state, table=de.create_slots(model.var, state.table, model.opt)
    )
    train_step, tx = model.make_train_step(optax.adagrad(0.05))
    opt_state = tx.init(state.dense)
    step_j = jax.jit(train_step, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    loss = None
    for t in range(steps):
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_criteo_batch(rng, batch_size).items()}
        state, opt_state, loss = step_j(state, opt_state, batch)
        if log_every and t % log_every == 0:
            print(f"step {t}: loss={float(loss):.4f}", flush=True)
    logits, labels = [], []
    for _ in range(4):
        b = synthetic_criteo_batch(rng, batch_size)
        logits.append(np.asarray(model.predict(
            state, {k: jnp.asarray(v) for k, v in b.items()})))
        labels.append(b["label"])
    auc = batch_auc(np.concatenate(logits), np.concatenate(labels))
    return float(loss), auc
