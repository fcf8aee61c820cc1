"""Sequence + dense features model — parity with the reference's
`demo/dynamic_embedding/seq_and_dense` acceptance workload: variable-length
id sequences pooled into fixed-width features next to dense inputs, with
the embedding table mesh-shardable (the reference pairs this demo with
HvdAllToAllEmbedding).

TPU-first: ragged sequences arrive padded to a static max length with the
EMPTY sentinel; pooling is a masked mean (safe_embedding_lookup_sparse
semantics) so padding contributes nothing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.nn import mlp
from recommenders_addons_tpu.parallel.sharded import ShardedVariable


@dataclasses.dataclass(frozen=True)
class SeqAndDenseConfig:
    dim: int = 32
    max_seq_len: int = 20
    num_dense: int = 8
    hidden: Tuple[int, ...] = (64, 32, 1)
    capacity: int = 1 << 16
    lr: float = 0.02


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("table", "dense", "step"),
    meta_fields=(),
)
@dataclasses.dataclass
class SeqAndDenseState:
    table: Any
    dense: Any
    step: jax.Array


class SeqAndDenseModel:
    def __init__(self, cfg: SeqAndDenseConfig = SeqAndDenseConfig(),
                 mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        var = de.Variable(
            name="seq_emb", dim=cfg.dim, init_capacity=cfg.capacity,
            initializer=jax.nn.initializers.normal(0.05),
        )
        self.params = (
            ShardedVariable(var=var, mesh=mesh) if mesh is not None else var
        )
        self.var = getattr(self.params, "var", self.params)
        self.opt = de.Adam(cfg.lr)

    def init(self, rng: jax.Array) -> SeqAndDenseState:
        cfg = self.cfg
        dense = mlp.init_mlp(
            rng, (cfg.dim + cfg.num_dense,) + cfg.hidden
        )
        return SeqAndDenseState(
            table=self.params.init(),
            dense=dense,
            step=jnp.zeros((), jnp.int32),
        )

    def _pool(self, emb, seq):
        """Masked mean over the sequence axis ([B, L, D] -> [B, D])."""
        mask = (seq != self.var.empty_key)[..., None].astype(emb.dtype)
        s = (emb * mask).sum(axis=1)
        n = jnp.maximum(mask.sum(axis=1), 1.0)
        return s / n

    def make_train_step(self):
        def train_step(state: SeqAndDenseState, batch):
            emb, ctx = self.params.embedding_lookup(
                state.table, batch["seq"]
            )

            def loss_fn(dense, emb):
                pooled = self._pool(emb, batch["seq"])
                x = jnp.concatenate([pooled, batch["dense"]], axis=-1)
                pred = mlp.apply_mlp(dense, x)[:, 0]
                return jnp.mean((pred - batch["label"]) ** 2)

            loss, (gd, ge) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                state.dense, emb
            )
            table = self.params.apply_gradients(
                state.table, ctx, ge, self.opt, step=state.step
            )
            dense = jax.tree.map(lambda p, g: p - 0.02 * g, state.dense, gd)
            return (
                SeqAndDenseState(table=table, dense=dense,
                                 step=state.step + 1),
                loss,
            )

        return train_step

    def predict(self, state: SeqAndDenseState, batch):
        emb = self.params.lookup(state.table, batch["seq"])
        pooled = self._pool(emb, batch["seq"])
        x = jnp.concatenate([pooled, batch["dense"]], axis=-1)
        return mlp.apply_mlp(state.dense, x)[:, 0]


def synthetic_seq_batch(rng: np.random.Generator, batch_size: int,
                        max_len: int = 20, vocab: int = 5000,
                        num_dense: int = 8):
    """Variable-length sequences (padded with EMPTY) + dense features; the
    label depends on the mean of per-id latent factors and the dense sum."""
    lens = rng.integers(1, max_len + 1, size=batch_size)
    seq = np.full((batch_size, max_len), int(de.EMPTY_KEY), np.int64)
    factor_sum = np.zeros(batch_size, np.float32)
    for i, L in enumerate(lens):
        ids = rng.integers(1, vocab + 1, size=L)
        seq[i, :L] = ids
        factor_sum[i] = np.sin(ids * 0.37).mean()
    dense = rng.normal(size=(batch_size, num_dense)).astype(np.float32)
    label = 2.0 * factor_sum + 0.5 * dense[:, :2].sum(-1)
    return {"seq": seq, "dense": dense, "label": label.astype(np.float32)}


def run_demo(steps: int = 200, batch_size: int = 256, seed: int = 0,
             mesh=None, log_every: int = 0):
    cfg = SeqAndDenseConfig()
    model = SeqAndDenseModel(cfg, mesh=mesh)
    state = model.init(jax.random.PRNGKey(seed))
    step_fn = jax.jit(model.make_train_step())
    rng = np.random.default_rng(seed)
    loss = None
    for t in range(steps):
        b = synthetic_seq_batch(rng, batch_size, cfg.max_seq_len)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        state, loss = step_fn(state, b)
        if log_every and t % log_every == 0:
            print(f"step {t}: mse={float(loss):.4f}")
    eval_b = synthetic_seq_batch(rng, 1024, cfg.max_seq_len)
    eval_b = {k: jnp.asarray(v) for k, v in eval_b.items()}
    pred = model.predict(state, eval_b)
    eval_mse = float(jnp.mean((pred - eval_b["label"]) ** 2))
    return float(loss), eval_mse
