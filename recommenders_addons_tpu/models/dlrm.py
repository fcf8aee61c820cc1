"""DLRM (Criteo CTR) on dynamic-embedding tables — the flagship workload.

Mirrors the reference's acceptance config "Criteo DLRM: 26 dynamic tables,
row-sharded, all-to-all dedup lookup" (BASELINE.json configs; SURVEY.md §7
step 9). TPU-first choices:

  * ONE shared dynamic table for all 26 categorical features, keys tagged
    with the feature id in the top byte — a single fused all-to-all lookup
    instead of 26 (the reference pays 26 dynamic_partition/stitch rounds).
  * Bottom/top MLPs are plain matmul stacks (MXU) with fp32 accumulation.
  * Dense params train data-parallel (XLA psum under jit); sparse rows train
    owner-local after the all-to-all — the reference's "half-sync" Horovod
    scheme (dynamic_embedding_optimizer.py:523-689) with the race removed.
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
class DLRMConfig:
    num_dense: int = 13
    num_sparse: int = 26
    dim: int = 64
    bottom_sizes: Tuple[int, ...] = (512, 256, 64)
    top_sizes: Tuple[int, ...] = (512, 256, 1)
    table_capacity: int = 1 << 22
    value_dtype: Any = jnp.float32
    learning_rate: float = 0.01
    sparse_lr: float = 0.01

    @property
    def interact_dim(self) -> int:
        n = self.num_sparse + 1
        return n * (n - 1) // 2

    @property
    def bottom_out_sizes(self) -> Tuple[int, ...]:
        """Bottom MLP sizes with the output forced to ``dim`` (the DLRM
        interaction requires the dense feature vector to match the
        embedding width)."""
        return tuple(self.bottom_sizes[:-1]) + (self.dim,)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("table", "dense", "step"),
    meta_fields=(),
)
@dataclasses.dataclass
class DLRMState:
    table: Any
    dense: Any
    step: jax.Array


FEATURE_SHIFT = np.int64(56)
KEY_MASK = np.int64((1 << 56) - 1)


def tag_keys(ids: jax.Array) -> jax.Array:
    """[B, F] raw ids -> feature-tagged global keys (top byte = feature)."""
    f = jnp.arange(ids.shape[-1], dtype=jnp.int64)
    return (ids.astype(jnp.int64) & KEY_MASK) | (f << FEATURE_SHIFT)


class DLRM:
    def __init__(self, cfg: DLRMConfig = DLRMConfig(), mesh=None,
                 axis: str = "ep"):
        self.cfg = cfg
        self.mesh = mesh
        var = de.Variable(
            name="dlrm_embeddings",
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

    def init(self, rng: jax.Array) -> DLRMState:
        cfg = self.cfg
        r1, r2 = jax.random.split(rng)
        dense = {
            "bottom": mlp.init_mlp(
                r1, (cfg.num_dense,) + cfg.bottom_out_sizes, cfg.value_dtype
            ),
            "top": mlp.init_mlp(
                r2,
                (cfg.dim + cfg.interact_dim,) + cfg.top_sizes,
                cfg.value_dtype,
            ),
        }
        table = self.params.init()
        return DLRMState(
            table=table, dense=dense, step=jnp.zeros((), jnp.int32)
        )

    # ------------------------------------------------------------------

    def _forward_dense(self, dense, x_dense, emb):
        """emb: [B, F, D]; returns logits [B]."""
        cfg = self.cfg
        bottom = mlp.apply_mlp(dense["bottom"], x_dense)  # [B, D]
        z = jnp.concatenate([bottom[:, None, :], emb], axis=1)  # [B, F+1, D]
        inter = jnp.einsum(
            "bfd,bgd->bfg", z, z, preferred_element_type=jnp.float32
        ).astype(z.dtype)
        n = cfg.num_sparse + 1
        iu, ju = np.triu_indices(n, k=1)
        flat = inter[:, iu, ju]  # [B, n(n-1)/2]
        top_in = jnp.concatenate([bottom, flat], axis=-1)
        logits = mlp.apply_mlp(dense["top"], top_in)[:, 0]
        return logits

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

        def train_step(state: DLRMState, opt_state, batch):
            keys = tag_keys(batch["sparse"]).reshape(-1)
            # step at lookup (both paths): the LRU score scatter doubles
            # as the dup probe (Variable.embedding_lookup; the sharded
            # path forwards it to each owner shard's plan_lookup_train)
            emb_flat, ctx = self.params.embedding_lookup(
                state.table, keys, step=state.step + 1)

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
                DLRMState(table=table, dense=dense, step=state.step + 1),
                opt_state,
                loss,
            )

        return train_step, tx

    def predict(self, state: DLRMState, batch):
        keys = tag_keys(batch["sparse"]).reshape(-1)
        emb_flat = (
            self.params.lookup(state.table, keys)
            if self.mesh is not None
            else self.var.lookup(state.table, keys)
        )
        b = batch["dense"].shape[0]
        emb = emb_flat.reshape(b, self.cfg.num_sparse, self.cfg.dim)
        return self._forward_dense(state.dense, batch["dense"], emb)


def optax_sigmoid_bce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def optax_apply(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


def batch_auc(logits: np.ndarray, labels: np.ndarray) -> float:
    """Mann-Whitney AUC on a batch (host-side metric)."""
    order = np.argsort(logits)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(logits) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float(
        (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    )


def synthetic_criteo_batch(rng: np.random.Generator, batch_size: int,
                           num_dense=13, num_sparse=26,
                           vocab_per_feature=100_000):
    """Synthetic Criteo-like batch with a learnable signal: the label
    depends on a linear function of the dense features and a few 'lucky'
    categorical ids (zero-egress substitute for the Kaggle dataset)."""
    dense = rng.normal(size=(batch_size, num_dense)).astype(np.float32)
    # zipfian-ish ids
    ids = (
        rng.zipf(1.2, size=(batch_size, num_sparse)) % vocab_per_feature
    ).astype(np.int64)
    signal = dense[:, :3].sum(-1) * 0.5 + ((ids[:, :4] % 7) == 0).sum(-1) - 1.0
    prob = 1.0 / (1.0 + np.exp(-signal))
    label = (rng.random(batch_size) < prob).astype(np.float32)
    return {
        "dense": dense,
        "sparse": ids,
        "label": label,
    }
