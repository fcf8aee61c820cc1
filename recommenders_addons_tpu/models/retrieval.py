"""Two-tower retrieval on dynamic-embedding tables.

The reference's retrieval acceptance workload (demo suite: MovieLens
two-tower, SURVEY.md §7 step 4; TFRS-style retrieval with tfra dynamic
embeddings). TPU-first: in-batch sampled softmax (the standard retrieval
loss) is one [B, B] matmul on the MXU; both towers' id embeddings live in
dynamic tables so unseen users/items join the vocabulary on first touch.
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
class TwoTowerConfig:
    dim: int = 64
    # () = pure matrix factorization (dot product of id embeddings) — the
    # robust default for from-scratch vocabularies; deep towers help only
    # with content features and need regularization against batch
    # memorization (they overfit each in-batch softmax step otherwise)
    tower_sizes: Tuple[int, ...] = ()
    user_capacity: int = 1 << 17
    item_capacity: int = 1 << 15
    lr: float = 0.05
    temperature: float = 0.2


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("user", "item", "dense", "step"),
    meta_fields=(),
)
@dataclasses.dataclass
class TwoTowerState:
    user: Any
    item: Any
    dense: Any
    step: jax.Array


class TwoTowerModel:
    """User tower x item tower -> dot-product scores; in-batch softmax."""

    def __init__(self, cfg: TwoTowerConfig = TwoTowerConfig(), mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        init = jax.nn.initializers.normal(0.05)

        def make(name, cap):
            var = de.Variable(
                name=name, dim=cfg.dim, init_capacity=cap, initializer=init
            )
            if mesh is not None:
                return ShardedVariable(var=var, mesh=mesh)
            return var

        self.user = make("tt_user", cfg.user_capacity)
        self.item = make("tt_item", cfg.item_capacity)
        self.opt = de.Adagrad(cfg.lr)

    def init(self, rng: jax.Array) -> TwoTowerState:
        cfg = self.cfg
        r1, r2 = jax.random.split(rng)
        dense = {
            "user": mlp.init_mlp(r1, (cfg.dim,) + cfg.tower_sizes),
            "item": mlp.init_mlp(r2, (cfg.dim,) + cfg.tower_sizes),
        }
        return TwoTowerState(
            user=self.user.init(),
            item=self.item.init(),
            dense=dense,
            step=jnp.zeros((), jnp.int32),
        )

    def _towers(self, dense, u_emb, i_emb):
        u = mlp.apply_mlp(dense["user"], u_emb)
        v = mlp.apply_mlp(dense["item"], i_emb)
        u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-9)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)
        return u, v

    def make_train_step(self):
        cfg = self.cfg

        def train_step(state: TwoTowerState, batch):
            u_emb, u_ctx = self.user.embedding_lookup(
                state.user, batch["user"]
            )
            i_emb, i_ctx = self.item.embedding_lookup(
                state.item, batch["item"]
            )

            def loss_fn(dense, u_emb, i_emb):
                u, v = self._towers(dense, u_emb, i_emb)
                # in-batch sampled softmax: positives on the diagonal
                logits = (
                    jnp.dot(u, v.T, preferred_element_type=jnp.float32)
                    / cfg.temperature
                )
                labels = jnp.arange(logits.shape[0])
                logp = jax.nn.log_softmax(logits, axis=-1)
                return -jnp.mean(logp[labels, labels])

            loss, (gd, gu, gi) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2)
            )(state.dense, u_emb, i_emb)
            user = self.user.apply_gradients(
                state.user, u_ctx, gu, self.opt, step=state.step
            )
            item = self.item.apply_gradients(
                state.item, i_ctx, gi, self.opt, step=state.step
            )
            dense = jax.tree.map(lambda p, g: p - 0.05 * g, state.dense, gd)
            return (
                TwoTowerState(user=user, item=item, dense=dense,
                              step=state.step + 1),
                loss,
            )

        return train_step

    def score(self, state: TwoTowerState, user_ids, item_ids):
        """Dot-product scores for (user, item) pairs."""
        u_emb = self.user.lookup(state.user, user_ids)
        i_emb = self.item.lookup(state.item, item_ids)
        u, v = self._towers(state.dense, u_emb, i_emb)
        return jnp.sum(u * v, axis=-1)

    def retrieve(self, state: TwoTowerState, user_ids, candidate_ids,
                 k: int = 10):
        """Top-k candidates per user (brute-force over the candidate set —
        the reference demos do the same; ANN indexing is out of scope)."""
        u_emb = self.user.lookup(state.user, user_ids)
        c_emb = self.item.lookup(state.item, candidate_ids)
        u, v = self._towers(state.dense, u_emb, c_emb)
        scores = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
        top = jax.lax.top_k(scores, k)[1]
        return candidate_ids[top]


def synthetic_interactions(rng: np.random.Generator, batch_size: int,
                           num_users: int = 5000, num_items: int = 2000,
                           num_groups: int = 8):
    """Clustered user-item interactions: users and items belong to latent
    groups; a user interacts mostly within their group (learnable signal)."""
    users = rng.integers(1, num_users + 1, size=batch_size).astype(np.int64)
    ugroup = users % num_groups
    in_group = rng.random(batch_size) < 0.9
    items = np.where(
        in_group,
        ugroup + num_groups * rng.integers(
            0, num_items // num_groups, size=batch_size
        ),
        rng.integers(0, num_items, size=batch_size),
    ).astype(np.int64) + 1
    return {"user": users, "item": items}


def run_demo(steps: int = 300, batch_size: int = 256, seed: int = 0,
             mesh=None, log_every: int = 0,
             num_users: int = 500, num_items: int = 512):
    """Train and report top-10 recall@group (items sharing the user's
    group should dominate retrievals)."""
    model = TwoTowerModel(mesh=mesh)
    state = model.init(jax.random.PRNGKey(seed))
    step_fn = jax.jit(model.make_train_step())
    rng = np.random.default_rng(seed)
    loss = None
    for t in range(steps):
        batch = synthetic_interactions(
            rng, batch_size, num_users=num_users, num_items=num_items
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = step_fn(state, batch)
        if log_every and t % log_every == 0:
            print(f"step {t}: loss={float(loss):.4f}")
    # eval: for 64 users, retrieve top-10 from the candidate set
    users = jnp.asarray(
        rng.integers(1, num_users + 1, size=64).astype(np.int64)
    )
    cands = jnp.asarray(
        np.arange(1, min(num_items, 512) + 1, dtype=np.int64)
    )
    top = model.retrieve(state, users, cands, k=10)
    ug = (np.asarray(users) % 8)[:, None]
    ig = (np.asarray(top) - 1) % 8
    recall = float((ig == ug).mean())
    return float(loss), recall
