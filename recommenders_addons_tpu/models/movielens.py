"""MovieLens rating model — the reference's minimal end-to-end slice
(demo/dynamic_embedding/movielens-1m-keras/movielens-1m-keras.py; SURVEY.md
§7 step 4): two dynamic embeddings (user, movie) + a dense MLP regressor.

Also hosts the multi-hot variant (genres via safe_embedding_lookup_sparse,
the reference's "MovieLens-1M + multi-hot genre features" acceptance
config).
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
class MovieLensConfig:
    dim: int = 32
    hidden: Tuple[int, ...] = (64, 16, 1)
    user_capacity: int = 1 << 16
    movie_capacity: int = 1 << 14
    genre_capacity: int = 1 << 8
    multi_hot_genres: bool = False
    max_genres: int = 4
    lr: float = 0.05


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("user", "movie", "genre", "dense", "step"),
    meta_fields=(),
)
@dataclasses.dataclass
class MovieLensState:
    user: Any
    movie: Any
    genre: Any
    dense: Any
    step: jax.Array


class MovieLensModel:
    def __init__(self, cfg: MovieLensConfig = MovieLensConfig(), mesh=None):
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

        self.user = make("ml_user", cfg.user_capacity)
        self.movie = make("ml_movie", cfg.movie_capacity)
        self.genre = (
            make("ml_genre", cfg.genre_capacity)
            if cfg.multi_hot_genres
            else None
        )
        self.opt = de.Adam(cfg.lr)

    def init(self, rng: jax.Array) -> MovieLensState:
        cfg = self.cfg
        n_emb = 3 if cfg.multi_hot_genres else 2
        dense = mlp.init_mlp(rng, (cfg.dim * n_emb,) + cfg.hidden)
        return MovieLensState(
            user=self.user.init(),
            movie=self.movie.init(),
            genre=self.genre.init() if self.genre else (),
            dense=dense,
            step=jnp.zeros((), jnp.int32),
        )

    def _var_of(self, layer):
        return layer.var if isinstance(layer, ShardedVariable) else layer

    def make_train_step(self):
        cfg = self.cfg

        def train_step(state: MovieLensState, batch):
            u_emb, u_ctx = self.user.embedding_lookup(
                state.user, batch["user"]
            )
            m_emb, m_ctx = self.movie.embedding_lookup(
                state.movie, batch["movie"]
            )
            if cfg.multi_hot_genres:
                g_emb, g_ctx = de.safe_embedding_lookup_sparse(
                    self._var_of(self.genre),
                    state.genre,
                    batch["genres"],
                    combiner="mean",
                    training=True,
                    sharded=self.genre if self.mesh is not None else None,
                )

            def loss_fn(dense, u, m, *g):
                feats = [u, m] + ([g[0]] if g else [])
                x = jnp.concatenate(feats, axis=-1)
                pred = mlp.apply_mlp(dense, x)[:, 0]
                return jnp.mean((pred - batch["rating"]) ** 2)

            if cfg.multi_hot_genres:
                loss, (gd, gu, gm, gg) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2, 3)
                )(state.dense, u_emb, m_emb, g_emb)
            else:
                loss, (gd, gu, gm) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2)
                )(state.dense, u_emb, m_emb)

            user = self.user.apply_gradients(
                state.user, u_ctx, gu, self.opt, step=state.step
            )
            movie = self.movie.apply_gradients(
                state.movie, m_ctx, gm, self.opt, step=state.step
            )
            genre = state.genre
            if cfg.multi_hot_genres:
                genre = de.apply_sparse_gradients(
                    self.genre, state.genre, g_ctx, gg, self.opt,
                    step=state.step,
                )
            dense = jax.tree.map(
                lambda p, g: p - 0.01 * g, state.dense, gd
            )
            return (
                MovieLensState(
                    user=user,
                    movie=movie,
                    genre=genre,
                    dense=dense,
                    step=state.step + 1,
                ),
                loss,
            )

        return train_step

    def predict(self, state: MovieLensState, batch):
        u = (
            self.user.lookup(state.user, batch["user"])
            if self.mesh is not None
            else self.user.lookup(state.user, batch["user"])
        )
        m = self.movie.lookup(state.movie, batch["movie"])
        feats = [u, m]
        if self.cfg.multi_hot_genres:
            g = de.safe_embedding_lookup_sparse(
                self._var_of(self.genre),
                state.genre,
                batch["genres"],
                combiner="mean",
                training=False,
                sharded=self.genre if self.mesh is not None else None,
            )
            feats.append(g)
        x = jnp.concatenate(feats, axis=-1)
        return mlp.apply_mlp(state.dense, x)[:, 0]


def synthetic_movielens_batch(
    rng: np.random.Generator,
    batch_size: int,
    num_users: int = 6040,
    num_movies: int = 3706,
    max_genres: int = 4,
    multi_hot: bool = False,
):
    """MovieLens-1M-like synthetic batch with a latent-factor signal so the
    model has something real to learn (zero-egress dataset substitute)."""
    users = rng.integers(1, num_users + 1, size=batch_size).astype(np.int64)
    movies = rng.integers(1, num_movies + 1, size=batch_size).astype(np.int64)
    # deterministic latent factors per id -> learnable rating structure
    uf = np.sin(users * 0.37) + np.cos(users * 0.11)
    mf = np.sin(movies * 0.53) + np.cos(movies * 0.29)
    rating = np.clip(3.0 + uf * mf, 1.0, 5.0).astype(np.float32)
    batch = {
        "user": users,
        "movie": movies,
        "rating": rating,
    }
    if multi_hot:
        n_g = rng.integers(1, max_genres + 1, size=batch_size)
        genres = np.full(
            (batch_size, max_genres), int(de.EMPTY_KEY), dtype=np.int64
        )
        for i, n in enumerate(n_g):
            genres[i, :n] = rng.integers(1, 19, size=n)
        batch["genres"] = genres
    return batch


def run_demo(steps: int = 200, batch_size: int = 256, multi_hot=False,
             mesh=None, seed: int = 0, log_every: int = 50):
    """End-to-end training demo; returns final (train_mse, eval_mse)."""
    cfg = MovieLensConfig(multi_hot_genres=multi_hot)
    model = MovieLensModel(cfg, mesh=mesh)
    state = model.init(jax.random.PRNGKey(seed))
    train_step = jax.jit(model.make_train_step())
    rng = np.random.default_rng(seed)
    loss = None
    for t in range(steps):
        batch = synthetic_movielens_batch(
            rng, batch_size, multi_hot=multi_hot
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = train_step(state, batch)
        if log_every and t % log_every == 0:
            print(f"step {t}: train_mse={float(loss):.4f}")
    eval_batch = synthetic_movielens_batch(
        rng, 2048, multi_hot=multi_hot
    )
    eval_batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}
    pred = model.predict(state, eval_batch)
    eval_mse = float(jnp.mean((pred - eval_batch["rating"]) ** 2))
    return float(loss), eval_mse
