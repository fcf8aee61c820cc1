#!/usr/bin/env python
"""Warm-starting a new model from a previous run's tables (reference demo:
movielens-100k-estimator-with-warmup; warm_start_util.py:69-198).

Phase 1 trains a MovieLens model and checkpoints it. Phase 2 builds a FRESH
model whose user table has a different name, warm-starts it from the phase-1
checkpoint via a name map (`de.warm_start`), and shows the loaded rows give
it a head start: first-step eval MSE matches the trained model, not a cold
one.

Usage: python examples/warm_start_train.py [--steps 150]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.models.movielens import (
    MovieLensModel, synthetic_movielens_batch,
)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=256)
    a = p.parse_args()

    def eval_mse(model, state, rng):
        b = synthetic_movielens_batch(rng, 2048)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        pred = model.predict(state, b)
        return float(jnp.mean((pred - b["rating"]) ** 2))

    # ---- phase 1: train and checkpoint --------------------------------
    model = MovieLensModel()
    state = model.init(jax.random.PRNGKey(0))
    step_fn = jax.jit(model.make_train_step())
    rng = np.random.default_rng(0)
    for t in range(a.steps):
        batch = synthetic_movielens_batch(rng, a.batch_size)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = step_fn(state, batch)
    trained = eval_mse(model, state, np.random.default_rng(7))
    print(f"phase 1 trained eval_mse={trained:.4f}")

    with tempfile.TemporaryDirectory() as d:
        ckpt = de.train.DECheckpoint(
            user=model.user, movie=model.movie, dense=None)
        ckpt.save(d, state={"user": state.user, "movie": state.movie,
                            "dense": state.dense}, step=a.steps)

        # ---- phase 2: fresh model, renamed table, warm start ----------
        import dataclasses

        model2 = MovieLensModel()
        # new table name, old weights (Variable is a frozen dataclass)
        model2.user = dataclasses.replace(model2.user, name="ml_user_v2")
        state2 = model2.init(jax.random.PRNGKey(1))
        cold = eval_mse(model2, state2, np.random.default_rng(7))

        warmed = de.warm_start(
            {model2.user: state2.user, model2.movie: state2.movie},
            ckpt_to_initialize_from=d,
            vars_to_warm_start=["ml_user_v2", "ml_movie"],
            var_name_to_prev_var_name={"ml_user_v2": "ml_user"},
        )
        state2 = dataclasses.replace(
            state2,
            user=warmed[model2.user], movie=warmed[model2.movie],
            dense=state.dense,  # carry the dense tower too
        )
        warm = eval_mse(model2, state2, np.random.default_rng(7))
        print(f"phase 2 cold eval_mse={cold:.4f} -> warm-started "
              f"eval_mse={warm:.4f}")
        assert warm < cold, (warm, cold)
