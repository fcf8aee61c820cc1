#!/usr/bin/env python
"""MovieLens rating model (reference demo: movielens-1m-keras).

Real data: pass --data <ratings.dat or u.data> (ml-1m `::` or ml-100k tab
format), streamed through data.MovieLensRatingsReader + Prefetcher with
buffered shuffling. Without --data, a synthetic latent-factor generator
with the same schema runs (this environment has no dataset egress).

Usage: python examples/movielens_train.py [--steps 300] [--multi-hot]
       python examples/movielens_train.py --data ml-1m/ratings.dat
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.data import MovieLensRatingsReader, prefetch
from recommenders_addons_tpu.models.movielens import (
    MovieLensModel, run_demo, synthetic_movielens_batch,
)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--multi-hot", action="store_true")
    p.add_argument("--data", type=str, default=None,
                   help="MovieLens ratings file (ml-1m ratings.dat or "
                        "ml-100k u.data); omitted -> synthetic generator")
    p.add_argument("--eval-batches", type=int, default=8,
                   help="held-out batches for the final MSE (--data only)")
    a = p.parse_args()

    if not a.data:
        train_mse, eval_mse = run_demo(
            steps=a.steps, batch_size=a.batch_size, multi_hot=a.multi_hot,
            log_every=50,
        )
        print(f"final: train_mse={train_mse:.4f} eval_mse={eval_mse:.4f}")
        sys.exit(0)

    model = MovieLensModel()
    state = model.init(jax.random.PRNGKey(0))
    step_fn = jax.jit(model.make_train_step(), donate_argnums=(0,))
    reader = MovieLensRatingsReader(
        a.data, batch_size=a.batch_size, repeat=True)
    batches = iter(prefetch(reader, depth=2))

    loss = None
    for t in range(a.steps):
        b = next(batches)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        state, loss = step_fn(state, b)
        if t % 50 == 0:
            print(f"step {t}: train_mse={float(loss):.4f}", flush=True)

    # held-out eval: further unseen batches from the shuffled stream
    errs = []
    for _ in range(a.eval_batches):
        b = next(batches)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        pred = model.predict(state, b)
        errs.append(np.asarray((pred - b["rating"]) ** 2))
    eval_mse = float(np.mean(np.concatenate(errs)))
    print(f"final: train_mse={float(loss):.4f} "
          f"eval_mse ({a.data}, {a.eval_batches * a.batch_size} held-out): "
          f"{eval_mse:.4f}")
