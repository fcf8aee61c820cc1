#!/usr/bin/env python
"""Train -> fp16-compressed export -> serve (reference demo:
movielens-100k-estimator-with-fp16-compress).

Trains a small MovieLens rating model, exports the live embedding rows
compressed to float16 (`de.export_compressed` — half the bytes on disk and
over the wire), loads the export back as a serving table, and answers a few
lookups through the HTTP serving runner to show the full deploy path.

Usage: python examples/fp16_compress_serving.py [--steps 120]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import jax.numpy as jnp

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.models.movielens import (
    MovieLensModel, synthetic_movielens_batch,
)
from recommenders_addons_tpu.serving import EmbeddingClient, EmbeddingServer

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--batch-size", type=int, default=256)
    a = p.parse_args()

    model = MovieLensModel()
    state = model.init(jax.random.PRNGKey(0))
    step_fn = jax.jit(model.make_train_step())
    rng = np.random.default_rng(0)
    loss = None
    for t in range(a.steps):
        batch = synthetic_movielens_batch(rng, a.batch_size)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = step_fn(state, batch)
        if t % 40 == 0:
            print(f"step {t}: mse={float(loss):.4f}")

    with tempfile.TemporaryDirectory() as d:
        prefix = de.export_compressed(model.user, state.user, d,
                                      dtype=np.float16)
        nbytes = os.path.getsize(prefix + "-values")
        table = de.load_compressed(prefix)
        print(f"exported {table.size()} rows as fp16 "
              f"({nbytes / 1024:.0f} KiB on disk)")

        with EmbeddingServer({"user": table}, port=0) as srv:
            cli = EmbeddingClient(srv.host, srv.port)
            ids = rng.integers(0, 200, size=8)
            vals, found = cli.lookup("user", ids.tolist())
            print(f"served lookup: {int(np.sum(found))}/8 found, "
                  f"dim={np.asarray(vals).shape[1]}")
