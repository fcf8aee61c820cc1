#!/usr/bin/env python
"""DLRM CTR training (reference acceptance config: Criteo, 26 features).

Real data: pass --data <criteo.tsv> (Kaggle/terabyte TSV format: label,
13 dense, 26 categorical) and batches stream through
data.CriteoTSVReader + Prefetcher (host-side string fingerprinting, async
device placement). Without --data, a synthetic power-law generator with
the same schema runs (this environment has no dataset egress — see
BASELINE.md for the documented fallback).

Single chip by default; --shard runs embedding-parallel over all local
devices (use XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu to simulate a mesh on CPU).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.data import CriteoTSVReader, prefetch
from recommenders_addons_tpu.models import dlrm as D
from recommenders_addons_tpu.train import LoopConfig, train_loop

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--shard", action="store_true")
    p.add_argument("--data", type=str, default=None,
                   help="Criteo TSV file (label \\t 13 dense \\t 26 cat); "
                        "omitted -> synthetic generator")
    p.add_argument("--eval-batches", type=int, default=4,
                   help="held-out batches for the final AUC")
    a = p.parse_args()

    mesh = None
    if a.shard:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("ep",))
    cfg = D.DLRMConfig(dim=a.dim)
    model = D.DLRM(cfg, mesh=mesh)
    state = model.init(jax.random.PRNGKey(0))
    train_step, tx = model.make_train_step()
    opt_state = tx.init(state.dense)
    rng = np.random.default_rng(0)

    if a.data:
        reader = CriteoTSVReader(a.data, batch_size=a.batch_size,
                                 repeat=True)
        batches = iter(prefetch(reader, depth=2))

        def next_batch(_):
            return next(batches)
    else:
        def next_batch(r):
            return D.synthetic_criteo_batch(r, a.batch_size)

    # production loop: per-step dispatch, donated carry, device-side
    # metrics between log boundaries (train/loop.py)
    def step(carry, batch):
        st, os_ = carry
        st, os_, loss = train_step(st, os_, batch)
        return (st, os_), {"loss": loss}

    def batch_stream():
        for _ in range(a.steps):
            yield {k: jnp.asarray(v) for k, v in next_batch(rng).items()}

    (state, opt_state), report = train_loop(
        step, (state, opt_state), batch_stream(),
        LoopConfig(steps=a.steps, log_every=50, prefetch=2),
        on_log=lambda s, m: print(
            f"step {s}: loss={m['loss']:.4f}", flush=True),
    )
    print(f"{report.steps} steps in {report.wall_s:.1f}s "
          f"({report.steps_per_sec * a.batch_size:,.0f} examples/s)",
          flush=True)

    # held-out eval: further unseen batches from the same stream
    logits_all, labels_all = [], []
    for _ in range(a.eval_batches):
        b = next_batch(rng)
        logits = model.predict(
            state, {k: jnp.asarray(v) for k, v in b.items()})
        logits_all.append(np.asarray(logits))
        labels_all.append(np.asarray(b["label"]))
    auc = D.batch_auc(np.concatenate(logits_all),
                      np.concatenate(labels_all))
    src = a.data or "synthetic"
    print(f"AUC ({src}, {a.eval_batches * a.batch_size} held-out): "
          f"{auc:.4f}")
