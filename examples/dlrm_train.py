#!/usr/bin/env python
"""DLRM CTR training (reference acceptance config: Criteo, 26 features).

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

from recommenders_addons_tpu.models import dlrm as D

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--shard", action="store_true")
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
    step_j = jax.jit(train_step, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    for t in range(a.steps):
        b = D.synthetic_criteo_batch(rng, a.batch_size)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        state, opt_state, loss = step_j(state, opt_state, b)
        if t % 50 == 0:
            print(f"step {t}: loss={float(loss):.4f}")
    b = D.synthetic_criteo_batch(rng, 8192)
    logits = model.predict(state, {k: jnp.asarray(v) for k, v in b.items()})
    print(f"AUC: {D.batch_auc(np.asarray(logits), b['label']):.4f}")
