#!/usr/bin/env python
"""Growing-vocabulary training with restrict policies.

Reference acceptance demo: `demo/dynamic_embedding/amazon-video-games-
keras-eager` — the vocabulary grows without bound as new ids stream in,
and a RestrictPolicy periodically caps the live-key count, evicting the
stalest (timestamp) or rarest (frequency) features along with their
optimizer state.

    python examples/restrict_growth.py [--policy timestamp|frequency]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--policy", choices=("timestamp", "frequency"),
                   default="timestamp")
    p.add_argument("--num-reserved", type=int, default=4096)
    p.add_argument("--trigger", type=int, default=6144)
    a = p.parse_args()

    policy_cls = {
        "timestamp": de.TimestampRestrictPolicy,
        "frequency": de.FrequencyRestrictPolicy,
    }[a.policy]
    var = de.Variable(
        name="amazon_items", dim=a.dim, init_capacity=1 << 14,
        initializer=jax.nn.initializers.normal(0.05),
        restrict_policy=policy_cls,
        evict_strategy=(de.EvictStrategy.LRU if a.policy == "timestamp"
                        else de.EvictStrategy.LFU),
    )
    opt = de.Adam(0.01)
    state = de.create_slots(var, var.init(), opt)

    @jax.jit
    def train_step(state, ids, labels, step):
        def loss_fn(emb):
            logits = emb.sum(axis=-1)
            return jnp.mean((logits - labels) ** 2)

        emb, ctx = var.embedding_lookup(state, ids)
        loss, g = jax.value_and_grad(loss_fn)(emb)
        return var.apply_gradients(state, ctx, g, opt, step=step), loss

    rng = np.random.default_rng(0)
    for t in range(a.steps):
        # the id stream DRIFTS: new products keep appearing (the growth
        # scenario the reference demo exercises)
        lo = t * a.batch_size // 2
        ids = jnp.asarray(
            rng.integers(lo, lo + 4 * a.batch_size, a.batch_size,
                         dtype=np.int64))
        labels = jnp.asarray(
            rng.standard_normal(a.batch_size).astype(np.float32))
        state, loss = train_step(state, ids, labels, t)
        if (t + 1) % 20 == 0:
            before = int(var.size(state))
            state = var.restrict(state, num_reserved=a.num_reserved,
                                 trigger=a.trigger)
            after = int(var.size(state))
            print(f"step {t + 1}: loss={float(loss):.4f} "
                  f"size {before} -> {after} "
                  f"(policy={a.policy}, reserved={a.num_reserved})",
                  flush=True)
    final = int(var.size(state))
    print(f"final live keys: {final} (cap honored: "
          f"{final <= max(a.trigger, a.num_reserved)})")
