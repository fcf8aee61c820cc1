#!/usr/bin/env python
"""bp_v2 delta-update training.

Reference acceptance demo: `demo/dynamic_embedding/bpv2` — instead of
overwriting trained rows, writebacks ACCUMULATE the delta
(new - as-looked-up), which tolerates concurrent writers in the
reference's async setting (dynamic_embedding_variable.py:546-552). The
TPU design is single-owner and race-free, but the delta semantics are
preserved for parity; this demo trains the same model both ways and shows
they agree in the single-writer case.

    python examples/bpv2_train.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de


def train(bp_v2: bool, steps: int = 40, batch: int = 256, dim: int = 8):
    var = de.Variable(
        name=f"bpv2_{bp_v2}", dim=dim, init_capacity=1 << 12,
        initializer=jax.nn.initializers.normal(0.05), bp_v2=bp_v2,
        seed=42,  # same per-key init rows for both variants
    )
    opt = de.Adagrad(0.05)
    state = de.create_slots(var, var.init(), opt)

    @jax.jit
    def step_fn(state, ids, labels, step):
        def loss_fn(emb):
            return jnp.mean((emb.sum(-1) - labels) ** 2)

        emb, ctx = var.embedding_lookup(state, ids)
        loss, g = jax.value_and_grad(loss_fn)(emb)
        return var.apply_gradients(state, ctx, g, opt, step=step), loss

    rng = np.random.default_rng(0)
    losses = []
    for t in range(steps):
        ids = jnp.asarray(rng.integers(0, 2048, batch, dtype=np.int64))
        labels = jnp.asarray(
            (np.asarray(ids) % 7).astype(np.float32) * 0.1)
        state, loss = step_fn(state, ids, labels, t)
        losses.append(float(loss))
    return var, state, losses


if __name__ == "__main__":
    var_a, st_a, loss_a = train(bp_v2=False)
    var_b, st_b, loss_b = train(bp_v2=True)
    print(f"assign-mode  loss: {loss_a[0]:.4f} -> {loss_a[-1]:.4f}")
    print(f"bp_v2 (delta) loss: {loss_b[0]:.4f} -> {loss_b[-1]:.4f}")
    probe = jnp.arange(0, 64, dtype=jnp.int64)
    va = np.asarray(var_a.lookup(st_a, probe))
    vb = np.asarray(var_b.lookup(st_b, probe))
    print("single-writer rows agree:",
          bool(np.allclose(va, vb, rtol=1e-5)))
