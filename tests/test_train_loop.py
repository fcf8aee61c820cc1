"""train.loop — host-driven per-step training driver.

Pins the production-loop contract (the reference trains through Keras
fit + DE callbacks; here the equivalent is an explicit host loop with
donation — see train/loop.py docstring for why scan is not an option)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.train.loop import (
    LoopConfig,
    train_loop,
)


def _make_var(name):
    return de.Variable(
        name=name, dim=8, init_capacity=1 << 10,
        initializer=jax.nn.initializers.normal(0.05),
    )


def _batches(n_batches, batch, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        ids = rng.integers(1, 500, size=batch, dtype=np.int64)
        target = (ids % 7).astype(np.float32)
        yield {"ids": ids, "y": target}


class TestTrainLoop:
    def test_loss_decreases_and_report(self):
        var = _make_var("loop_t1")
        opt = de.Adam(0.05)
        state = de.create_slots(var, var.init(), opt)

        def step(st, batch):
            ids = jnp.asarray(batch["ids"])
            y = jnp.asarray(batch["y"])

            def loss_fn(emb):
                pred = emb.sum(-1)
                return jnp.mean((pred - y) ** 2)

            emb, ctx = var.embedding_lookup(st, ids)
            loss, g = jax.value_and_grad(loss_fn)(emb)
            st = var.apply_gradients(st, ctx, g, opt)
            return st, {"loss": loss}

        logs = []
        state, report = train_loop(
            step, state, _batches(60, 64),
            LoopConfig(steps=60, log_every=20, prefetch=2),
            on_log=lambda s, m: logs.append((s, m["loss"])),
        )
        assert report.steps == 60
        assert [s for s, _ in logs] == [20, 40, 60]
        first, last = logs[0][1], logs[-1][1]
        assert last < first  # training actually reduced the loss
        assert report.last_metrics["loss"] == pytest.approx(last, rel=1e-6)
        assert report.steps_per_sec > 0
        assert int(var.size(state)) > 0

    def test_batch_exhaustion_stops_early(self):
        var = _make_var("loop_t2")
        opt = de.SGD(0.1)
        state = de.create_slots(var, var.init(), opt)

        def step(st, batch):
            emb, ctx = var.embedding_lookup(st, jnp.asarray(batch["ids"]))
            st = var.apply_gradients(st, ctx, emb * 0.01, opt)
            return st, {"n": jnp.asarray(1.0)}

        state, report = train_loop(
            step, state, _batches(5, 32), LoopConfig(steps=100, log_every=0)
        )
        assert report.steps == 5

    def test_checkpoint_hook_cadence(self):
        var = _make_var("loop_t3")
        opt = de.SGD(0.1)
        state = de.create_slots(var, var.init(), opt)
        calls = []

        def step(st, batch):
            emb, ctx = var.embedding_lookup(st, jnp.asarray(batch["ids"]))
            st = var.apply_gradients(st, ctx, emb * 0.01, opt)
            return st, None

        state, report = train_loop(
            step, state, _batches(10, 16),
            LoopConfig(steps=10, log_every=0, checkpoint_every=4),
            checkpoint_fn=lambda st, s: calls.append(s),
        )
        # strides at 4, 8 + the final-step call
        assert calls == [4, 8, 10]

    def test_donation_updates_in_place_semantics(self):
        # the returned state must be usable; the input state is consumed
        var = _make_var("loop_t4")
        opt = de.SGD(0.1)
        state = de.create_slots(var, var.init(), opt)

        def step(st, batch):
            st = var.upsert(st, jnp.asarray(batch["ids"]),
                            jnp.ones((batch["ids"].shape[0], 8)))
            return st, None

        out, report = train_loop(
            step, state, _batches(3, 16), LoopConfig(steps=3, log_every=0)
        )
        assert int(var.size(out)) > 0
