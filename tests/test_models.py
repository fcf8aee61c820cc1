"""End-to-end model tests: MovieLens slice + DLRM (reference acceptance
configs, BASELINE.json / SURVEY.md §7 steps 4 & 9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import parallel
from recommenders_addons_tpu.models import dlrm as dlrm_lib
from recommenders_addons_tpu.models import movielens as ml



# quick-iteration opt-out: this file dominates suite wall-time
pytestmark = pytest.mark.heavy

class TestMovieLens:
    def test_demo_converges(self):
        train_mse, eval_mse = ml.run_demo(
            steps=150, batch_size=256, log_every=0
        )
        # latent-factor signal: plain mean prediction has MSE ~1.9
        assert eval_mse < 1.0, (train_mse, eval_mse)

    def test_demo_multihot_runs(self):
        train_mse, eval_mse = ml.run_demo(
            steps=60, batch_size=128, multi_hot=True, log_every=0
        )
        assert np.isfinite(train_mse) and eval_mse < 2.0


class TestDLRM:
    def make_model(self, mesh=None):
        cfg = dlrm_lib.DLRMConfig(
            dim=16,
            bottom_sizes=(32, 16),
            top_sizes=(32, 1),
            table_capacity=1 << 14,
            learning_rate=0.05,
            sparse_lr=0.05,
        )
        return dlrm_lib.DLRM(cfg, mesh=mesh)

    def test_single_chip_trains(self):
        model = self.make_model()
        state = model.init(jax.random.PRNGKey(0))
        train_step, tx = model.make_train_step()
        opt_state = tx.init(state.dense)
        step_j = jax.jit(train_step)
        rng = np.random.default_rng(0)
        losses = []
        for _ in range(120):
            b = dlrm_lib.synthetic_criteo_batch(rng, 256)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, opt_state, loss = step_j(state, opt_state, b)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:5])
        # AUC sanity on a fresh batch
        b = dlrm_lib.synthetic_criteo_batch(rng, 4096)
        logits = model.predict(
            state, {k: jnp.asarray(v) for k, v in b.items()}
        )
        auc = dlrm_lib.batch_auc(np.asarray(logits), b["label"])
        assert auc > 0.6, auc

    def test_sharded_trains(self):
        mesh = parallel.create_mesh(num_devices=4)
        model = self.make_model(mesh=mesh)
        state = model.init(jax.random.PRNGKey(0))
        train_step, tx = model.make_train_step()
        opt_state = tx.init(state.dense)
        step_j = jax.jit(train_step)
        rng = np.random.default_rng(1)
        losses = []
        for _ in range(15):
            b = dlrm_lib.synthetic_criteo_batch(rng, 64)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, opt_state, loss = step_j(state, opt_state, b)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert int(model.params.size(state.table)) > 0

    def test_tag_keys_disjoint_features(self):
        ids = jnp.asarray([[5, 5, 5]], dtype=jnp.int64)
        tagged = dlrm_lib.tag_keys(ids)
        assert len(set(np.asarray(tagged).reshape(-1).tolist())) == 3


def test_two_tower_retrieval_learns():
    """Two-tower retrieval (reference two-tower acceptance config): in-batch
    softmax training must recover the latent group structure."""
    from recommenders_addons_tpu.models.retrieval import run_demo

    loss, recall = run_demo(steps=250, batch_size=256)
    assert recall > 0.8, (loss, recall)


def test_multi_table_train_step():
    """N separate Variables (the reference's one-Variable-per-feature demo
    shape, e.g. movielens-1m-keras user+movie tables) train in ONE jitted
    step: distinct specs, shared optimizer, donated pytree of states."""
    from recommenders_addons_tpu import dynamic_embedding as de

    vars_ = [
        de.Variable(name=f"mt_{i}", dim=8 + 4 * i, init_capacity=512,
                    initializer=jax.nn.initializers.normal(0.05))
        for i in range(3)
    ]
    opt = de.Adam(0.05)
    states = tuple(de.create_slots(v, v.init(), opt) for v in vars_)

    @jax.jit
    def step(states, ids, y):
        embs, ctxs = zip(*(v.embedding_lookup(s, ids)
                           for v, s in zip(vars_, states)))

        def loss_fn(embs):
            pred = sum(e.sum(-1) for e in embs)
            return jnp.mean((pred - y) ** 2)

        loss, gs = jax.value_and_grad(loss_fn)(tuple(embs))
        new_states = tuple(
            v.apply_gradients(s, c, g, opt, step=1)
            for v, s, c, g in zip(vars_, states, ctxs, gs)
        )
        return new_states, loss

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 400, 128, dtype=np.int64))
    y = jnp.asarray((np.asarray(ids) % 5).astype(np.float32))
    losses = []
    for _ in range(12):
        states, loss = step(states, ids, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    for v, s in zip(vars_, states):
        assert int(v.size(s)) == len(np.unique(np.asarray(ids)))


def test_dcn_trains_and_beats_chance():
    """DCN-v2 (cross layers + deep tower) over the shared dynamic table
    learns the synthetic CTR signal (second model family next to DLRM)."""
    from recommenders_addons_tpu.models import dcn as dcn_lib

    loss, auc = dcn_lib.run_demo(steps=60, batch_size=256, dim=8,
                                 log_every=0)
    assert np.isfinite(loss)
    assert auc > 0.6, auc


def test_dcn_sharded_trains():
    from jax.sharding import Mesh

    from recommenders_addons_tpu.models import dcn as dcn_lib
    from recommenders_addons_tpu import dynamic_embedding as de
    import dataclasses as dc
    import optax

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    cfg = dcn_lib.DCNConfig(dim=8, table_capacity=1 << 12,
                            deep_sizes=(16,), num_cross=2)
    model = dcn_lib.DCN(cfg, mesh=mesh)
    state = model.init(jax.random.PRNGKey(0))
    state = dc.replace(
        state,
        table=model.params.create_slots(state.table, model.opt),
    )
    train_step, tx = model.make_train_step(optax.adagrad(0.05))
    opt_state = tx.init(state.dense)
    step_j = jax.jit(train_step, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    for t in range(4):
        batch = {k: jnp.asarray(v) for k, v in
                 dcn_lib.synthetic_criteo_batch(rng, 64).items()}
        state, opt_state, loss = step_j(state, opt_state, batch)
    assert np.isfinite(float(loss))
