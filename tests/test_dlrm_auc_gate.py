"""Pinned synthetic-AUC regression gates for the DLRM example (SURVEY §6
north star; the environment has no dataset egress, so corpora are
fixed-seed synthetic).

Both gates force the label signal THROUGH the dynamic table: the dense
features are pure noise, so a regression anywhere in the sparse path
(dedup, plan, fused optimizer, gradient routing) collapses AUC to ~0.5 —
unlike a mixed corpus, where the dense tower masks a dead sparse path
(measured: dense-only ablation and full model both hit 0.696 on the
mixed synthetic corpus at 200 steps).

1. Memorization gate (fast, default suite): one fixed batch must be
   fit well above chance — sparse gradients flow end to end.
2. Generalization gate (slow): streaming batches; held-out AUC >= 0.65
   (measured 0.736 at 600 steps on this seed; dead sparse path: ~0.50).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.models.dlrm import (
    DLRM, DLRMConfig, batch_auc,
)



# quick-iteration opt-out: this file dominates suite wall-time
pytestmark = pytest.mark.heavy

def _gen(rng, b):
    """Label depends ONLY on categorical ids; dense features are noise."""
    ids = rng.integers(0, 64, size=(b, 26)).astype(np.int64)
    dense = rng.normal(size=(b, 13)).astype(np.float32)
    signal = ((ids[:, :8] % 4) == 0).sum(-1) * 1.0 - 2.0
    label = (rng.random(b) < 1 / (1 + np.exp(-signal))).astype(np.float32)
    return {"dense": dense, "sparse": ids, "label": label}


def _model():
    cfg = DLRMConfig(
        dim=8, table_capacity=1 << 13, num_dense=13, num_sparse=26,
        bottom_sizes=(32, 8), top_sizes=(32, 1),
        learning_rate=0.05, sparse_lr=0.1,
    )
    model = DLRM(cfg)
    state = model.init(jax.random.PRNGKey(0))
    state = dataclasses.replace(
        state, table=de.create_slots(model.var, state.table, model.opt)
    )
    train_step, tx = model.make_train_step()
    return model, state, jax.jit(train_step), tx


def test_dlrm_sparse_memorization_gate():
    """One fixed id-signal batch must be fit to train-AUC >= 0.85 in 300
    steps (measured 0.91; a dead sparse-grad path plateaus ~0.5-0.6)."""
    model, state, train_step, tx = _model()
    opt_state = tx.init(state.dense)
    raw = _gen(np.random.default_rng(0), 512)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    for _ in range(300):
        state, opt_state, loss = train_step(state, opt_state, batch)
    auc = batch_auc(np.asarray(model.predict(state, batch)),
                    raw["label"])
    assert auc >= 0.85, f"sparse memorization gate: AUC {auc:.4f} < 0.85"


@pytest.mark.slow
def test_dlrm_sparse_generalization_gate():
    """Held-out AUC on the streaming id-signal corpus >= 0.65 after 600
    steps (measured 0.736; dead sparse path: ~0.50)."""
    model, state, train_step, tx = _model()
    opt_state = tx.init(state.dense)
    rng = np.random.default_rng(42)
    for _ in range(600):
        batch = {k: jnp.asarray(v) for k, v in _gen(rng, 512).items()}
        state, opt_state, loss = train_step(state, opt_state, batch)
    eval_rng = np.random.default_rng(1234)
    logits, labels = [], []
    for _ in range(4):
        raw = _gen(eval_rng, 512)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        logits.append(np.asarray(model.predict(state, batch)))
        labels.append(raw["label"])
    auc = batch_auc(np.concatenate(logits), np.concatenate(labels))
    assert auc >= 0.65, f"sparse generalization gate: AUC {auc:.4f} < 0.65"
