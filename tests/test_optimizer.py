"""Sparse-optimizer parity tests against NumPy mirrors of the TF update math
(reference strategy: every optimizer x TrainableWrapper vs dense baselines,
dynamic_embedding_optimizer_test.py — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de

DIM = 4
VOCAB = list(range(1, 17))


def np_sgd(lr):
    def f(row, g, slots, t):
        return row - lr * g, slots

    return f, {}


def np_momentum(lr, mom):
    def f(row, g, slots, t):
        m = slots["momentum"] * mom + g
        return row - lr * m, {"momentum": m}

    return f, {"momentum": 0.0}


def np_adagrad(lr, acc0, eps):
    def f(row, g, slots, t):
        acc = slots["accumulator"] + g * g
        return row - lr * g / (np.sqrt(acc) + eps), {"accumulator": acc}

    return f, {"accumulator": acc0}


def np_adam(lr, b1, b2, eps):
    def f(row, g, slots, t):
        m = b1 * slots["m"] + (1 - b1) * g
        v = b2 * slots["v"] + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2 ** (t + 1)) / (1 - b1 ** (t + 1))
        return row - lr_t * m / (np.sqrt(v) + eps), {"m": m, "v": v}

    return f, {"m": 0.0, "v": 0.0}


def np_ftrl(lr, p, acc0, l1, l2):
    def f(row, g, slots, t):
        n, z = slots["accumulator"], slots["linear"]
        n_new = n + g * g
        sigma = (n_new ** -p - n ** -p) / lr
        z_new = z + g - sigma * row
        quad = n_new ** -p / lr + 2 * l2
        new = np.where(
            np.abs(z_new) > l1, (np.clip(z_new, -l1, l1) - z_new) / quad, 0.0
        )
        return new, {"accumulator": n_new, "linear": z_new}

    return f, {"accumulator": acc0, "linear": 0.0}


OPTS = [
    ("sgd", de.SGD(0.1), np_sgd(0.1)),
    ("momentum", de.Momentum(0.1, 0.9), np_momentum(0.1, 0.9)),
    ("adagrad", de.Adagrad(0.1, 0.1, 1e-7), np_adagrad(0.1, 0.1, 1e-7)),
    ("adam", de.Adam(0.01, 0.9, 0.999, 1e-7), np_adam(0.01, 0.9, 0.999, 1e-7)),
    (
        "ftrl",
        de.FTRL(0.1, -0.5, 0.1, 0.001, 0.001),
        np_ftrl(0.1, -0.5, 0.1, 0.001, 0.001),
    ),
]


@pytest.mark.parametrize("name,opt,np_opt", OPTS, ids=[o[0] for o in OPTS])
def test_optimizer_matches_numpy_mirror(name, opt, np_opt):
    np_update, slot0 = np_opt
    var = de.Variable(
        name=f"opt_{name}", dim=DIM, init_capacity=2048, initializer=0.0
    )
    state = var.init()

    # numpy model: per-key row + slots, rows update only when touched
    model = {
        k: {"row": np.zeros(DIM, np.float64), "slots": {
            s: np.full(DIM, v, np.float64) for s, v in slot0.items()}}
        for k in VOCAB
    }

    @jax.jit
    def step(state, ids, grads, t):
        emb, ctx = var.embedding_lookup(state, ids)
        return var.apply_gradients(state, ctx, grads, opt, step=t)

    rng = np.random.default_rng(7)
    for t in range(30):
        ids = np.sort(rng.choice(VOCAB, size=6, replace=False))
        grads = rng.normal(size=(6, DIM)).astype(np.float32)
        state = step(
            state, jnp.asarray(ids, dtype=jnp.int64), jnp.asarray(grads), t
        )
        for i, k in enumerate(ids):
            row, slots = model[k]["row"], model[k]["slots"]
            new_row, new_slots = np_update(row, grads[i].astype(np.float64),
                                           slots, t)
            model[k]["row"] = new_row
            model[k]["slots"] = new_slots

    for k in VOCAB:
        out = var.lookup(state, jnp.asarray([k], dtype=jnp.int64))
        np.testing.assert_allclose(
            np.asarray(out[0]), model[k]["row"], rtol=2e-4, atol=2e-5,
            err_msg=f"{name} key {k}",
        )


def test_optax_adapter_trains():
    import optax

    var = de.Variable(name="optax_var", dim=DIM, init_capacity=1024,
                      initializer=0.0)
    state = var.init()
    opt = de.DynamicEmbeddingOptimizer(optax.adam(0.05))
    target = np.full(DIM, 2.0, np.float32)

    @jax.jit
    def step(state, ids, t):
        emb, ctx = var.embedding_lookup(state, ids)
        g = jax.grad(lambda e: 0.5 * jnp.sum((e - target) ** 2))(emb)
        return var.apply_gradients(state, ctx, g, opt, step=t)

    ids = jnp.asarray([1, 2, 3], dtype=jnp.int64)
    for t in range(300):
        state = step(state, ids, t)
    out = var.lookup(state, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(target, (3, DIM)), atol=1e-2
    )


def test_optax_state_becomes_slots():
    import optax

    var = de.Variable(name="optax_slots", dim=DIM, init_capacity=256)
    state = var.init()
    opt = de.DynamicEmbeddingOptimizer(optax.adam(0.05))
    emb, ctx = var.embedding_lookup(
        state, jnp.asarray([1], dtype=jnp.int64)
    )
    state = var.apply_gradients(state, ctx, jnp.ones((1, DIM)), opt)
    assert len(state.slots) >= 2  # count + m + v leaves


def test_create_slots_parity():
    var = de.Variable(name="slots_par", dim=DIM, init_capacity=256)
    state = var.init()
    state = de.create_slots(var, state, de.Adam())
    assert set(state.slots) == {"m", "v"}


def test_adagrad_slot_survives_as_column():
    var = de.Variable(name="ada_col", dim=DIM, init_capacity=256)
    state = var.init()
    opt = de.Adagrad(0.1, initial_accumulator_value=0.5)
    emb, ctx = var.embedding_lookup(state, jnp.asarray([9], dtype=jnp.int64))
    g = jnp.ones((1, DIM))
    state = var.apply_gradients(state, ctx, g, opt)
    # accumulator = 0.5 + 1 = 1.5 stored next to the row
    from recommenders_addons_tpu.ops import hashtable as ht

    slot, found = ht.find(var.spec, state, jnp.asarray([9], dtype=jnp.int64))
    assert bool(found[0])
    np.testing.assert_allclose(
        np.asarray(state.slots["accumulator"][slot[0]]), 1.5
    )
