"""Scores-at-lookup merged path (the LRU score scatter doubles as the
duplicate probe — hashtable.plan_lookup_train ``score_const``).

Behavioral contract mirrored from the reference: HKV stamps per-key scores
on every access (lookup_table_op_hkv.h:730-745 find-or-insert updates
scores), and LRU-family strategies stamp the step value
(hkv_hashtable_ops.py:209-216). The merged path must be bit-identical to
the classic lookup -> apply(commit scores) sequence on every branch:
pristine hits, duplicate batches, and insert/evict misses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de


def _mk(dim=8, cap=1 << 10, value_dtype=jnp.float32, strategy=None):
    kw = {}
    if strategy is not None:
        kw["evict_strategy"] = strategy
    var = de.Variable(
        name="scored", dim=dim, init_capacity=cap,
        value_dtype=value_dtype,
        initializer=jax.nn.initializers.normal(0.05), **kw,
    )
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    return var, opt, state


def _train(var, opt, state, ids, step, lookup_step):
    kw = {"step": step} if lookup_step else {}
    emb, ctx = var.embedding_lookup(state, ids, **kw)
    if lookup_step:
        assert ctx.scores is not None, "merged path should be active"
    return var.apply_gradients(state, ctx, emb * 0.01 + 1.0, opt,
                               step=step)


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.key_lo), np.asarray(b.key_lo))
    np.testing.assert_array_equal(np.asarray(a.key_hi), np.asarray(b.key_hi))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))
    np.testing.assert_array_equal(np.asarray(a.rows), np.asarray(b.rows))


@pytest.mark.parametrize("value_dtype", [jnp.float32, jnp.bfloat16])
def test_scored_lookup_matches_classic(value_dtype):
    var, opt, state = _mk(value_dtype=value_dtype)
    var2, opt2, state2 = _mk(value_dtype=value_dtype)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 10_000, size=64, dtype=np.int64))
    dup_ids = jnp.concatenate([ids[:32], ids[:32]])
    for s in range(1, 4):  # steady-state hits (pristine branch)
        state = _train(var, opt, state, ids, s, True)
        state2 = _train(var2, opt2, state2, ids, s, False)
    for s in range(4, 6):  # duplicate batches (dedup branch)
        state = _train(var, opt, state, dup_ids, s, True)
        state2 = _train(var2, opt2, state2, dup_ids, s, False)
    state = _train(var, opt, state, ids ^ 777, 6, True)  # miss branch
    state2 = _train(var2, opt2, state2, ids ^ 777, 6, False)
    _assert_same(state, state2)


def test_scored_lookup_stale_step_is_safe():
    """A REUSED step value may only fall back to the dedup branch — the
    resulting state must stay identical to the classic path (no false
    'no dups' from stale score stamps)."""
    var, opt, state = _mk()
    var2, opt2, state2 = _mk()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 10_000, size=64, dtype=np.int64))
    for _ in range(3):  # same step every time: score constant goes stale
        state = _train(var, opt, state, ids, 5, True)
        state2 = _train(var2, opt2, state2, ids, 5, False)
    dup_ids = jnp.concatenate([ids[:32], ids[:32]])
    state = _train(var, opt, state, dup_ids, 5, True)
    state2 = _train(var2, opt2, state2, dup_ids, 5, False)
    _assert_same(state, state2)


def test_scored_lookup_scores_are_step_stamps():
    """After a merged-path step, resident keys carry the lookup step as
    their LRU score (HKV per-access stamping semantics)."""
    var, opt, state = _mk()
    ids = jnp.asarray(np.arange(1, 33, dtype=np.int64))
    state = _train(var, opt, state, ids, 7, True)
    keys, scores, live = (np.asarray(x)
                          for x in var.export_keys_and_scores(state))
    assert set(keys[live]) == set(range(1, 33))
    np.testing.assert_array_equal(scores[live], 7)


def test_scored_lookup_lfu_stays_classic():
    """Non-assign strategies (LFU) must NOT take the merged path even when
    a step is passed (their scores are not a batch constant)."""
    var, opt, state = _mk(strategy=de.EvictStrategy.LFU)
    ids = jnp.asarray(np.arange(1, 33, dtype=np.int64))
    emb, ctx = var.embedding_lookup(state, ids, step=3)
    assert ctx.scores is None
    state = var.apply_gradients(state, ctx, emb * 0.01, de.Adam(1e-3),
                                step=3)
    # two accesses -> LFU count 2
    emb, ctx = var.embedding_lookup(state, ids, step=4)
    state = var.apply_gradients(state, ctx, emb * 0.01, de.Adam(1e-3),
                                step=4)
    _, scores, live = (np.asarray(x)
                       for x in var.export_keys_and_scores(state))
    assert scores[live].max() == 2


def test_epochlru_step_without_epoch_defers_scoring():
    """EPOCHLRU with only ``step`` must NOT commit scores at lookup time:
    the merged path would silently stamp epoch 0 over a row's stored
    ``(epoch << shift | step)`` score, making freshly-touched rows look
    OLDER than untouched rows from later epochs (ADVICE r4). With both
    ``step`` and ``epoch`` the merged path activates and matches the
    classic sequence; step-only defers to apply-time scoring, which
    receives the true epoch."""
    var, opt, state = _mk(strategy=de.EvictStrategy.EPOCHLRU)
    ids = jnp.asarray(np.arange(1, 33, dtype=np.int64))
    _, ctx = var.embedding_lookup(state, ids, step=3)
    assert ctx.scores is None, "step-only EPOCHLRU must defer scoring"
    _, ctx2 = var.embedding_lookup(state, ids, step=3, epoch=2)
    assert ctx2.scores is not None

    emb, ctx = var.embedding_lookup(state, ids, step=3)
    state = var.apply_gradients(state, ctx, emb * 0.01, opt,
                                step=3, epoch=2)
    _, scores, live = (np.asarray(x)
                       for x in var.export_keys_and_scores(state))
    assert (scores[live] == ((2 << 32) | 3)).all(), (
        "apply-time scoring must carry the caller's true epoch")
