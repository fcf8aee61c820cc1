"""Deferred-dedup (occurrence contract + sorted MXU combine) parity.

The scored hit path can DEFER duplicate handling to the apply
(``Variable(defer_dedup=True)`` / TFRA_TPU_DEFER_DEDUP): the lookup keeps
one entry per occurrence and ``apply_gradients`` combines duplicate grads
with one slot sort (hashtable.sorted_combine_batch) instead of the
probe-scatter + ``take_elem`` + rep-position scatter-add pipeline
(tools/ab_dup_contract.py: 9.9 vs 23.2 ns/key on zipf batches). These
tests pin (a) the combine kernel against a float64 numpy reference across
the shapes that exercise its chunk-boundary carry chain, and (b) training
parity: deferred and eager tables must train to the same state on
dup-heavy, padded, and miss-containing batches (the behavioral contract —
reference IndexedSlices aggregation, dynamic_embedding_optimizer.py:184).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops import hashtable


def _np_combine(g, slot, found):
    """(combined, rep) reference: per-slot f64 sums at the first
    occurrence of each found slot; zeros / False elsewhere."""
    n, d = g.shape
    combined = np.zeros((n, d), np.float64)
    rep = np.zeros((n,), bool)
    seen = {}
    for i in range(n):
        if not found[i]:
            continue
        s = int(slot[i])
        if s not in seen:
            seen[s] = i
            rep[i] = True
        combined[seen[s]] += g[i].astype(np.float64)
    return combined, rep


@pytest.mark.parametrize(
    "n,pattern",
    [
        (256, "fewdups"),
        (1000, "fewdups"),  # non-multiple-of-128 padding
        (2048, "hot"),  # one key spanning >5 sorted chunks (carry chain)
        (2048, "allsame"),  # every valid key identical
        (512, "nofound"),  # all padding
    ],
)
def test_sorted_combine_batch_matches_numpy(n, pattern):
    rng = np.random.default_rng(hash((n, pattern)) % 2**32)
    slot = rng.choice(1 << 20, size=n, replace=False).astype(np.int32)
    found = rng.uniform(size=n) > 0.1
    if pattern == "fewdups":
        dup_src = rng.choice(n, size=n // 4)
        slot[rng.choice(n, size=n // 4, replace=False)] = slot[dup_src]
    elif pattern == "hot":
        slot[: 5 * 128 + 39] = slot[0]
        found[: 5 * 128 + 39] = True
    elif pattern == "allsame":
        slot[:] = slot[0]
    elif pattern == "nofound":
        found[:] = False
    g = rng.normal(size=(n, 64)).astype(np.float32)
    combined, rep = jax.jit(hashtable.sorted_combine_batch)(
        jnp.asarray(g), jnp.asarray(slot), jnp.asarray(found))
    combined, rep = np.asarray(combined), np.asarray(rep)
    want, want_rep_count = _np_combine(g, slot, found)
    assert rep.sum() == want_rep_count.sum()
    # rep positions may differ (any occurrence is a valid representative);
    # compare per-slot totals
    got_by_slot = {int(slot[i]): combined[i] for i in np.nonzero(rep)[0]}
    want_by_slot = {int(slot[i]): want[i]
                    for i in np.nonzero(want_rep_count)[0]}
    assert got_by_slot.keys() == want_by_slot.keys()
    for s, row in want_by_slot.items():
        np.testing.assert_allclose(got_by_slot[s], row, atol=1e-3)
    # non-rep grads must be exactly zero (the write plan masks them, but
    # the unfused path feeds them to optimizer math)
    assert np.all(combined[~rep] == 0.0)


def _train(defer, batches, n_steps_per_batch=2):
    var = de.Variable(
        name="defer_parity",  # SAME name both runs: the initializer
        # seed derives from it (Variable._stable_seed)
        dim=8,
        init_capacity=1 << 12,
        initializer=jax.nn.initializers.normal(0.05),
        defer_dedup=defer,
    )
    opt = de.Adam(0.01)
    state = de.create_slots(var, var.init(), opt)

    @jax.jit
    def step(state, ids, step_no):
        # the documented training pattern: lookup, cotangent w.r.t. emb,
        # apply (duplicates combined inside apply_gradients)
        emb, ctx = var.embedding_lookup(state, ids, step=step_no)
        g = jax.grad(lambda e: jnp.sum(jnp.sin(e) ** 2))(emb)
        return var.apply_gradients(state, ctx, g, opt, step=step_no)

    step_no = 0
    for ids in batches:
        for _ in range(n_steps_per_batch):
            state = step(state, jnp.asarray(ids), step_no)
            step_no += 1
    keys, values, scores, mask = hashtable.export_with_scores(
        var.spec, state)
    keys = np.asarray(keys)
    live = np.asarray(mask) & (keys != var.empty_key)
    order = np.argsort(keys[live])
    return (keys[live][order], np.asarray(values)[live][order],
            np.asarray(scores)[live][order])


def test_deferred_training_parity_dup_heavy():
    rng = np.random.default_rng(7)
    # hot-key zipf-ish batch (dup-heavy, hits after first step), a padded
    # batch, and a fresh-key batch (miss branch) with duplicates
    base = rng.integers(1, 1 << 30, size=256, dtype=np.int64)
    hot = np.concatenate([base, np.full(128, base[0]), base[:64]])
    padded = np.concatenate(
        [base[:100], np.full(28, np.iinfo(np.int64).min, np.int64)])
    fresh = rng.integers(1 << 40, 1 << 41, size=192, dtype=np.int64)
    fresh_dups = np.concatenate([fresh, fresh[:64]])
    batches = [hot, padded, fresh_dups, hot]
    k0, v0, s0 = _train(False, batches)
    k1, v1, s1 = _train(True, batches)
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_array_equal(s0, s1)
    # combine order differs (sorted-chunk vs rep-position scatter-add):
    # equal up to f32 sum reassociation
    np.testing.assert_allclose(v0, v1, rtol=2e-4, atol=2e-5)


def test_deferred_reduce_gradient_guard():
    var = de.Variable(name="defer_guard", dim=4, init_capacity=1 << 10,
                      defer_dedup=True)
    opt = de.SGD(0.1)
    state = de.create_slots(var, var.init(), opt)
    ids = jnp.asarray([3, 5, 3], jnp.int64)
    emb, ctx = var.embedding_lookup(state, ids, step=0)
    assert ctx.deferred
    with pytest.raises(ValueError, match="deferred"):
        var.reduce_gradient(ctx, jnp.zeros((3, 4)))
