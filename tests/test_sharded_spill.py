"""Sharded spill tier: the terabyte-table configuration at its real scale —
HBM capacity ≪ key space on a SHARDED table, with demoted rows (including
optimizer state) resuming training exactly (round-2 review item #4;
reference: HKV hybrid storage lookup_table_op_hkv.h:428-513 + the Redis
spill role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.parallel.sharded import ShardedVariable


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:4]), ("ep",))


def _svar(mesh, name, capacity=1 << 10, dim=2):
    var = de.Variable(name=name, dim=dim, init_capacity=capacity,
                      bucket_size=8)
    return ShardedVariable(var=var, mesh=mesh, axis="ep")


def test_demote_promote_roundtrip(mesh):
    svar = _svar(mesh, "shspill_a")
    tier = de.ShardedSpillTier(svar)
    opt = de.Adam(0.1)
    state = svar.create_slots(svar.init(), opt)
    keys = jnp.arange(1, 257, dtype=jnp.int64)
    # one train step so slots are nonzero
    emb, ctx = svar.embedding_lookup(state, keys)
    state = svar.apply_gradients(state, ctx, jnp.ones_like(emb), opt,
                                 step=0)
    vals_before = np.asarray(svar.lookup(state, keys))
    assert int(svar.size(state)) == 256

    state = tier.demote(state, num_evict_per_shard=256)  # evict everything
    assert int(svar.size(state)) == 0
    assert len(tier.store) == 256
    assert tier.stats.demoted == 256

    state = tier.promote(state, keys)
    assert int(svar.size(state)) == 256
    assert len(tier.store) == 0
    np.testing.assert_allclose(
        np.asarray(svar.lookup(state, keys)), vals_before, rtol=1e-6)
    # slot state survived the round trip
    assert float(jnp.abs(jnp.stack(
        [state.slots[n].sum() for n in state.slot_names])).sum()) > 0


def test_demoted_rows_resume_training_exactly(mesh):
    """A demote/promote cycle must not change the training trajectory:
    a second identical step matches a never-demoted table's second step."""
    def train(spill: bool):
        svar = _svar(mesh, f"shspill_b{spill}")
        tier = de.ShardedSpillTier(svar) if spill else None
        opt = de.Adam(0.05)
        state = svar.create_slots(svar.init(), opt)
        keys = jnp.arange(1, 65, dtype=jnp.int64)
        emb, ctx = svar.embedding_lookup(state, keys)
        state = svar.apply_gradients(state, ctx, jnp.ones_like(emb), opt,
                                     step=0)
        if spill:
            state = tier.demote(state, num_evict_per_shard=64)
            assert int(svar.size(state)) == 0
            state = tier.promote(state, keys)
        emb, ctx = svar.embedding_lookup(state, keys)
        state = svar.apply_gradients(state, ctx, jnp.ones_like(emb), opt,
                                     step=1)
        return np.asarray(svar.lookup(state, keys))

    np.testing.assert_allclose(train(True), train(False), rtol=1e-6)


def test_watermark_total_keys_exceed_hbm(mesh):
    """Train through more distinct keys than the sharded HBM capacity:
    watermark demotions keep occupancy bounded and no key's row is lost
    (it is served from the tier)."""
    svar = _svar(mesh, "shspill_c", capacity=512)
    tier = de.ShardedSpillTier(svar)
    opt = de.SGD(0.5)
    state = svar.create_slots(svar.init(), opt)
    total_cap = svar.var.spec.capacity * svar.num_shards
    assert total_cap == 512
    all_keys = np.arange(1, 1025, dtype=np.int64)  # 2x capacity
    for w in range(8):
        ids = jnp.asarray(all_keys[w * 128:(w + 1) * 128])
        state = tier.promote(state, ids)
        emb, ctx = svar.embedding_lookup(state, ids)
        # tier-aware apply: bucket-eviction victims land in the tier
        state = tier.apply_gradients(state, ctx, jnp.ones_like(emb), opt,
                                     step=w)
        state = tier.demote_to_watermark(state, high=0.7, low=0.5)
    assert int(svar.size(state)) <= int(0.75 * total_cap)
    assert tier.total_keys(state) == 1024  # nothing lost
    # every key's row is reachable read-through; a key whose insert was
    # dropped (bucket exhausted in its batch) keeps its looked-up row in
    # the tier with that step's gradient skipped — allow a handful
    out = np.asarray(tier.lookup_through(state, jnp.asarray(all_keys)))
    trained = np.isclose(out[:, 0], -0.5, rtol=1e-6)
    untrained = np.isclose(out[:, 0], 0.0, atol=1e-6)
    assert (trained | untrained).all()
    assert untrained.sum() <= 8


def test_contains_mask(mesh):
    svar = _svar(mesh, "shspill_d")
    state = svar.init()
    keys = jnp.arange(1, 33, dtype=jnp.int64)
    state = svar.upsert(state, keys, jnp.ones((32, 2)))
    probe = jnp.asarray([1, 99, 5, 77, 32, 1000, 2, 3], jnp.int64)
    got = np.asarray(jax.device_get(svar.contains(state, probe)))
    np.testing.assert_array_equal(
        got, [True, False, True, False, True, False, True, True])


def test_sharded_hybrid_table(mesh):
    hy = de.HybridTable(_svar(mesh, "shspill_e", capacity=256), high=0.8,
                        low=0.5)
    keys = jnp.arange(1, 513, dtype=jnp.int64)
    for w in range(4):
        sl = slice(w * 128, (w + 1) * 128)
        hy.prepare_batch(keys[sl])
        hy.upsert(keys[sl], jnp.ones((128, 2)) * (w + 1), step=w)
    assert hy.tier.total_keys(hy.state) == 512


def test_max_hbm_for_values_caps_capacity():
    """The config knob now bounds the HBM table (round-1 accepted it and
    ignored it)."""
    cfg = de.HkvHashTableConfig(
        init_capacity=1 << 20, max_capacity=1 << 20,
        max_hbm_for_values=64 * 1024,  # 64 KiB / (dim 4 * 4B) = 4096 keys
    )
    var = de.Variable(name="hbmcap", dim=4,
                      kv_creator=de.HkvHashTableCreator(cfg))
    assert var.spec.capacity == 4096
    t = de.HkvHashTableCreator(cfg).create(dim=4, name="hbmcap_t")
    assert t.var.spec.capacity == 4096
