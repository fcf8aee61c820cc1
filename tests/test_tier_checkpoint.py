"""Spill-tier checkpoint persistence — the terabyte-table save/restore
contract: rows demoted to the host tier (or the sharded network tier) are
dumped alongside the HBM shards and survive a cold restore, with scores and
optimizer slots. Reference anchors: HKV's score-aware dump_to_file/
load_from_file (lookup_table_op_hkv.h:602-660) and the Redis backend's RDB
persistence (redis_connection_util.hpp:330-480)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops.spill import (
    ShardedSpillTier,
    SpillTier,
)
from recommenders_addons_tpu.parallel.sharded import ShardedVariable
from recommenders_addons_tpu.train import (
    DECheckpoint,
    load_dynamic_embedding,
    save_dynamic_embedding,
)
from recommenders_addons_tpu.train.checkpoint import load_tier, save_tier



# quick-iteration opt-out: this file dominates suite wall-time
pytestmark = pytest.mark.heavy

def _trained_hybrid(name: str, n_keys: int = 80, n_demote: int = 50):
    """A Variable trained one Adam step with LRU scores, half demoted."""
    var = de.Variable(name=name, dim=4, init_capacity=1 << 9,
                      evict_strategy=de.EvictStrategy.LRU)
    opt = de.Adam(0.01)
    state = de.create_slots(var, var.init(), opt)
    keys = jnp.arange(1, n_keys + 1, dtype=jnp.int64)
    emb, ctx = var.embedding_lookup(state, keys, step=3)
    state = var.apply_gradients(state, ctx, emb * 0.1 + 1.0, opt, step=3)
    tier = SpillTier(var)
    state = tier.demote(state, n_demote)
    assert len(tier.store) == n_demote
    return var, opt, state, tier, keys


def _served_rows(var, state, tier, keys):
    out = np.asarray(jax.device_get(tier.lookup_through(state, keys)))
    return out


def test_tier_cold_restore_serves_every_row(tmp_path):
    """Train -> demote -> save -> cold restore into FRESH state + FRESH
    tier -> every row (HBM + tier) is served with its trained value."""
    var, opt, state, tier, keys = _trained_hybrid("tierck_a")
    want = _served_rows(var, state, tier, keys)
    n_hbm = int(var.size(state))
    n_tier = len(tier.store)

    save_dynamic_embedding(var, state, str(tmp_path), tier=tier)

    # cold start: fresh objects, nothing shared with the saved run
    var2 = de.Variable(name="tierck_a", dim=4, init_capacity=1 << 9,
                       evict_strategy=de.EvictStrategy.LRU)
    tier2 = SpillTier(var2)
    state2 = load_dynamic_embedding(
        var2, var2.init(), str(tmp_path), tier=tier2)

    assert int(var2.size(state2)) == n_hbm
    assert len(tier2.store) == n_tier
    got = _served_rows(var2, state2, tier2, keys)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tier_rows_carry_scores_and_slots(tmp_path):
    """Demoted rows resume training exactly where they left off after a
    cold restore: scores and Adam m/v slots ride the tier dump."""
    var, opt, state, tier, keys = _trained_hybrid("tierck_b")
    probe = keys[:8]
    # save FIRST: promote() below deletes promoted rows from the shared
    # store, and the checkpoint must capture the pre-promotion tier
    save_dynamic_embedding(var, state, str(tmp_path), tier=tier)
    # reference copy of a demoted key's row after ONE MORE step
    # (promote -> train -> read)
    st_ref = tier.promote(state, probe)
    emb, ctx = var.embedding_lookup(st_ref, probe, step=4)
    st_ref = var.apply_gradients(st_ref, ctx, jnp.ones_like(emb), opt,
                                 step=4)
    want = np.asarray(jax.device_get(var.lookup(st_ref, probe)))
    var2 = de.Variable(name="tierck_b", dim=4, init_capacity=1 << 9,
                       evict_strategy=de.EvictStrategy.LRU)
    tier2 = SpillTier(var2)
    state2 = load_dynamic_embedding(
        var2, var2.init(), str(tmp_path), tier=tier2)
    state2 = tier2.promote(state2, probe)
    emb, ctx = var2.embedding_lookup(state2, probe, step=4)
    state2 = var2.apply_gradients(state2, ctx, jnp.ones_like(emb), opt,
                                  step=4)
    got = np.asarray(jax.device_get(var2.lookup(state2, probe)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_restore_without_tier_merges_with_warning(tmp_path):
    """tier=None on load with tier files present: rows merge into HBM
    (capacity permitting) behind a warning — nothing silently vanishes."""
    var, opt, state, tier, keys = _trained_hybrid("tierck_c")
    want = _served_rows(var, state, tier, keys)
    save_dynamic_embedding(var, state, str(tmp_path), tier=tier)

    var2 = de.Variable(name="tierck_c", dim=4, init_capacity=1 << 9,
                       evict_strategy=de.EvictStrategy.LRU)
    with pytest.warns(UserWarning, match="spill-tier"):
        state2 = load_dynamic_embedding(var2, var2.init(), str(tmp_path))
    assert int(var2.size(state2)) == len(keys)
    got, found = var2.lookup(state2, keys, return_exists=True)
    np.testing.assert_array_equal(np.asarray(found), True)
    np.testing.assert_allclose(np.asarray(jax.device_get(got)), want,
                               rtol=1e-6)


def test_decheckpoint_hybrid_entry(tmp_path):
    """DECheckpoint accepts (variable, tier) tuples: the tier checkpoints
    and restores with the table through the object API."""
    var, opt, state, tier, keys = _trained_hybrid("tierck_d")
    want = _served_rows(var, state, tier, keys)
    dense = {"w": jnp.ones((3,))}
    ckpt = DECheckpoint(emb=(var, tier), dense=None)
    ckpt.save(str(tmp_path), state={"emb": state, "dense": dense}, step=5)

    var2 = de.Variable(name="tierck_d", dim=4, init_capacity=1 << 9,
                       evict_strategy=de.EvictStrategy.LRU)
    tier2 = SpillTier(var2)
    ckpt2 = DECheckpoint(emb=(var2, tier2), dense=None)
    out = ckpt2.restore(
        str(tmp_path), state={"emb": var2.init(), "dense": dense})
    got = _served_rows(var2, out["emb"], tier2, keys)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert len(tier2.store) == len(tier.store)


def test_sharded_tier_checkpoint_roundtrip(tmp_path):
    """ShardedVariable + ShardedSpillTier: demoted rows from every shard
    checkpoint once and cold-restore into a DIFFERENT topology (4 -> 2)."""
    var = de.Variable(name="tierck_s", dim=4, init_capacity=1 << 9,
                      evict_strategy=de.EvictStrategy.LRU)
    mesh4 = Mesh(np.array(jax.devices()[:4]), ("ep",))
    sv = ShardedVariable(var=var, mesh=mesh4)
    state = sv.init()
    keys = jnp.arange(1, 201, dtype=jnp.int64)
    vals = jnp.tile(keys[:, None].astype(jnp.float32), (1, 4)) * 0.25
    state = sv.upsert(state, keys, vals, step=2)
    tier = ShardedSpillTier(sv)
    state = tier.demote(state, 30)  # 30 coldest per shard
    n_tier = len(tier.store)
    assert n_tier > 0
    want = np.asarray(jax.device_get(tier.lookup_through(state, keys)))

    save_dynamic_embedding(sv, state, str(tmp_path), tier=tier)

    var2 = de.Variable(name="tierck_s", dim=4, init_capacity=1 << 9,
                       evict_strategy=de.EvictStrategy.LRU)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("ep",))
    sv2 = ShardedVariable(var=var2, mesh=mesh2)
    tier2 = ShardedSpillTier(sv2)
    state2 = load_dynamic_embedding(
        sv2, sv2.init(), str(tmp_path), tier=tier2)
    assert len(tier2.store) == n_tier
    got = np.asarray(jax.device_get(tier2.lookup_through(state2, keys)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_save_tier_accepts_raw_store(tmp_path):
    """save_tier/load_tier work on a bare host store (the network-tier
    shape: callers that hold a RemoteKVStore, not a SpillTier)."""
    from recommenders_addons_tpu.ops.spill import HostKVStore

    var = de.Variable(name="tierck_raw", dim=4, init_capacity=1 << 8)
    store = HostKVStore(dim=4)
    keys = np.arange(1, 33, dtype=np.int64)
    vals = np.tile(keys[:, None].astype(np.float32), (1, 4))
    store.put(keys, vals, scores=keys * 10,
              slots={"m": vals * 0.5})
    vdir = str(tmp_path)
    n = save_tier(store, var, vdir)
    assert n == 32

    store2 = HostKVStore(dim=4)
    m = load_tier(store2, var, vdir, proc_size=1, proc_rank=0)
    assert m == 32
    got, sc, slots, found = store2.get(keys)
    assert found.all()
    np.testing.assert_allclose(got, vals)
    np.testing.assert_array_equal(sc, keys * 10)
    np.testing.assert_allclose(slots["m"], vals * 0.5)


def test_load_tier_partitions_by_device_shard_owner(tmp_path):
    """Multi-process LOCAL-store restore must place each row on the
    process whose DEVICE SHARDS own it at runtime (demote stores a row on
    the process owning ``shard_of(key, num_shards)``): a plain
    proc_size hash split strands rows on processes whose promote never
    probes them (ADVICE r4)."""
    from recommenders_addons_tpu.ops import hashing
    from recommenders_addons_tpu.ops.spill import HostKVStore

    var = de.Variable(name="tierck_map", dim=4, init_capacity=1 << 8)
    store = HostKVStore(dim=4)
    keys = np.arange(1, 257, dtype=np.int64)
    vals = np.repeat((keys % 17).astype(np.float32)[:, None], 4, axis=1)
    store.put(keys, vals)
    vdir = str(tmp_path)
    save_tier(store, var, vdir)

    num_shards, proc_size = 8, 2
    spp = num_shards // proc_size
    owner_proc = hashing.shard_of_np(keys, num_shards) // spp
    stores = {}
    total = 0
    for rank in range(proc_size):
        s2 = HostKVStore(dim=4)
        total += load_tier(s2, var, vdir, proc_size=proc_size,
                           proc_rank=rank, num_shards=num_shards)
        stores[rank] = s2
    assert total == len(keys)  # disjoint cover
    for rank in range(proc_size):
        mine = keys[owner_proc == rank]
        others = keys[owner_proc != rank]
        _, _, _, found = stores[rank].get(mine)
        assert found.all(), "rows must land on their shard-owner process"
        _, _, _, found_o = stores[rank].get(others)
        assert not found_o.any()


def test_save_tier_shared_store_dumps_once(tmp_path):
    """A shared (network) tier store holds the union across processes:
    only rank 0 dumps it — otherwise the checkpoint carries proc_size
    duplicate copies (ADVICE r4)."""
    from recommenders_addons_tpu.ops.spill import HostKVStore

    class SharedStore(HostKVStore):
        is_shared = True

    var = de.Variable(name="tierck_shared", dim=4, init_capacity=1 << 8)
    store = SharedStore(dim=4)
    keys = np.arange(1, 33, dtype=np.int64)
    vals = np.tile(keys[:, None].astype(np.float32), (1, 4))
    store.put(keys, vals)
    vdir = str(tmp_path)
    assert save_tier(store, var, vdir, proc_size=2, proc_rank=1) == 0
    assert save_tier(store, var, vdir, proc_size=2, proc_rank=0) == 32
    import glob as _glob
    import os as _os

    key_files = _glob.glob(_os.path.join(vdir, "tier", "*-keys"))
    assert len(key_files) == 1
