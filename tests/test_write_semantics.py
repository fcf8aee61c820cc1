"""Duplicate-key and exists-guard semantics on every public write op.

The reference C++ tables apply duplicate batch keys sequentially (one
insert_or_assign / insert_or_accum call per element,
cuckoo_hashtable_op.cc:114-182), so duplicates never create two stored
copies of a key. These tests pin the deterministic batch equivalents:
last-write-wins for assign ops, summed deltas for accum, and the
exists-mask consistency guard (cuckoohash_map.hh:620-632).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops import hashing
from recommenders_addons_tpu.parallel.sharded import ShardedVariable


def make_var(**kw):
    kw.setdefault("name", "dupe_var")
    kw.setdefault("dim", 4)
    kw.setdefault("init_capacity", 1024)
    kw.setdefault("bucket_size", 8)
    return de.Variable(**kw)


def rows(*scalars, d=4):
    return jnp.stack([jnp.full((d,), float(s)) for s in scalars])


class TestVariableDuplicates:
    def test_upsert_duplicates_last_write_wins(self):
        var = make_var()
        state = var.upsert(var.init(), jnp.asarray([7, 7, 8], jnp.int64),
                           rows(1.0, 2.0, 9.0))
        assert int(var.size(state)) == 2
        out = var.lookup(state, jnp.asarray([7, 8], jnp.int64))
        np.testing.assert_allclose(np.asarray(out[0]), 2.0)  # last occurrence
        np.testing.assert_allclose(np.asarray(out[1]), 9.0)

    def test_accum_duplicate_missing_keys_single_copy(self):
        """The ADVICE repro: accum of [7, 7, 9] on a fresh table must store
        key 7 exactly ONCE (was: two slots, size 3)."""
        var = make_var()
        state = var.accum(
            var.init(),
            jnp.asarray([7, 7, 9], jnp.int64),
            rows(0.0, 0.0, 0.0),
            rows(1.0, 2.0, 5.0),
        )
        assert int(var.size(state)) == 2
        out, found = var.lookup(state, jnp.asarray([7, 9], jnp.int64),
                                return_exists=True)
        assert bool(found.all())
        # removing then probing again must fully erase the single copy
        state = var.remove(state, jnp.asarray([7], jnp.int64))
        _, found2 = var.lookup(state, jnp.asarray([7], jnp.int64),
                               return_exists=True)
        assert not bool(found2.any())
        assert int(var.size(state)) == 1

    def test_accum_duplicates_on_existing_sum_deltas(self):
        var = make_var()
        keys = jnp.asarray([1], jnp.int64)
        state = var.upsert(var.init(), keys, rows(10.0))
        # two duplicate accums in one batch: deltas +1 and +2 both apply
        state = var.accum(
            state,
            jnp.asarray([1, 1], jnp.int64),
            rows(10.0, 10.0),
            rows(11.0, 12.0),
        )
        out = var.lookup(state, keys)
        np.testing.assert_allclose(np.asarray(out[0]), 13.0)

    def test_import_batch_duplicates_last_wins(self):
        var = make_var()
        state = var.import_batch(
            var.init(),
            jnp.asarray([5, 5, 6], jnp.int64),
            rows(1.0, 4.0, 6.0),
            scores=jnp.asarray([10, 20, 30]),
        )
        assert int(var.size(state)) == 2
        out = var.lookup(state, jnp.asarray([5, 6], jnp.int64))
        np.testing.assert_allclose(np.asarray(out[0]), 4.0)
        k, s, m = var.export_keys_and_scores(state)
        k, s = np.asarray(k)[np.asarray(m)], np.asarray(s)[np.asarray(m)]
        assert dict(zip(k.tolist(), s.tolist())) == {5: 20, 6: 30}


class TestAccumExistsGuard:
    def test_matching_exists_applies(self):
        var = make_var()
        state = var.upsert(var.init(), jnp.asarray([1], jnp.int64),
                           rows(10.0))
        state = var.accum(
            state,
            jnp.asarray([1, 2], jnp.int64),
            rows(10.0, 0.0),
            rows(12.0, 7.0),
            exists=jnp.asarray([True, False]),
        )
        out = var.lookup(state, jnp.asarray([1, 2], jnp.int64))
        np.testing.assert_allclose(np.asarray(out[0]), 12.0)  # delta applied
        np.testing.assert_allclose(np.asarray(out[1]), 7.0)  # inserted

    def test_stale_exists_skipped(self):
        """exists captured at lookup time no longer matches -> write dropped
        (reference accumrase_fn: neither branch fires,
        cuckoohash_map.hh:620-632)."""
        var = make_var()
        state = var.upsert(var.init(), jnp.asarray([1], jnp.int64),
                           rows(10.0))
        state = var.accum(
            state,
            jnp.asarray([1, 2], jnp.int64),
            rows(10.0, 0.0),
            rows(99.0, 55.0),
            # claims: key 1 was missing (it exists), key 2 existed (it's
            # missing) -> both writes must be skipped
            exists=jnp.asarray([False, True]),
        )
        out, found = var.lookup(state, jnp.asarray([1, 2], jnp.int64),
                                return_exists=True)
        np.testing.assert_allclose(np.asarray(out[0]), 10.0)  # untouched
        assert not bool(found[1])  # never inserted
        assert int(var.size(state)) == 1


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("ep",))


class TestShardedDuplicates:
    def test_sharded_upsert_duplicates(self, mesh):
        var = make_var(name="sh_dupe", init_capacity=1 << 13)
        svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
        state = svar.init()
        keys = jnp.asarray([7, 7, 8, 9, 9, 9, 10, 11], jnp.int64)
        vals = rows(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
        state = svar.upsert(state, keys, vals)
        assert int(svar.size(state)) == 5
        out = svar.lookup(
            state, jnp.asarray([7, 9, 8, 10, 11, 7, 9, 8], jnp.int64)
        )
        np.testing.assert_allclose(np.asarray(out[0]), 2.0)
        np.testing.assert_allclose(np.asarray(out[1]), 6.0)

    def test_sharded_accum_duplicates_sum(self, mesh):
        var = make_var(name="sh_acc_dupe", init_capacity=1 << 13)
        svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
        state = svar.init()
        base = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8], jnp.int64)
        state = svar.upsert(state, base, rows(*([10.0] * 8)))
        # duplicate accum on key 1: both deltas must land
        keys = jnp.asarray([1, 1, 2, 3, 4, 5, 6, 7], jnp.int64)
        old = rows(*([10.0] * 8))
        new = rows(11.0, 12.0, 13.0, 10.0, 10.0, 10.0, 10.0, 10.0)
        state = svar.accum(state, keys, old, new)
        out = svar.lookup(state, base)
        np.testing.assert_allclose(np.asarray(out[0]), 13.0)  # 10 + 1 + 2
        np.testing.assert_allclose(np.asarray(out[1]), 13.0)

    def test_sharded_accum_exists_guard(self, mesh):
        var = make_var(name="sh_acc_ex", init_capacity=1 << 13)
        svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
        state = svar.init()
        present = jnp.asarray([1, 2, 3, 4], jnp.int64)
        state = svar.upsert(state, present, rows(10.0, 10.0, 10.0, 10.0))
        keys = jnp.asarray([1, 2, 50, 60, 5, 6, 7, 8], jnp.int64)
        old = rows(*([10.0] * 8))
        new = rows(*([20.0] * 8))
        # key 1 match(True), key 2 stale(False), key 50 stale(True),
        # key 60 match(False -> insert); rest match(False -> insert)
        ex = jnp.asarray(
            [True, False, True, False, False, False, False, False])
        state = svar.accum(state, keys, old, new, exists=ex)
        out = svar.lookup(
            state, jnp.asarray([1, 2, 50, 60, 1, 2, 1, 2], jnp.int64)
        )
        np.testing.assert_allclose(np.asarray(out[0]), 20.0)
        np.testing.assert_allclose(np.asarray(out[1]), 10.0)  # skipped
        # key 50 must not have been inserted; key 60 must have been
        k, _, m = jax.device_get(svar.export(state))
        live = set(np.asarray(k)[np.asarray(m)].reshape(-1).tolist())
        assert 50 not in live and 60 in live

    def test_bulk_upsert_skewed_owners_no_loss(self, mesh):
        """Keys crafted so one shard owns far more than batch/S — the
        worst-case routing capacity must place every key (was: silent
        drops past the capacity_factor budget)."""
        var = make_var(name="sh_skew", init_capacity=1 << 13)
        svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
        state = svar.init()
        pool = np.arange(1, 4097, dtype=np.int64)
        owner = hashing.shard_of_np(pool, svar.num_shards)
        skewed = pool[owner == 0][:256]  # all owned by shard 0
        assert len(skewed) == 256
        vals = np.tile(skewed[:, None].astype(np.float32), (1, 4))
        state = svar.upsert(state, jnp.asarray(skewed), jnp.asarray(vals))
        assert int(svar.size(state)) == 256
        out = svar.lookup(state, jnp.asarray(skewed[:256]))
        np.testing.assert_allclose(np.asarray(out), vals[:256])


def test_shard_of_np_matches_jax():
    keys = np.concatenate([
        np.arange(-500, 500, dtype=np.int64),
        np.random.default_rng(0).integers(
            np.iinfo(np.int64).min + 1, np.iinfo(np.int64).max,
            size=512, dtype=np.int64,
        ),
    ])
    for s in (2, 3, 8):
        np.testing.assert_array_equal(
            hashing.shard_of_np(keys, s),
            np.asarray(hashing.shard_of(jnp.asarray(keys), s)),
        )
    keys32 = keys.astype(np.int32)
    np.testing.assert_array_equal(
        hashing.shard_of_np(keys32, 4),
        np.asarray(hashing.shard_of(jnp.asarray(keys32), 4)),
    )
