"""Unit tests for the core hashtable — semantics pinned against a NumPy dict
model, mirroring the reference's table-semantics suites
(cuckoo_hashtable_ops_test.py / hkv_hashtable_ops_test.py; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu.ops import hashing, hashtable as ht


def make_spec(**kw):
    kw.setdefault("dim", 4)
    kw.setdefault("capacity", 1024)
    kw.setdefault("bucket_size", 8)
    return ht.TableSpec(**kw)


def rand_keys(rng, n, dtype=np.int64):
    k = rng.integers(1, 2**62, size=n).astype(dtype)
    return np.unique(k)  # dedup (contract) — may shrink


def rows_for(keys, dim, dtype=np.float32):
    return np.stack(
        [np.full(dim, (k % 1000) + 0.5, dtype=dtype) for k in keys]
    )


class TestBasics:
    def test_create_empty(self):
        spec = make_spec()
        state = ht.create(spec)
        assert int(ht.size(spec, state)) == 0
        assert state.keys.shape == (spec.capacity,)
        assert state.values.shape == (spec.capacity, spec.dim)

    def test_insert_find(self):
        spec = make_spec()
        state = ht.create(spec)
        rng = np.random.default_rng(0)
        keys = rand_keys(rng, 100)
        vals = rows_for(keys, spec.dim)
        state = ht.upsert(spec, state, jnp.asarray(keys), jnp.asarray(vals))
        assert int(ht.size(spec, state)) == len(keys)
        got, found = ht.lookup(spec, state, jnp.asarray(keys))
        assert bool(np.all(found))
        np.testing.assert_allclose(np.asarray(got), vals)

    def test_missing_returns_default(self):
        spec = make_spec()
        state = ht.create(spec)
        keys = jnp.asarray([1, 2, 3], dtype=jnp.int64)
        got, found = ht.lookup(spec, state, keys, default_values=7.0)
        assert not np.any(np.asarray(found))
        np.testing.assert_allclose(np.asarray(got), 7.0)

    def test_overwrite(self):
        spec = make_spec()
        state = ht.create(spec)
        keys = jnp.asarray([10, 20], dtype=jnp.int64)
        v1 = jnp.ones((2, spec.dim))
        v2 = jnp.full((2, spec.dim), 3.0)
        state = ht.upsert(spec, state, keys, v1)
        state = ht.upsert(spec, state, keys, v2)
        assert int(ht.size(spec, state)) == 2
        got, _ = ht.lookup(spec, state, keys)
        np.testing.assert_allclose(np.asarray(got), 3.0)

    def test_remove_and_reinsert(self):
        spec = make_spec()
        state = ht.create(spec)
        keys = jnp.arange(1, 33, dtype=jnp.int64)
        vals = jnp.ones((32, spec.dim))
        state = ht.upsert(spec, state, keys, vals)
        state = ht.remove(spec, state, keys[:16])
        assert int(ht.size(spec, state)) == 16
        _, found = ht.lookup(spec, state, keys)
        np.testing.assert_array_equal(
            np.asarray(found), [False] * 16 + [True] * 16
        )
        state = ht.upsert(spec, state, keys[:16], vals[:16] * 2)
        assert int(ht.size(spec, state)) == 32

    def test_padding_keys_ignored(self):
        spec = make_spec()
        state = ht.create(spec)
        keys = jnp.asarray([5, spec.empty_key, 7], dtype=jnp.int64)
        vals = jnp.ones((3, spec.dim))
        state = ht.upsert(spec, state, keys, vals)
        assert int(ht.size(spec, state)) == 2
        _, found = ht.lookup(spec, state, keys)
        np.testing.assert_array_equal(np.asarray(found), [True, False, True])

    def test_clear(self):
        spec = make_spec()
        state = ht.create(spec)
        state = ht.upsert(
            spec, state, jnp.arange(5, dtype=jnp.int64) + 1, jnp.ones((5, 4))
        )
        state = ht.clear(spec, state)
        assert int(ht.size(spec, state)) == 0

    def test_int32_keys(self):
        spec = make_spec(key_dtype=jnp.int32)
        state = ht.create(spec)
        keys = jnp.asarray([1, 2, 3], dtype=jnp.int32)
        state = ht.upsert(spec, state, keys, jnp.ones((3, spec.dim)))
        got, found = ht.lookup(spec, state, keys)
        assert bool(np.all(found))

    @pytest.mark.parametrize(
        "vdt", [jnp.float32, jnp.bfloat16, jnp.float16, jnp.int32, jnp.int64,
                jnp.int8, jnp.float64]
    )
    def test_value_dtypes(self, vdt):
        # dtype matrix parity (reference README.md:245-257)
        spec = make_spec(value_dtype=vdt)
        state = ht.create(spec)
        keys = jnp.asarray([1, 2], dtype=jnp.int64)
        vals = jnp.ones((2, spec.dim), dtype=vdt)
        state = ht.upsert(spec, state, keys, vals)
        got, found = ht.lookup(spec, state, keys)
        assert got.dtype == vdt
        assert bool(np.all(found))


class TestAccum:
    def test_accum_semantics(self):
        # bp_v2: delta for existing, insert for new
        # (reference dynamic_embedding_variable.py:806-855)
        spec = make_spec()
        state = ht.create(spec)
        k_old = jnp.asarray([1, 2], dtype=jnp.int64)
        state = ht.upsert(spec, state, k_old, jnp.full((2, 4), 10.0))
        keys = jnp.asarray([1, 2, 3], dtype=jnp.int64)
        deltas = jnp.full((3, 4), 1.0)
        values_new = jnp.full((3, 4), 5.0)
        state = ht.accum(spec, state, keys, deltas, values_new)
        got, found = ht.lookup(spec, state, keys)
        assert bool(np.all(found))
        np.testing.assert_allclose(np.asarray(got[0]), 11.0)
        np.testing.assert_allclose(np.asarray(got[1]), 11.0)
        np.testing.assert_allclose(np.asarray(got[2]), 5.0)


class TestEviction:
    def test_bucket_eviction_keeps_high_scores(self):
        # One bucket (capacity == bucket_size): inserting beyond capacity must
        # evict the lowest-score keys (HKV semantics,
        # hkv_hashtable_evict_test.py:110-527).
        spec = ht.TableSpec(dim=2, capacity=8, bucket_size=8)
        state = ht.create(spec)
        keys = jnp.arange(1, 9, dtype=jnp.int64)
        scores = jnp.arange(10, 18, dtype=jnp.int64)
        state = ht.upsert(
            spec, state, keys, jnp.ones((8, 2)), scores=scores
        )
        assert int(ht.size(spec, state)) == 8
        # new key with high score evicts lowest-score key (key 1, score 10)
        state = ht.upsert(
            spec,
            state,
            jnp.asarray([100], dtype=jnp.int64),
            jnp.ones((1, 2)),
            scores=jnp.asarray([99], dtype=jnp.int64),
        )
        assert int(ht.size(spec, state)) == 8
        _, found1 = ht.lookup(spec, state, jnp.asarray([1], dtype=jnp.int64))
        _, found100 = ht.lookup(
            spec, state, jnp.asarray([100], dtype=jnp.int64)
        )
        assert not bool(found1[0])
        assert bool(found100[0])

    def test_eviction_resets_slot_columns(self):
        spec = ht.TableSpec(dim=2, capacity=8, bucket_size=8)
        state = ht.with_slot(ht.create(spec), "m")
        keys = jnp.arange(1, 9, dtype=jnp.int64)
        state = ht.upsert(spec, state, keys, jnp.ones((8, 2)),
                          scores=jnp.arange(8, dtype=jnp.int64))
        # poison slot column (packed layout: slot "m" columns of rows)
        off = state.slot_offset("m")
        poisoned = state.rows_logical.at[:, off:off + 2].set(9.0)
        state = state.with_rows_logical(poisoned)
        state = ht.upsert(
            spec, state, jnp.asarray([50], dtype=jnp.int64),
            jnp.ones((1, 2)), scores=jnp.asarray([100], dtype=jnp.int64),
        )
        slot, found = ht.find(spec, state, jnp.asarray([50], dtype=jnp.int64))
        assert bool(found[0])
        np.testing.assert_allclose(
            np.asarray(state.slots["m"][slot[0]]), 0.0
        )

    def test_evict_lowest_global(self):
        spec = make_spec()
        state = ht.create(spec)
        keys = jnp.arange(1, 65, dtype=jnp.int64)
        scores = jnp.arange(1, 65, dtype=jnp.int64)
        state = ht.upsert(spec, state, keys, jnp.ones((64, 4)), scores=scores)
        state = ht.evict_lowest(spec, state, 16)
        assert int(ht.size(spec, state)) == 48
        _, found = ht.lookup(spec, state, keys)
        # lowest-score 16 keys (scores 1..16) evicted
        np.testing.assert_array_equal(
            np.asarray(found), [False] * 16 + [True] * 48
        )

    def test_lfu_score_add(self):
        spec = make_spec()
        state = ht.create(spec)
        keys = jnp.asarray([7], dtype=jnp.int64)
        for _ in range(3):
            state = ht.upsert(
                spec, state, keys, jnp.ones((1, 4)),
                scores=jnp.ones((1,), jnp.int64), score_mode="add",
            )
        slot, found = ht.find(spec, state, keys)
        assert int(state.scores[slot[0]]) == 3


class TestRandomizedVsDict:
    @pytest.mark.parametrize("bucket_size", [8, 64])
    def test_fuzz_against_dict(self, bucket_size):
        spec = ht.TableSpec(dim=3, capacity=2048, bucket_size=bucket_size)
        state = ht.create(spec)
        model = {}
        rng = np.random.default_rng(42)
        upsert_j = jax.jit(lambda s, k, v: ht.upsert(spec, s, k, v))
        remove_j = jax.jit(lambda s, k: ht.remove(spec, s, k))
        lookup_j = jax.jit(lambda s, k: ht.lookup(spec, s, k))
        for step in range(20):
            op = rng.choice(["upsert", "remove", "lookup"])
            keys = np.unique(rng.integers(1, 500, size=64).astype(np.int64))
            if op == "upsert":
                vals = rng.normal(size=(len(keys), 3)).astype(np.float32)
                state = upsert_j(state, jnp.asarray(keys), jnp.asarray(vals))
                for k, v in zip(keys, vals):
                    model[int(k)] = v
            elif op == "remove":
                state = remove_j(state, jnp.asarray(keys))
                for k in keys:
                    model.pop(int(k), None)
            got, found = lookup_j(state, jnp.asarray(keys))
            for i, k in enumerate(keys):
                if int(k) in model:
                    assert bool(found[i]), f"step {step}: key {k} lost"
                    np.testing.assert_allclose(
                        np.asarray(got[i]), model[int(k)], rtol=1e-6
                    )
                else:
                    assert not bool(found[i])
        assert int(ht.size(spec, state)) == len(model)

    def test_batch_larger_than_bucket_same_bucket(self):
        # >bucket_size new keys in ONE bucket in one batch: the overflow keys
        # are dropped (documented bound), but never corrupt other entries.
        spec = ht.TableSpec(dim=2, capacity=16, bucket_size=8)
        state = ht.create(spec)
        # craft 12 keys in bucket 0
        all_k = np.arange(1, 100000, dtype=np.int64)
        b = np.asarray(
            hashing.bucket_of(jnp.asarray(all_k), spec.num_buckets)
        )
        same = all_k[b == 0][:12]
        assert len(same) == 12
        state = ht.upsert(
            spec, state, jnp.asarray(same), jnp.ones((12, 2))
        )
        assert int(ht.size(spec, state)) == 8  # bucket holds 8
        got, found = ht.lookup(spec, state, jnp.asarray(same))
        assert int(np.sum(np.asarray(found))) == 8


class TestUniqueStatic:
    def test_unique_inverse(self):
        keys = jnp.asarray([5, 3, 5, 9, 3, 3], dtype=jnp.int64)
        uniq, inv = ht.unique_static(keys)
        recon = uniq[inv]
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(keys))
        n_unique = int(np.sum(np.asarray(uniq) != hashing.EMPTY_KEY))
        assert n_unique == 3


class TestTakeElem:
    """take_elem reformulates vec[idx] as a row gather + lane select
    (7x faster on chip, tools/plan_bench.py); must stay value- and
    dtype-exact under x64 (jnp.sum promotion regression)."""

    def test_matches_indexing_int32(self):
        rng = np.random.default_rng(3)
        vec = jnp.asarray(rng.integers(-1000, 1000, 1000, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, 1000, 257, dtype=np.int32))
        out = ht.take_elem(vec, idx)
        assert out.dtype == vec.dtype
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(vec)[np.asarray(idx)])

    def test_matches_indexing_int64_and_float(self):
        rng = np.random.default_rng(4)
        for dt in (np.int64, np.float32):
            vec = jnp.asarray(
                rng.integers(-50, 50, 300).astype(dt))
            idx = jnp.asarray(rng.integers(0, 300, 64, dtype=np.int32))
            out = ht.take_elem(vec, idx)
            assert out.dtype == vec.dtype
            np.testing.assert_array_equal(
                np.asarray(out), np.asarray(vec)[np.asarray(idx)])

    def test_unpadded_multiple_of_128(self):
        vec = jnp.arange(256, dtype=jnp.int32)
        idx = jnp.asarray([0, 127, 128, 255], jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(ht.take_elem(vec, idx)), [0, 127, 128, 255])


class TestHashing:
    def test_mix_distribution(self):
        keys = jnp.arange(1, 10001, dtype=jnp.int64)
        b = np.asarray(hashing.bucket_of(keys, 64))
        counts = np.bincount(b, minlength=64)
        assert counts.min() > 80  # ~156 expected, loose uniformity bound

    def test_shard_bucket_decorrelated(self):
        keys = jnp.arange(1, 4097, dtype=jnp.int64)
        s = np.asarray(hashing.shard_of(keys, 4))
        b = np.asarray(hashing.bucket_of(keys, 64))
        # within one shard, buckets still uniform
        counts = np.bincount(b[s == 0], minlength=64)
        assert counts.min() > 0

    def test_hash_strings(self):
        out = hashing.hash_strings(["user:1", "user:2", "user:1"])
        assert out[0] == out[2]
        assert out[0] != out[1]
        assert out.dtype == np.int64


def test_segment_sum_rows_matches_xla_reference():
    """The MXU chunk-dedup grad combine must match a float64 reference
    exactly-enough on every shape class: chunk-aligned, ragged tail,
    sub-chunk, zipf-duplicate targets, and out-of-range drops."""
    rng = np.random.default_rng(3)
    for n, d, nseg, pattern in (
        (1024, 16, 1024, "zipf"),
        (1000, 8, 1000, "zipf"),
        (129, 4, 60, "uniform"),
        (128, 4, 128, "uniform"),
        (5, 3, 7, "uniform"),
    ):
        g = rng.normal(size=(n, d)).astype(np.float32)
        if pattern == "zipf":
            seg = (np.minimum(rng.zipf(1.3, size=n), nseg * 4)
                   * 2654435761 % nseg).astype(np.int32)
        else:
            seg = rng.integers(0, nseg, size=n).astype(np.int32)
        seg[: min(3, n)] = nseg + 1  # out-of-range: dropped
        want = np.zeros((nseg, d), np.float64)
        m = (seg >= 0) & (seg < nseg)
        np.add.at(want, seg[m], g[m].astype(np.float64))
        got = np.asarray(jax.jit(
            lambda gg, ss: ht.segment_sum_rows(gg, ss, nseg)
        )(jnp.asarray(g), jnp.asarray(seg)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
