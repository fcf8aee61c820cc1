"""Fused dedup+probe+plan (`hashtable.plan_lookup`) equivalence with the
two-pass path (`unique_static` + `_plan_writes`) it replaces on the training
hot path. Same conflict-freedom, found-ness, eviction-count, and committed
key->value semantics; slot placement and drop identity are order-dependent
in BOTH paths and not pinned."""

import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu.ops import hashtable as ht


@pytest.fixture
def pressured_state():
    spec = ht.TableSpec(dim=4, capacity=256, bucket_size=8)
    state = ht.create(spec)
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(1, 1000, 300, dtype=np.int64))
    u0, _ = ht.unique_static(k0)
    state = ht.commit(
        spec, state, u0, values=jnp.ones((u0.shape[0], 4)),
        scores=jnp.arange(u0.shape[0], dtype=jnp.int32),
    )
    return spec, state, rng


def _as_map(spec, st):
    k, v, m = ht.export(spec, st)
    k, v, m = np.asarray(k), np.asarray(v), np.asarray(m)
    return dict(zip(k[m].tolist(), v[m][:, 0].tolist()))


def test_plan_lookup_matches_two_pass(pressured_state):
    spec, state, rng = pressured_state
    for trial in range(10):
        keys = jnp.asarray(rng.integers(1, 2000, 128, dtype=np.int64))
        uniq_a, _ = ht.unique_static(keys)
        plan_a = ht._plan_writes(spec, state, uniq_a)
        uniq_b, inv_b, plan_b, nd_b = ht.plan_lookup(spec, state, keys)

        # dedup: inverse reconstructs, same unique set
        np.testing.assert_array_equal(
            np.asarray(uniq_b)[np.asarray(inv_b)], np.asarray(keys))
        live = lambda u: set(
            np.asarray(u)[np.asarray(u) != spec.empty_key].tolist())
        assert live(uniq_a) == live(uniq_b)

        # found flags agree per key
        fa = dict(zip(np.asarray(uniq_a).tolist(),
                      np.asarray(plan_a[1]).tolist()))
        fb = dict(zip(np.asarray(uniq_b).tolist(),
                      np.asarray(plan_b[1]).tolist()))
        for k in fa:
            if k != spec.empty_key:
                assert fa[k] == fb[k]

        # same number of dropped keys (identity is order-dependent)
        da = set(np.asarray(uniq_a)[np.asarray(plan_a[3])].tolist())
        db = set(np.asarray(uniq_b)[np.asarray(plan_b[3])].tolist())
        assert len(da) == len(db)

        # committing each plan yields the same key->value map modulo drops
        def commit_with(uniq, plan):
            vals = jnp.tile(
                jnp.asarray(np.asarray(uniq), jnp.float32)[:, None], (1, 4))
            return ht.commit_planned(
                spec, state, uniq, plan, values=vals,
                scores=jnp.full(uniq.shape, 99, jnp.int32))

        ma = _as_map(spec, commit_with(uniq_a, plan_a))
        mb = _as_map(spec, commit_with(uniq_b, plan_b))
        assert (set(ma) ^ set(mb)) <= (da | db)
        for k in set(ma) & set(mb):
            assert ma[k] == mb[k]

        # conflict-freedom: placed slots distinct, in the key's bucket
        slot, found, ins, drop = plan_b
        placed = np.asarray(found | ins)
        s = np.asarray(slot)[placed]
        assert len(set(s.tolist())) == len(s)
        bk = np.asarray(
            ht.hashing.bucket_of(uniq_b, spec.num_buckets))[placed]
        assert ((s // spec.bucket_size) == bk).all()


def test_kth_lowest_slot_matches_argsort():
    rng = np.random.default_rng(1)
    sc = jnp.asarray(rng.integers(0, 50, (64, 16), dtype=np.int32))
    k = jnp.asarray(rng.integers(0, 16, (64,), dtype=np.int32))
    got = np.asarray(ht._kth_lowest_slot(sc, k))
    perm = np.argsort(np.asarray(sc), axis=-1, kind="stable")
    want = np.take_along_axis(perm, np.asarray(k)[:, None], axis=-1)[:, 0]
    np.testing.assert_array_equal(got, want)


def test_plan_lookup_fast_hit_path(pressured_state):
    """All-hit batches take the sort-free scatter-min path; mixed batches
    fall back to the general plan — both produce valid plans."""
    spec, state, rng = pressured_state
    k, _, m = ht.export(spec, state)
    live = np.asarray(k)[np.asarray(m)][:40]

    batch = jnp.asarray(np.concatenate([live, live[:10], live[5:15]]))
    uniq, inv, (slot, found, ins, drop) = ht.plan_lookup_fast(
        spec, state, batch)
    np.testing.assert_array_equal(
        np.asarray(uniq)[np.asarray(inv)], np.asarray(batch))
    assert not bool(np.asarray(ins).any())
    assert not bool(np.asarray(drop).any())
    reps = np.asarray(found)
    assert reps.sum() == 40  # one representative per distinct key
    s = np.asarray(slot)[reps]
    assert len(set(s.tolist())) == 40

    mix = jnp.asarray(np.concatenate(
        [live[:10], np.asarray([777777, 888888, 777777], np.int64)]))
    uniq2, inv2, (slot2, found2, ins2, drop2) = ht.plan_lookup_fast(
        spec, state, mix)
    np.testing.assert_array_equal(
        np.asarray(uniq2)[np.asarray(inv2)], np.asarray(mix))
    assert int(np.asarray(ins2).sum()) == 2  # dup missing key dedup'd


def test_plan_lookup_single_bucket():
    spec = ht.TableSpec(dim=2, capacity=8, bucket_size=8)
    state = ht.create(spec)
    keys = jnp.asarray([3, 1, 3, 2], jnp.int64)
    uniq, inv, (slot, found, ins, drop), _nd = ht.plan_lookup(
        spec, state, keys)
    np.testing.assert_array_equal(
        np.asarray(uniq)[np.asarray(inv)], np.asarray(keys))
    assert not bool(np.asarray(found).any())
    placed = np.asarray(slot)[np.asarray(ins)]
    assert len(set(placed.tolist())) == len(placed)


class TestUnmix:
    """hashing.unmix inverts the key mixer exactly — the miss-path sort
    carries only the mixed rotation and recovers original keys from it
    (plan_lookup's two-operand sort)."""

    def test_unmix64_roundtrip(self):
        rng = np.random.default_rng(3)
        keys = jnp.asarray(
            rng.integers(-(2**62), 2**62, 4096, dtype=np.int64))
        z = ht.hashing.mix64(keys)
        back = ht.hashing.unmix64(z).astype(jnp.int64)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(keys))

    def test_unmix64_extremes(self):
        keys = jnp.asarray(
            [0, 1, -1, 2**63 - 1, -(2**63), 42], jnp.int64)
        back = ht.hashing.unmix64(ht.hashing.mix64(keys)).astype(jnp.int64)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(keys))

    def test_unmix32_roundtrip(self):
        rng = np.random.default_rng(4)
        keys = jnp.asarray(
            rng.integers(-(2**31), 2**31, 4096, dtype=np.int32))
        back = ht.hashing.unmix(ht.hashing.mix(keys), jnp.int32)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(keys))


class TestPlanLookupTrain:
    """plan_lookup_train = plan + packed gather + value-row blend with the
    whole pipeline branched on the all-hit case; both branches must agree
    with the unfused sequence (plan_lookup_fast + gather_packed + blend)."""

    def _init_fn(self, spec):
        def init_fn(u):
            # per-key deterministic rows so branch equivalence is checkable
            return jnp.tile(
                (u % 97).astype(jnp.float32)[:, None], (1, spec.dim))
        return init_fn

    def _reference(self, spec, state, batch, init_fn):
        uniq, inv, plan = ht.plan_lookup_fast(spec, state, batch)
        slot, found = plan[0], plan[1]
        packed = ht.gather_packed(state, slot, found)
        rows = jnp.where(found[:, None], packed[:, : state.dim],
                         init_fn(uniq).astype(state.value_dtype))
        return uniq, inv, plan, rows

    @pytest.mark.parametrize("case", ["all_hit", "mixed"])
    def test_matches_unfused(self, pressured_state, case):
        spec, state, rng = pressured_state
        k, _, m = ht.export(spec, state)
        live = np.asarray(k)[np.asarray(m)][:48]
        if case == "all_hit":
            batch = jnp.asarray(np.concatenate([live, live[:16]]))
        else:
            batch = jnp.asarray(np.concatenate(
                [live[:16], np.asarray([606060, 707070, 606060], np.int64)]))
        init_fn = self._init_fn(spec)

        (uniq, inv, plan, packed, no_dups, aligned, nlo,
         nhi) = ht.plan_lookup_train(
            spec, state, batch, init_fn)
        rows = packed[:, : state.dim]  # plan_lookup_train invariant
        r_uniq, r_inv, r_plan, r_rows = self._reference(
            spec, state, batch, init_fn)

        # same ids per position and same found-ness per key
        np.testing.assert_array_equal(
            np.asarray(uniq)[np.asarray(inv)], np.asarray(batch))
        fa = dict(zip(np.asarray(uniq).tolist(),
                      np.asarray(plan[1]).tolist()))
        fb = dict(zip(np.asarray(r_uniq).tolist(),
                      np.asarray(r_plan[1]).tolist()))
        for key in fb:
            if key != spec.empty_key:
                assert fa[key] == fb[key], key
        # same per-key value rows at representative positions
        va = {
            int(u): np.asarray(rows)[i]
            for i, u in enumerate(np.asarray(uniq))
            if u != spec.empty_key and np.asarray(plan[1] | plan[2])[i]
        }
        vb = {
            int(u): np.asarray(r_rows)[i]
            for i, u in enumerate(np.asarray(r_uniq))
            if u != spec.empty_key and np.asarray(r_plan[1] | r_plan[2])[i]
        }
        assert set(va) == set(vb)
        for key in vb:
            np.testing.assert_allclose(va[key], vb[key], rtol=1e-6)

    def test_pristine_branch_identity_dedup(self, pressured_state):
        """Distinct all-hit batches take the pristine path: uniq IS the
        batch, inverse IS the iota, every key is its own representative."""
        spec, state, rng = pressured_state
        k, _, m = ht.export(spec, state)
        live = np.asarray(k)[np.asarray(m)][:48]
        batch = jnp.asarray(live)
        (uniq, inv, (slot, found, ins, drop), packed, no_dups, aligned, _,
         _) = ht.plan_lookup_train(spec, state, batch, self._init_fn(spec))
        assert bool(no_dups)
        np.testing.assert_array_equal(np.asarray(uniq), live)
        np.testing.assert_array_equal(
            np.asarray(inv), np.arange(len(live)))
        assert bool(np.asarray(found).all())
        # packed value columns are the stored rows
        vals = np.asarray(packed)[:, : spec.dim]
        want = np.asarray(ht.lookup(spec, state, batch)[0])
        np.testing.assert_allclose(vals, want, rtol=1e-6)

    def test_miss_branch_commits_inserted_keys(self, pressured_state):
        """The miss branch writes inserted keys into the returned key
        planes at lookup time (the apply then only scatters scores)."""
        spec, state, rng = pressured_state
        batch = jnp.asarray([909090, 808080, 909090], jnp.int64)
        (uniq, inv, (slot, found, ins, drop), packed, no_dups, aligned, nlo,
         nhi) = ht.plan_lookup_train(spec, state, batch, self._init_fn(spec))
        assert int(np.asarray(ins).sum()) == 2
        st2 = state.replace(key_lo=nlo, key_hi=nhi)
        _, found2 = ht.find(spec, st2, jnp.asarray([909090, 808080],
                                                   jnp.int64))
        assert bool(np.asarray(found2).all())
        # the original state's planes are untouched (lookup stays pure)
        _, found0 = ht.find(spec, state, jnp.asarray([909090], jnp.int64))
        assert not bool(np.asarray(found0).any())

    def test_all_hit_branch_skips_insert(self, pressured_state):
        spec, state, rng = pressured_state
        k, _, m = ht.export(spec, state)
        live = np.asarray(k)[np.asarray(m)][:32]
        batch = jnp.asarray(np.concatenate([live, live[:8]]))
        (uniq, inv, (slot, found, ins, drop), packed, no_dups, aligned, _,
         _) = ht.plan_lookup_train(spec, state, batch, self._init_fn(spec))
        assert not bool(np.asarray(ins).any())
        assert not bool(np.asarray(drop).any())
        assert int(np.asarray(found).sum()) == 32
        assert not bool(no_dups)  # batch repeats live[:8]

    def test_dup_hit_rows_occurrence_aligned(self, pressured_state):
        """The all-hit dedup branch gathers PER OCCURRENCE: every
        duplicate position carries its own (shared) value row and
        rows_aligned is True, so embedding_lookup skips the [N, D]
        expansion gather on dup-heavy traffic (the DLRM profile's whole
        model-vs-table gap, tools/profile_dlrm.py)."""
        spec, state, rng = pressured_state
        k, _, m = ht.export(spec, state)
        live = np.asarray(k)[np.asarray(m)][:32]
        batch = jnp.asarray(np.concatenate([live, live[:8]]))
        (uniq, inv, (slot, found, ins, drop), packed, no_dups, aligned,
         _, _) = ht.plan_lookup_train(
            spec, state, batch, self._init_fn(spec))
        assert not bool(no_dups)
        assert bool(aligned)
        rows = np.asarray(packed)[:, : spec.dim]
        want = np.asarray(ht.lookup(spec, state, batch)[0])
        np.testing.assert_allclose(rows, want, rtol=1e-6)
