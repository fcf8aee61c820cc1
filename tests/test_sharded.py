"""Sharded (mesh all-to-all) table tests on the virtual 8-device CPU mesh —
parity against the single-shard Variable (reference analog: Horovod
all-to-all + device-list sharding tests, horovod_sync_train_test.py,
dynamic_embedding_variable_test.py — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu import parallel


# quick-iteration opt-out: this file dominates suite wall-time
pytestmark = pytest.mark.heavy

DIM = 8


@pytest.fixture(scope="module")
def mesh():
    return parallel.create_mesh(num_devices=4)


def make_sharded(mesh, name, **kw):
    kw.setdefault("dim", DIM)
    kw.setdefault("init_capacity", 4096)
    kw.setdefault("bucket_size", 8)
    var = de.Variable(name=name, **kw)
    return parallel.ShardedVariable(var=var, mesh=mesh)


class TestShardedBasics:
    def test_init_sharding(self, mesh):
        sv = make_sharded(mesh, "sb_init")
        state = sv.init()
        assert state.keys.shape == (4, sv.spec.capacity)
        # each leaf sharded over the axis
        assert state.keys.sharding.spec == jax.sharding.PartitionSpec("ep")
        assert int(sv.size(state)) == 0

    def test_upsert_lookup_roundtrip(self, mesh):
        sv = make_sharded(mesh, "sb_round")
        state = sv.init()
        rng = np.random.default_rng(3)
        keys = np.unique(rng.integers(1, 2**60, size=64).astype(np.int64))
        n = len(keys) - len(keys) % 4
        keys = keys[:n]
        vals = np.repeat(
            (keys % 97).astype(np.float32)[:, None], DIM, axis=1
        )
        state = sv.upsert(state, jnp.asarray(keys), jnp.asarray(vals))
        assert int(sv.size(state)) == n
        out = sv.lookup(state, jnp.asarray(keys))
        np.testing.assert_allclose(np.asarray(out), vals)

    def test_missing_keys_default(self, mesh):
        sv = make_sharded(mesh, "sb_miss", initializer=2.5)
        state = sv.init()
        ids = jnp.arange(1, 9, dtype=jnp.int64)
        out = sv.lookup(state, ids)
        np.testing.assert_allclose(np.asarray(out), 2.5)


class TestShardedTrainingParity:
    def test_matches_single_shard_training(self, mesh):
        """Same data, same optimizer: sharded result == single-shard result."""
        init = jax.nn.initializers.normal(0.1)
        v_single = de.Variable(
            name="par_var", dim=DIM, init_capacity=4096, initializer=init
        )
        sv = make_sharded(mesh, "par_var", initializer=init)
        assert sv.var.seed is None and v_single.seed is None

        s_single = v_single.init()
        s_shard = sv.init()
        opt_a = de.Adagrad(0.1)
        opt_b = de.Adagrad(0.1)

        @jax.jit
        def step_single(state, ids, tgt, t):
            emb, ctx = v_single.embedding_lookup(state, ids)
            g = jax.grad(lambda e: 0.5 * jnp.sum((e - tgt) ** 2))(emb)
            return v_single.apply_gradients(state, ctx, g, opt_a, step=t)

        @jax.jit
        def step_shard(state, ids, tgt, t):
            emb, ctx = sv.embedding_lookup(state, ids)
            g = jax.grad(lambda e: 0.5 * jnp.sum((e - tgt) ** 2))(emb)
            return sv.apply_gradients(state, ctx, g, opt_b, step=t)

        rng = np.random.default_rng(11)
        all_ids = np.arange(1, 33, dtype=np.int64)
        for t in range(10):
            # duplicate ids across device blocks on purpose
            ids = rng.choice(all_ids, size=16, replace=True).astype(np.int64)
            tgt = jnp.asarray(
                rng.normal(size=(16, DIM)).astype(np.float32)
            )
            jids = jnp.asarray(ids)
            s_single = step_single(s_single, jids, tgt, t)
            s_shard = step_shard(s_shard, jids, tgt, t)

        probe = jnp.asarray(all_ids)
        out_single, ex_s = v_single.lookup(s_single, probe, return_exists=True)
        out_shard = sv.lookup(s_shard, probe)
        np.testing.assert_array_equal(
            int(v_single.size(s_single)), int(sv.size(s_shard))
        )
        np.testing.assert_allclose(
            np.asarray(out_shard), np.asarray(out_single), rtol=1e-5,
            atol=1e-6,
        )

    def test_no_dropped_keys_at_default_factor(self, mesh):
        sv = make_sharded(mesh, "drop_var")
        state = sv.init()
        ids = jnp.asarray(
            np.random.default_rng(0).integers(1, 2**60, size=64),
            dtype=jnp.int64,
        )
        _, ctx = jax.jit(sv.embedding_lookup)(state, ids)
        assert int(np.asarray(ctx.num_dropped).sum()) == 0


class TestShardedTrainStepJit:
    def test_full_step_under_jit_with_dense_params(self, mesh):
        """Dense params ride normal SPMD (psum by XLA); table rides
        shard_map — the reference's half-sync pattern in one jit."""
        sv = make_sharded(mesh, "full_var")
        state = sv.init()
        w = jnp.ones((DIM, 1))
        opt = de.SGD(0.1)

        @jax.jit
        def step(state, w, ids, y, t):
            def loss_fn(w, emb):
                pred = emb @ w
                return jnp.mean((pred[..., 0] - y) ** 2)

            emb, ctx = sv.embedding_lookup(state, ids)
            (l, gw), ge = (
                jax.value_and_grad(loss_fn, argnums=0)(w, emb),
                jax.grad(loss_fn, argnums=1)(w, emb),
            )
            state = sv.apply_gradients(state, ctx, ge, opt, step=t)
            w = w - 0.05 * gw
            return state, w, l

        rng = np.random.default_rng(5)
        losses = []
        for t in range(30):
            ids = jnp.asarray(
                rng.integers(1, 20, size=16), dtype=jnp.int64
            )
            y = jnp.asarray(rng.normal(size=(16,)).astype(np.float32)) * 0 + 1.0
            state, w, l = step(state, w, ids, y, t)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.5


class TestShardedTableOps:
    def _setup(self, n=4):
        from jax.sharding import Mesh
        from recommenders_addons_tpu.parallel.sharded import ShardedVariable
        from recommenders_addons_tpu import dynamic_embedding as de

        mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
        var = de.Variable(name=f"sops_{n}", dim=2, init_capacity=1 << 12)
        sv = ShardedVariable(var=var, mesh=mesh)
        state = sv.init()
        keys = jnp.arange(1, 257, dtype=jnp.int64)
        state = sv.upsert(state, keys, jnp.ones((256, 2)), step=1)
        return sv, state, keys

    def test_remove_and_clear(self):
        sv, state, keys = self._setup()
        state = sv.remove(state, keys[:100])
        assert int(sv.size(state)) == 156
        state = sv.clear(state)
        assert int(sv.size(state)) == 0

    def test_export_and_scores(self):
        sv, state, keys = self._setup()
        k, v, m = jax.device_get(sv.export(state))
        live = np.sort(np.asarray(k)[np.asarray(m)])
        np.testing.assert_array_equal(live, np.arange(1, 257))
        k2, s2, m2 = jax.device_get(sv.export_keys_and_scores(state))
        assert (np.asarray(s2)[np.asarray(m2)] == 1).all()

    def test_apply_restriction(self):
        from recommenders_addons_tpu import dynamic_embedding as de
        sv, state, keys = self._setup()
        # bump half the keys to a newer timestamp, then cap
        state = sv.upsert(state, keys[128:], jnp.ones((128, 2)), step=9)
        state = sv.apply_restriction(state, num_reserved=128, trigger=128)
        assert int(sv.size(state)) <= 132  # per-shard quota rounding
        k, _, m = jax.device_get(sv.export(state))
        live = set(np.asarray(k)[np.asarray(m)].tolist())
        # survivors skew heavily toward the newer half
        newer = len(live & set(range(129, 257)))
        assert newer > len(live) * 0.75


def test_two_axis_mesh_matches_single_axis(tmp_path):
    """axis=("dp","ep") on a 2x4 mesh shards rows over the flattened
    product axis and matches the 8-way single-axis numerics exactly
    (mixed dp x ep pods — one mesh serves both parallelism kinds);
    checkpoints cross between the two topologies."""
    from jax.sharding import Mesh

    from recommenders_addons_tpu.parallel.sharded import ShardedVariable
    from recommenders_addons_tpu.train import (
        load_dynamic_embedding, save_dynamic_embedding,
    )

    devs = np.array(jax.devices()[:8])
    var = de.Variable(name="axis2_var", dim=4, init_capacity=1 << 12)
    opt = de.Adam(0.1)
    keys = jnp.arange(1, 129, dtype=jnp.int64)

    def run(mesh, axis):
        svar = ShardedVariable(var=var, mesh=mesh, axis=axis)
        st = svar.create_slots(svar.init(), opt)
        for i in range(2):
            emb, ctx = svar.embedding_lookup(st, keys)
            st = svar.apply_gradients(
                st, ctx, jnp.ones_like(emb) * 0.1, opt, step=i)
        assert int(svar.size(st)) == 128
        return svar, st

    svar1, st1 = run(Mesh(devs, ("ep",)), "ep")
    svar2, st2 = run(Mesh(devs.reshape(2, 4), ("dp", "ep")), ("dp", "ep"))
    assert svar2.num_shards == 8
    np.testing.assert_allclose(
        np.asarray(svar1.lookup(st1, keys)),
        np.asarray(svar2.lookup(st2, keys)), rtol=1e-6)

    # checkpoint written from the 2-axis topology restores into 1-axis
    save_dynamic_embedding(svar2, st2, str(tmp_path))
    restored = load_dynamic_embedding(
        svar1, svar1.create_slots(svar1.init(), opt), str(tmp_path))
    assert int(svar1.size(restored)) == 128
    np.testing.assert_allclose(
        np.asarray(svar1.lookup(restored, keys)),
        np.asarray(svar2.lookup(st2, keys)), rtol=1e-6)


def test_sharded_accum_bp_v2():
    """Routed bp_v2 delta write (reference Variable.accum across devices)."""
    from jax.sharding import Mesh
    from recommenders_addons_tpu.parallel.sharded import ShardedVariable
    from recommenders_addons_tpu import dynamic_embedding as de

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    var = de.Variable(name="sacc", dim=2, init_capacity=1 << 10)
    sv = ShardedVariable(var=var, mesh=mesh)
    state = sv.init()
    keys = jnp.arange(1, 17, dtype=jnp.int64)
    state = sv.upsert(state, keys, jnp.full((16, 2), 10.0))
    # delta for existing (old=10, new=13 -> +3), insert for new keys
    mixed = jnp.arange(9, 25, dtype=jnp.int64)  # 9..16 exist, 17..24 new
    state = sv.accum(state, mixed,
                     jnp.full((16, 2), 10.0), jnp.full((16, 2), 13.0))
    got = sv.lookup(state, jnp.arange(1, 25, dtype=jnp.int64))
    got = np.asarray(got)
    np.testing.assert_allclose(got[:8], 10.0)   # untouched
    np.testing.assert_allclose(got[8:16], 13.0)  # 10 + 3
    np.testing.assert_allclose(got[16:], 13.0)  # inserted as new value


def test_fused_train_step_matches_two_call_api():
    """train_step (one shard_map: lookup -> grads -> apply) must produce
    bit-identical table state to embedding_lookup + apply_gradients
    (it exists purely to kill the ctx boundary cost, tools/ab_sharded.py)."""
    from jax.sharding import Mesh
    from recommenders_addons_tpu.parallel.sharded import ShardedVariable

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, 4000, size=64, dtype=np.int64))

    def build():
        var = de.Variable(name="fused_ts", dim=8, init_capacity=1 << 10,
                          initializer=jax.nn.initializers.normal(0.05),
                          evict_strategy=de.EvictStrategy.LRU)
        sv = ShardedVariable(var=var, mesh=mesh)
        opt = de.Adam(0.01)
        return sv, opt, sv.create_slots(sv.init(), opt)

    sv1, opt1, st1 = build()
    sv2, opt2, st2 = build()

    @jax.jit
    def two_call(st, ids):
        emb, ctx = sv1.embedding_lookup(st, ids, step=5)
        return sv1.apply_gradients(st, ctx, emb * 0.1 + 0.01, opt1,
                                   step=5)

    @jax.jit
    def fused(st, ids):
        st, aux = sv2.train_step(
            st, ids, lambda e: (e * 0.1 + 0.01, ()), opt2, step=5)
        return st

    st1 = two_call(st1, ids)
    st2 = fused(st2, ids)
    probe = jnp.asarray(sorted(set(np.asarray(ids).tolist())),
                        jnp.int64)
    np.testing.assert_array_equal(
        np.asarray(sv1.lookup(st1, probe)),
        np.asarray(sv2.lookup(st2, probe)))
    # scores and sizes agree too
    assert int(sv1.size(st1)) == int(sv2.size(st2))


def test_hot_key_overflow_takes_dedup_route():
    """A key repeated more than the per-owner routing capacity must NOT
    silently read init rows / drop its gradients: the lookup detects the
    overflow (psum'd) and retries through batch-side dedup, where each
    DISTINCT key routes once and occurrences share the slot
    (``ctx.deduped``; grads scatter-ADD on the route back). Parity with
    the single table pins both the forward rows and the applied update
    (ADVICE r4 medium)."""
    mesh = parallel.create_mesh(num_devices=4)
    init = jax.nn.initializers.normal(0.1)
    v_single = de.Variable(
        name="hot_var", dim=DIM, init_capacity=4096, initializer=init
    )
    sv = make_sharded(mesh, "hot_var", initializer=init)

    s_single, s_shard = v_single.init(), sv.init()
    opt_a, opt_b = de.Adagrad(0.1), de.Adagrad(0.1)
    # batch 64 over 4 devices -> n_local 16, K = 8 per (src, dst) pair:
    # device 0's whole block is ONE key (16 occurrences > K) -> the fast
    # per-occurrence route must overflow and the dedup retry must engage
    ids = np.concatenate([
        np.full(16, 7, np.int64),
        np.arange(100, 148, dtype=np.int64),
    ])
    tgt = jnp.asarray(
        np.random.default_rng(5).normal(size=(64, DIM)).astype(np.float32)
    )
    jids = jnp.asarray(ids)

    @jax.jit
    def step_single(state, t):
        emb, ctx = v_single.embedding_lookup(state, jids)
        g = jax.grad(lambda e: 0.5 * jnp.sum((e - tgt) ** 2))(emb)
        return v_single.apply_gradients(state, ctx, g, opt_a, step=t)

    @jax.jit
    def step_shard(state, t):
        emb, ctx = sv.embedding_lookup(state, jids)
        g = jax.grad(lambda e: 0.5 * jnp.sum((e - tgt) ** 2))(emb)
        new = sv.apply_gradients(state, ctx, g, opt_b, step=t)
        return new, ctx.deduped, ctx.num_dropped

    for t in range(3):
        s_single = step_single(s_single, t)
        s_shard, deduped, dropped = step_shard(s_shard, t)
        assert bool(np.asarray(deduped).any()), (
            "hot-key batch must take the dedup route")
        assert int(np.asarray(dropped).sum()) == 0, (
            "dedup route must place every distinct key")

    probe = jnp.asarray(np.unique(ids))
    out_single = v_single.lookup(s_single, probe)
    out_shard = sv.lookup(s_shard, probe)
    np.testing.assert_allclose(
        np.asarray(out_shard), np.asarray(out_single), rtol=1e-5,
        atol=1e-6,
    )
