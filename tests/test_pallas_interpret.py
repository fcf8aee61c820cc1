"""Pallas kernel logic under the interpreter (TFRA_TPU_PALLAS_INTERPRET=1):
the DMA gather/scatter/fused-update kernels run on the CPU suite, pinning
their indexing/semaphore/trash-row behavior without the chip. (The Mosaic
compile path itself is still chip-only — tools/ab_fused.py A/Bs it there.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu.ops import pallas_ops


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("TFRA_TPU_PALLAS_INTERPRET", "1")


CH = 2  # 256-float rows
LANES = 128


def _table(cap, seed=0):
    rng = np.random.default_rng(seed)
    # physical [(cap+1)*CH, 128] layout with a trash row at index cap
    t = rng.normal(size=((cap + 1) * CH, LANES)).astype(np.float32)
    return jnp.asarray(t)


class TestInterpretKernels:
    def test_gather_matches_take(self):
        cap = 16
        t = _table(cap)
        idx = jnp.asarray([3, 0, 15, 3, 7], jnp.int32)
        got = pallas_ops.gather_rows_2d(t, CH, idx, cap=cap)
        logical = np.asarray(t).reshape(cap + 1, CH * LANES)
        want = logical[np.asarray(idx)]
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_gather_sentinel_masked_to_zero(self):
        cap = 8
        t = _table(cap)
        idx = jnp.asarray([2, cap, -1, 5], jnp.int32)  # cap/-1 invalid
        got = np.asarray(pallas_ops.gather_rows_2d(t, CH, idx, cap=cap))
        logical = np.asarray(t).reshape(cap + 1, CH * LANES)
        np.testing.assert_array_equal(got[0], logical[2])
        np.testing.assert_array_equal(got[1], 0)
        np.testing.assert_array_equal(got[2], 0)
        np.testing.assert_array_equal(got[3], logical[5])

    def test_scatter_set_and_trash_row_absorbs(self):
        cap = 8
        t = _table(cap)
        idx = jnp.asarray([1, 6, cap], jnp.int32)  # last lands in trash
        rows = jnp.asarray(
            np.arange(3 * CH * LANES, dtype=np.float32).reshape(
                3, CH * LANES))
        out = pallas_ops.scatter_rows_set_2d(t, CH, idx, rows, cap=cap)
        logical = np.asarray(out).reshape(cap + 1, CH * LANES)
        orig = np.asarray(t).reshape(cap + 1, CH * LANES)
        np.testing.assert_array_equal(logical[1], np.asarray(rows)[0])
        np.testing.assert_array_equal(logical[6], np.asarray(rows)[1])
        # untouched logical rows preserved
        for r in (0, 2, 3, 4, 5, 7):
            np.testing.assert_array_equal(logical[r], orig[r])

    def test_fused_update_scatter_refs(self):
        cap = 8
        t = _table(cap)
        n = 4
        idx = jnp.asarray([2, 5, cap, 0], jnp.int32)
        a = jnp.asarray(np.random.default_rng(1).normal(
            size=(n, CH * LANES)).astype(np.float32))
        b = jnp.asarray(np.random.default_rng(2).normal(
            size=(n, CH * LANES)).astype(np.float32))

        def tile_fn(blks, step):
            x, y = blks
            return (x * 2.0 + y + step).astype(jnp.float32)

        out = pallas_ops.fused_update_scatter_refs(
            t, CH, idx, (a, b), tile_fn, cap=cap, step=3.0)
        logical = np.asarray(out).reshape(cap + 1, CH * LANES)
        orig = np.asarray(t).reshape(cap + 1, CH * LANES)
        want = np.asarray(a) * 2.0 + np.asarray(b) + 3.0
        np.testing.assert_allclose(logical[2], want[0], rtol=1e-6)
        np.testing.assert_allclose(logical[5], want[1], rtol=1e-6)
        np.testing.assert_allclose(logical[0], want[3], rtol=1e-6)
        for r in (1, 3, 4, 6, 7):
            np.testing.assert_array_equal(logical[r], orig[r])


class TestInterpretEndToEnd:
    def test_train_step_matches_xla_fallback(self):
        """A full lookup+Adam apply through the interpreted Pallas kernels
        equals the XLA-fallback path bit-for-bit-ish."""
        from recommenders_addons_tpu import dynamic_embedding as de

        def run(disable_pallas, monkey_env):
            import os

            old = dict(os.environ)
            os.environ["TFRA_TPU_DISABLE_PALLAS"] = (
                "1" if disable_pallas else "0")
            os.environ["TFRA_TPU_PALLAS_INTERPRET"] = (
                "0" if disable_pallas else "1")
            try:
                var = de.Variable(name=f"pi_{disable_pallas}", dim=64,
                                  init_capacity=256)
                opt = de.Adam(0.01)
                state = de.create_slots(var, var.init(), opt)
                keys = jnp.asarray([5, 9, 5, 77], jnp.int64)
                vals = jnp.ones((4, 64), jnp.float32)
                state = var.upsert(state, keys[:2], vals[:2] * 2.0)
                emb, ctx = var.embedding_lookup(state, keys)
                state = var.apply_gradients(
                    state, ctx, jnp.ones_like(emb) * 0.1, opt, step=1)
                out, found = var.lookup(state, keys, return_exists=True)
                return np.asarray(emb), np.asarray(out), np.asarray(found)
            finally:
                os.environ.clear()
                os.environ.update(old)

        emb_p, out_p, found_p = run(False, None)
        emb_x, out_x, found_x = run(True, None)
        np.testing.assert_array_equal(found_p, found_x)
        np.testing.assert_allclose(emb_p, emb_x, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-6)


class TestBf16Fused:
    def test_bf16_fused_matches_unfused_within_rounding(self):
        from recommenders_addons_tpu import dynamic_embedding as de  # noqa: F811

        """bf16 tables fuse via the even/odd-plane integer unpack
        (optimizer._fused_rows_pf2): f32 math + one RNE round vs the
        unfused path's bf16-native math — equal within a couple bf16
        ulps of the operands."""
        import os

        def run(disable_fused):
            old = dict(os.environ)
            os.environ["TFRA_TPU_DISABLE_FUSED_APPLY"] = (
                "1" if disable_fused else "0")
            os.environ["TFRA_TPU_PALLAS_INTERPRET"] = (
                "0" if disable_fused else "1")
            try:
                var = de.Variable(
                    name=f"bf16f_{disable_fused}", dim=8,
                    init_capacity=256, value_dtype=jnp.bfloat16,
                    initializer=0.0)
                opt = de.Adam(0.05)
                state = de.create_slots(var, var.init(), opt)
                rng = np.random.default_rng(0)
                keys = jnp.asarray(
                    rng.choice(1000, 64, replace=False).astype(np.int64)
                    + 1)
                vals = jnp.asarray(
                    rng.normal(size=(64, 8)).astype(np.float32))
                state = var.upsert(state, keys[:40], vals[:40])
                emb, ctx = var.embedding_lookup(state, keys)
                g = jnp.asarray(
                    rng.normal(size=emb.shape).astype(np.float32)) * 0.1
                state = var.apply_gradients(state, ctx, g, opt, step=3)
                out, found = var.lookup(state, keys, return_exists=True)
                return (np.asarray(out, np.float32), np.asarray(found),
                        np.asarray(state.slots["m"], np.float32))
            finally:
                os.environ.clear()
                os.environ.update(old)

        o_f, f_f, m_f = run(False)
        o_u, f_u, m_u = run(True)
        np.testing.assert_array_equal(f_f, f_u)
        assert np.max(np.abs(o_f - o_u)) < 0.05
        assert np.max(np.abs(m_f - m_u)) < 0.05

    def test_f16_tables_stay_unfused(self):
        """f16 bits are not an f32 prefix: the plane trick must NOT
        engage (gate in optimizer._can_fuse)."""
        from recommenders_addons_tpu import dynamic_embedding as de
        from recommenders_addons_tpu.ops import optimizer as opt_lib

        var = de.Variable(name="f16_gate", dim=8, init_capacity=256,
                          value_dtype=jnp.float16, initializer=0.0)
        opt = de.Adam(0.05)
        state = de.create_slots(var, var.init(), opt)
        keys = jnp.asarray([3, 9, 4], jnp.int64)
        emb, ctx = var.embedding_lookup(state, keys)
        assert not opt_lib._can_fuse(var, state, ctx, opt)
        # and the unfused path still trains f16 end to end
        state = var.apply_gradients(
            state, ctx, jnp.ones_like(emb) * 0.1, opt, step=1)
        _, found = var.lookup(state, keys, return_exists=True)
        assert bool(np.asarray(found).all())


class TestGatherValues:
    """gather_values (the serving value-chunk DMA fast path) must agree
    with the full packed gather's value columns in every layout."""

    def _roundtrip(self, value_dtype, dim, with_slots=True):
        from recommenders_addons_tpu import dynamic_embedding as de
        from recommenders_addons_tpu.ops import hashtable

        var = de.Variable(
            name=f"gv_{np.dtype(value_dtype).name}_{dim}", dim=dim,
            init_capacity=1 << 10, value_dtype=value_dtype,
            initializer=jax.nn.initializers.normal(0.05))
        state = var.init()
        if with_slots:
            state = de.create_slots(var, state, de.Adam(0.001))
        keys = jnp.arange(1, 65, dtype=jnp.int64)
        rng = np.random.default_rng(3)
        vals = jnp.asarray(
            rng.normal(size=(64, dim)).astype(np.dtype(value_dtype)))
        state = var.upsert(state, keys, vals)
        probe = jnp.concatenate(
            [keys, jnp.asarray([9999, 12345], jnp.int64)])  # 2 misses
        slot, found = hashtable.find(var.spec, state, probe)
        gv = np.asarray(hashtable.gather_values(state, slot, found))
        gp = np.asarray(
            hashtable.packed_logical_view(
                state, probe.shape[0],
                hashtable.gather_packed(state, slot, found)))[:, :dim]
        f = np.asarray(found)
        np.testing.assert_array_equal(gv[f], gp[f])
        assert f[:64].all() and not f[64:].any()

    def test_f32_multichunk_row(self):
        self._roundtrip(jnp.float32, 64)  # ch=2 (Adam slots), vc=1

    def test_f32_wide_values(self):
        self._roundtrip(jnp.float32, 256)  # dc=256: vc=2 value chunks

    def test_bf16_packed(self):
        self._roundtrip(jnp.bfloat16, 64)  # pf=2: bitcast lane unpack

    def test_no_slots_identity_layout(self):
        self._roundtrip(jnp.float32, 64, with_slots=False)
