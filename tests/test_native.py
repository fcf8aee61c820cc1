"""Native C++ host-store tests: behavioral equivalence with the numpy
HostKVStore (the spill tier swaps them transparently)."""

import numpy as np
import pytest

from recommenders_addons_tpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def _store():
    from recommenders_addons_tpu.native import NativeHostKVStore

    return NativeHostKVStore(dim=4, initial_capacity=16)


def test_put_get_grow():
    st = _store()
    keys = np.arange(1, 10_001, dtype=np.int64)
    vals = np.tile(keys[:, None].astype(np.float32), (1, 4))
    st.put(keys, vals, scores=keys * 2)
    assert len(st) == 10_000
    got, sc, _, found = st.get(np.array([1, 5000, 99_999], np.int64))
    assert found.tolist() == [True, True, False]
    np.testing.assert_allclose(got[1], 5000.0)
    assert sc[0] == 2
    np.testing.assert_allclose(got[2], 0.0)


def test_overwrite_and_delete():
    st = _store()
    keys = np.arange(1, 101, dtype=np.int64)
    st.put(keys, np.ones((100, 4), np.float32))
    st.put(keys[:10], np.full((10, 4), 9.0, np.float32))
    got, _, _, _ = st.get(keys[:10])
    np.testing.assert_allclose(got, 9.0)
    assert len(st) == 100
    st.delete(keys[:50])
    assert len(st) == 50
    _, _, _, found = st.get(keys)
    assert found[:50].sum() == 0 and found[50:].all()


def test_slot_repack():
    st = _store()
    keys = np.arange(1, 11, dtype=np.int64)
    st.put(keys, np.ones((10, 4), np.float32))
    # later puts add optimizer slots -> store re-packs, old rows keep values
    st.put(keys[5:], np.full((5, 4), 2.0, np.float32),
           slots={"m": np.full((5, 4), 0.5, np.float32)})
    vals, _, slots, found = st.get(keys)
    assert found.all()
    np.testing.assert_allclose(vals[:5], 1.0)
    np.testing.assert_allclose(vals[5:], 2.0)
    np.testing.assert_allclose(slots["m"][5:], 0.5)
    np.testing.assert_allclose(slots["m"][:5], 0.0)


def test_matches_numpy_reference():
    from recommenders_addons_tpu.ops.spill import HostKVStore

    rng = np.random.default_rng(0)
    nat, ref = _store(), HostKVStore(dim=4, initial_capacity=16)
    for _ in range(5):
        keys = rng.integers(1, 5000, size=512).astype(np.int64)
        vals = rng.normal(size=(512, 4)).astype(np.float32)
        nat.put(keys, vals, scores=keys)
        ref.put(keys, vals, scores=keys)
    assert len(nat) == len(ref)
    probe = rng.integers(1, 6000, size=1024).astype(np.int64)
    v1, s1, _, f1 = nat.get(probe)
    v2, s2, _, f2 = ref.get(probe)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_allclose(v1[f1], v2[f2], rtol=1e-6)
    np.testing.assert_array_equal(s1[f1], s2[f2])


def test_native_checkpoint_writer(tmp_path):
    from recommenders_addons_tpu.train.checkpoint import _native_dump

    arr = np.arange(40, dtype=np.float32).reshape(10, 4)
    sel = np.array([0, 3, 7], np.int64)
    path = str(tmp_path / "rows.bin")
    assert _native_dump(path, arr, sel, buffer_rows=2)
    back = np.fromfile(path, np.float32).reshape(-1, 4)
    np.testing.assert_allclose(back, arr[sel])
