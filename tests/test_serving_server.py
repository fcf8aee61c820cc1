"""Serving-runner tests: the reference's TF-Serving/Triton role
(tools/config_tfserving.sh, README.md:300-360) — a server process answering
batched lookup requests over the wire, with spill-tier read-through."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.serving import (
    EmbeddingClient,
    EmbeddingServer,
    serve_directory,
)


@pytest.fixture
def frozen():
    var = de.Variable(name="srv_table", dim=4, init_capacity=1 << 10)
    state = var.init()
    keys = jnp.arange(1, 101, dtype=jnp.int64)
    vals = jnp.tile(keys[:, None].astype(jnp.float32), (1, 4)) * 0.5
    state = var.upsert(state, keys, vals)
    return var, state, de.freeze(var, state, dtype=jnp.float32)


def test_lookup_roundtrip(frozen):
    var, state, ft = frozen
    with EmbeddingServer({"emb": ft}, port=0) as srv:
        cli = EmbeddingClient(srv.host, srv.port)
        st = cli.status()
        assert st["tables"]["emb"]["size"] == 100
        assert st["tables"]["emb"]["dim"] == 4
        vals, found = cli.lookup("emb", [3, 999, 7])
        np.testing.assert_array_equal(found, [True, False, True])
        np.testing.assert_allclose(vals[0], 1.5)
        np.testing.assert_allclose(vals[2], 3.5)
        with pytest.raises(RuntimeError):
            cli.lookup("nope", [1])


def test_concurrent_requests_batch(frozen):
    var, state, ft = frozen
    with EmbeddingServer({"emb": ft}, port=0, max_wait_ms=5.0) as srv:
        cli = EmbeddingClient(srv.host, srv.port)
        results = {}

        def worker(i):
            ids = [i + 1, i + 2]
            results[i] = cli.lookup("emb", ids)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 8
        for i, (vals, found) in results.items():
            assert found.all()
            np.testing.assert_allclose(vals[0, 0], (i + 1) * 0.5)


def test_tier_read_through(frozen):
    """Misses in the frozen table fall through to the host tier (the Redis
    distributed-inference role)."""
    var, state, ft = frozen
    tier = de.SpillTier(var)
    tier.store.put(np.asarray([500]), np.full((1, 4), 9.0))
    with EmbeddingServer({"emb": ft}, tiers={"emb": tier}, port=0) as srv:
        cli = EmbeddingClient(srv.host, srv.port)
        vals, found = cli.lookup("emb", [1, 500, 600])
        np.testing.assert_array_equal(found, [True, True, False])
        np.testing.assert_allclose(vals[1], 9.0)


def test_serve_directory_roundtrip(tmp_path, frozen):
    var, state, _ = frozen
    de.serving.export_compressed(var, state, str(tmp_path),
                                 dtype=np.float16)
    srv = serve_directory(str(tmp_path), port=0)
    with srv:
        cli = EmbeddingClient(srv.host, srv.port)
        vals, found = cli.lookup("srv_table", [2, 4])
        assert found.all()
        np.testing.assert_allclose(vals[0], 1.0, rtol=1e-2)
