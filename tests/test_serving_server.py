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


class TestSharedKVTier:
    """Networked shared tier: N trainers/servers, ONE key space — the
    reference Redis backend's defining contract
    (redis_table_op.cc:66-1660, README.md:330)."""

    def test_remote_store_surface(self):
        from recommenders_addons_tpu.ops.spill import HostKVStore
        from recommenders_addons_tpu.serving import (
            HostKVServer, RemoteKVStore,
        )

        with HostKVServer(HostKVStore(dim=4), port=0) as srv:
            store = RemoteKVStore(srv.host, srv.port, dim=4)
            keys = np.arange(1, 9, dtype=np.int64)
            store.put(keys, np.tile(keys[:, None].astype(np.float32),
                                    (1, 4)),
                      scores=keys * 10,
                      slots={"m": np.ones((8, 4), np.float32)})
            assert len(store) == 8
            assert store.slot_names == ("m",)
            vals, scores, slots, found = store.get(
                np.asarray([3, 99, 5], np.int64))
            np.testing.assert_array_equal(found, [True, False, True])
            np.testing.assert_allclose(vals[0], 3.0)
            assert scores[0] == 30
            np.testing.assert_allclose(slots["m"][0], 1.0)
            store.delete(np.asarray([3], np.int64))
            assert len(store) == 7

    def test_two_trainers_share_one_tier(self):
        """Trainer A demotes its rows; trainer B promotes and resumes them
        — optimizer state intact across processes."""
        import jax

        from recommenders_addons_tpu.ops.spill import HostKVStore
        from recommenders_addons_tpu.serving import (
            HostKVServer, RemoteKVStore,
        )

        with HostKVServer(HostKVStore(dim=2), port=0) as srv:
            opt = de.Adam(0.1)
            keys = jnp.arange(1, 33, dtype=jnp.int64)

            var_a = de.Variable(name="tier_a", dim=2, init_capacity=1 << 9)
            tier_a = de.SpillTier(
                var_a, store=RemoteKVStore(srv.host, srv.port, dim=2))
            st_a = de.create_slots(var_a, var_a.init(), opt)
            emb, ctx = var_a.embedding_lookup(st_a, keys)
            st_a = var_a.apply_gradients(st_a, ctx, jnp.ones_like(emb),
                                         opt, step=0)
            vals_a = np.asarray(var_a.lookup(st_a, keys))
            st_a = tier_a.demote(st_a, 64)  # everything to the SHARED tier
            assert int(var_a.size(st_a)) == 0

            var_b = de.Variable(name="tier_b", dim=2, init_capacity=1 << 9)
            tier_b = de.SpillTier(
                var_b, store=RemoteKVStore(srv.host, srv.port, dim=2))
            st_b = de.create_slots(var_b, var_b.init(), opt)
            st_b = tier_b.promote(st_b, keys)
            assert int(var_b.size(st_b)) == 32
            np.testing.assert_allclose(
                np.asarray(var_b.lookup(st_b, keys)), vals_a, rtol=1e-6)
            # optimizer slots crossed the wire too: a second step matches
            # a never-demoted table's second step
            emb, ctx = var_b.embedding_lookup(st_b, keys)
            st_b = var_b.apply_gradients(st_b, ctx, jnp.ones_like(emb),
                                         opt, step=1)
            var_c = de.Variable(name="tier_c", dim=2, init_capacity=1 << 9)
            st_c = de.create_slots(var_c, var_c.init(), opt)
            emb, ctx = var_c.embedding_lookup(st_c, keys)
            st_c = var_c.apply_gradients(st_c, ctx, jnp.ones_like(emb),
                                         opt, step=0)
            emb, ctx = var_c.embedding_lookup(st_c, keys)
            st_c = var_c.apply_gradients(st_c, ctx, jnp.ones_like(emb),
                                         opt, step=1)
            np.testing.assert_allclose(
                np.asarray(var_b.lookup(st_b, keys)),
                np.asarray(var_c.lookup(st_c, keys)), rtol=1e-6)


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


class TestGrpcServing:
    """gRPC front-end (serving/grpc_server.py): binary framing, token auth,
    TLS — the reference serving fleets' gRPC role
    (tools/config_tfserving.sh)."""

    def test_grpc_roundtrip(self, frozen):
        from recommenders_addons_tpu.serving import (
            GrpcEmbeddingClient, GrpcEmbeddingServer,
        )

        var, state, ft = frozen
        with GrpcEmbeddingServer({"emb": ft}, port=0) as srv:
            with GrpcEmbeddingClient(srv.host, srv.port) as cli:
                st = cli.status()
                assert st["tables"]["emb"]["size"] == 100
                vals, found = cli.lookup("emb", [3, 999, 7])
                np.testing.assert_array_equal(found, [True, False, True])
                np.testing.assert_allclose(vals[0], 1.5)
                np.testing.assert_allclose(vals[2], 3.5)
                assert vals.dtype == np.float32 and vals.shape == (3, 4)

    def test_grpc_unknown_table(self, frozen):
        import grpc

        from recommenders_addons_tpu.serving import (
            GrpcEmbeddingClient, GrpcEmbeddingServer,
        )

        var, state, ft = frozen
        with GrpcEmbeddingServer({"emb": ft}, port=0) as srv:
            with GrpcEmbeddingClient(srv.host, srv.port) as cli:
                with pytest.raises(grpc.RpcError) as ei:
                    cli.lookup("nope", [1])
                assert ei.value.code() == grpc.StatusCode.NOT_FOUND

    def test_grpc_token_auth(self, frozen):
        import grpc

        from recommenders_addons_tpu.serving import (
            GrpcEmbeddingClient, GrpcEmbeddingServer,
        )

        var, state, ft = frozen
        with GrpcEmbeddingServer({"emb": ft}, port=0,
                                 token="sekrit") as srv:
            with GrpcEmbeddingClient(srv.host, srv.port,
                                     token="sekrit") as cli:
                vals, found = cli.lookup("emb", [3])
                assert found.all()
            with GrpcEmbeddingClient(srv.host, srv.port) as bad:
                with pytest.raises(grpc.RpcError) as ei:
                    bad.lookup("emb", [3])
                assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
            with GrpcEmbeddingClient(srv.host, srv.port,
                                     token="wrong") as bad:
                with pytest.raises(grpc.RpcError):
                    bad.lookup("emb", [3])

    def test_grpc_tier_read_through(self, frozen):
        from recommenders_addons_tpu.serving import (
            GrpcEmbeddingClient, GrpcEmbeddingServer,
        )

        var, state, ft = frozen
        tier = de.SpillTier(var)
        tier.store.put(np.asarray([500]), np.full((1, 4), 9.0))
        with GrpcEmbeddingServer({"emb": ft}, tiers={"emb": tier},
                                 port=0) as srv:
            with GrpcEmbeddingClient(srv.host, srv.port) as cli:
                vals, found = cli.lookup("emb", [1, 500, 600])
                np.testing.assert_array_equal(found, [True, True, False])
                np.testing.assert_allclose(vals[1], 9.0)


def _self_signed_cert(tmp_path):
    """PEM (cert, key) for CN=localhost via the cryptography package."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    cert_path = tmp_path / "cert.pem"
    key_path = tmp_path / "key.pem"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption(),
    ))
    return str(cert_path), str(key_path)


def test_grpc_tls(tmp_path, frozen):
    from recommenders_addons_tpu.serving import (
        GrpcEmbeddingClient, GrpcEmbeddingServer,
    )

    var, state, ft = frozen
    cert, key = _self_signed_cert(tmp_path)
    with GrpcEmbeddingServer({"emb": ft}, host="localhost", port=0,
                             tls_cert=cert, tls_key=key,
                             token="t0k") as srv:
        with GrpcEmbeddingClient("localhost", srv.port, token="t0k",
                                 tls_root=cert) as cli:
            vals, found = cli.lookup("emb", [3, 7])
            assert found.all()
            np.testing.assert_allclose(vals[0], 1.5)


def test_http_token_auth(frozen):
    var, state, ft = frozen
    with EmbeddingServer({"emb": ft}, port=0, token="hush") as srv:
        ok = EmbeddingClient(srv.host, srv.port, token="hush")
        vals, found = ok.lookup("emb", [3])
        assert found.all()
        bad = EmbeddingClient(srv.host, srv.port)
        with pytest.raises(RuntimeError, match="unauthorized"):
            bad.lookup("emb", [3])


class TestKVTierAuth:
    """Shared-tier auth/TLS: the tier holds live embedding weights, so it
    gets the same bearer-token + TLS controls as the serving fronts."""

    def test_kv_token_auth(self):
        from recommenders_addons_tpu.ops.spill import HostKVStore
        from recommenders_addons_tpu.serving import (
            HostKVServer, RemoteKVStore,
        )

        with HostKVServer(HostKVStore(dim=4), port=0,
                          token="tier-secret") as srv:
            ok = RemoteKVStore(srv.host, srv.port, dim=4,
                               token="tier-secret")
            ok.put(np.asarray([5]), np.full((1, 4), 2.0))
            vals, scores, slots, found = ok.get(np.asarray([5]))
            assert found.all()
            np.testing.assert_allclose(vals[0], 2.0)

            bad = RemoteKVStore(srv.host, srv.port, dim=4)
            with pytest.raises(RuntimeError, match="unauthorized"):
                bad.get(np.asarray([5]))
            wrong = RemoteKVStore(srv.host, srv.port, dim=4, token="nope")
            with pytest.raises(RuntimeError, match="unauthorized"):
                wrong.put(np.asarray([6]), np.full((1, 4), 1.0))
            # stats path is also guarded
            with pytest.raises(Exception):
                _ = bad.count

    def test_kv_tls_roundtrip(self, tmp_path):
        from recommenders_addons_tpu.ops.spill import HostKVStore
        from recommenders_addons_tpu.serving import (
            HostKVServer, RemoteKVStore,
        )

        cert, key = _self_signed_cert(tmp_path)
        with HostKVServer(HostKVStore(dim=2), port=0, token="s",
                          tls_cert=cert, tls_key=key) as srv:
            store = RemoteKVStore(srv.host, srv.port, dim=2, token="s",
                                  tls_root=cert)
            store.put(np.asarray([1, 2]), np.ones((2, 2)))
            assert store.count == 2
