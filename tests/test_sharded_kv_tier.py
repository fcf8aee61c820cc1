"""Scale-out of the shared network KV tier: one key space rendezvous-
sharded over N HostKVServers with replication + failover
(serving.kv.ShardedRemoteKVStore — the reference's Redis CLUSTER role,
redis_impl/redis_slots_tab.h / redis_cluster_connection_pool.hpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.ops.spill import HostKVStore
from recommenders_addons_tpu.serving import (
    HostKVServer, ShardedRemoteKVStore,
)


def _tier(n_nodes, dim=2, replicas=2):
    stores = [HostKVStore(dim=dim) for _ in range(n_nodes)]
    servers = [HostKVServer(s, port=0).start() for s in stores]
    client = ShardedRemoteKVStore(
        [(s.host, s.port) for s in servers], dim=dim, replicas=replicas)
    return stores, servers, client


class TestShardedTier:
    def test_put_get_spreads_over_nodes(self):
        stores, servers, client = _tier(3, dim=2, replicas=2)
        try:
            keys = np.arange(1, 301, dtype=np.int64)
            vals = np.tile(keys[:, None].astype(np.float32), (1, 2))
            client.put(keys, vals, scores=keys * 2,
                       slots={"m": vals * 0.5})
            v, s, sl, f = client.get(keys)
            assert f.all()
            np.testing.assert_allclose(v, vals)
            np.testing.assert_array_equal(s, keys * 2)
            np.testing.assert_allclose(sl["m"], vals * 0.5)
            # replicated: every key lives on exactly 2 of the 3 nodes
            per_node = [len(st) for st in stores]
            assert sum(per_node) == 2 * 300
            # and the spread is roughly even (rendezvous balance)
            assert min(per_node) > 100
            # delete removes every replica
            client.delete(keys[:50])
            _, _, _, f2 = client.get(keys[:50])
            assert not f2.any()
            assert sum(len(st) for st in stores) == 2 * 250
        finally:
            for srv in servers:
                srv.stop()

    def test_single_node_failure_and_restart(self):
        """R=2 keeps every key readable through one node going down; the
        node restarts mid-test and rejoins."""
        stores, servers, client = _tier(2, dim=2, replicas=2)
        try:
            keys = np.arange(1, 101, dtype=np.int64)
            vals = np.tile(keys[:, None].astype(np.float32), (1, 2))
            client.put(keys, vals)

            port0 = servers[0].port
            servers[0].stop()  # node 0 goes down

            with pytest.warns(UserWarning, match="failing over"):
                v, _, _, f = client.get(keys)
            assert f.all()  # every key served by its surviving replica
            np.testing.assert_allclose(v, vals)

            # writes during the outage land on the live replica set
            more = np.arange(200, 260, dtype=np.int64)
            mvals = np.ones((60, 2), np.float32)
            client.put(more, mvals)
            v2, _, _, f2 = client.get(more)
            assert f2.all()

            # node 0 restarts on the same port with its store intact
            servers[0] = HostKVServer(stores[0], port=port0).start()
            client.revive()
            v3, _, _, f3 = client.get(keys)
            assert f3.all()
            np.testing.assert_allclose(v3, vals)
        finally:
            for srv in servers:
                try:
                    srv.stop()
                except Exception:
                    pass

    def test_trainer_writes_server_reads_immediately(self):
        """Freshness across roles: rows a TRAINER demotes into the shared
        tier are visible to a SERVING replica's read-through lookup on the
        next request (the reference's Redis serving contract,
        redis_table_op.cc:66-1660)."""
        stores, servers, client_t = _tier(2, dim=4, replicas=2)
        try:
            opt = de.Adam(0.1)
            keys = jnp.arange(1, 33, dtype=jnp.int64)

            # trainer role
            var_t = de.Variable(name="fresh_t", dim=4,
                                init_capacity=1 << 9)
            tier_t = de.SpillTier(var_t, store=client_t)
            st_t = de.create_slots(var_t, var_t.init(), opt)
            emb, ctx = var_t.embedding_lookup(st_t, keys)
            st_t = var_t.apply_gradients(st_t, ctx, jnp.ones_like(emb),
                                         opt, step=0)
            trained = np.asarray(var_t.lookup(st_t, keys))
            st_t = tier_t.demote(st_t, 64)  # push everything to the tier

            # serving role: separate client, EMPTY device table — every
            # read falls through to the shared tier
            client_s = ShardedRemoteKVStore(
                [(s.host, s.port) for s in servers], dim=4, replicas=2)
            var_s = de.Variable(name="fresh_s", dim=4,
                                init_capacity=1 << 9)
            tier_s = de.SpillTier(var_s, store=client_s)
            st_s = var_s.init()
            served = np.asarray(tier_s.lookup_through(st_s, keys))
            np.testing.assert_allclose(served, trained, rtol=1e-6)
            assert tier_s.stats.served_from_tier == 32
        finally:
            for srv in servers:
                srv.stop()
