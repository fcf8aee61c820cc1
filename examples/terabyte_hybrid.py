#!/usr/bin/env python
"""Beyond-HBM table: HBM hot tier + host-DRAM spill (reference Redis /
HKV-hybrid role). Streams more distinct keys than the device table holds,
then checkpoints BOTH tiers and cold-restores — demoted rows survive
(de.train.save_tier / load_tier; reference lookup_table_op_hkv.h:602-660
score-aware dump + redis_connection_util.hpp:330-480 RDB persistence).
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.train import (
    load_dynamic_embedding, save_dynamic_embedding,
)

if __name__ == "__main__":
    var = de.Variable(name="hybrid_demo", dim=32, init_capacity=1 << 14,
                      evict_strategy=de.EvictStrategy.LRU)
    hy = de.HybridTable(var)
    rng = np.random.default_rng(0)
    for t in range(50):
        ids = jnp.asarray(
            rng.integers(1, 1 << 20, size=2048).astype(np.int64))
        hy.prepare_batch(ids)
        hy.upsert(ids, jnp.ones((2048, 32)), step=t)
    total = hy.tier.total_keys(hy.state)
    print(f"device live: {int(var.size(hy.state))}, "
          f"host tier: {len(hy.tier.store)}, "
          f"total: {total} (device capacity {var.spec.capacity})")

    # checkpoint both tiers, cold-restore, prove nothing was lost
    ckpt = tempfile.mkdtemp(prefix="hybrid_ckpt_")
    save_dynamic_embedding(var, hy.state, ckpt, tier=hy)
    var2 = de.Variable(name="hybrid_demo", dim=32, init_capacity=1 << 14,
                       evict_strategy=de.EvictStrategy.LRU)
    hy2 = de.HybridTable(var2)
    hy2.state = load_dynamic_embedding(var2, hy2.state, ckpt, tier=hy2)
    total2 = hy2.tier.total_keys(hy2.state)
    print(f"restored: device {int(var2.size(hy2.state))} + "
          f"tier {len(hy2.tier.store)} = {total2}")
    assert total2 == total, (total2, total)
    print("every row survived the cold restore")
