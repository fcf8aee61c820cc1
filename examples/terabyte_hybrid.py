#!/usr/bin/env python
"""Beyond-HBM table: HBM hot tier + host-DRAM spill (reference Redis /
HKV-hybrid role). Streams more distinct keys than the device table holds.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de

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
    print(f"device live: {int(var.size(hy.state))}, "
          f"host tier: {len(hy.tier.store)}, "
          f"total: {hy.tier.total_keys(hy.state)} "
          f"(device capacity {var.spec.capacity})")
