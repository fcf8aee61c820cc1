"""Headline benchmark: dynamic-embedding train-step throughput (keys/sec).

Measures the full hot path on one chip — deduplicated lookup (probe + row
gather, misses materialize init rows) followed by the sparse-optimizer
writeback (row update + conflict-free scatter of rows/slots/scores) — i.e.
the reference's find+insert cycle (SURVEY.md §6 north-star: >=80% of HBM
speed-of-light).

vs_baseline = measured / (0.8 * speed-of-light keys/s) for the detected
chip's HBM bandwidth (the reference publishes no numbers — BASELINE.md).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de

# rough HBM GB/s per chip kind (public specs)
HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 100.0,
}

DIM = 64
CAPACITY = 1 << 22  # 4Mi rows
BATCH = 1 << 16  # unique keys per step
STEPS = 30


def bytes_per_key(bucket_size: int, dim: int) -> float:
    """HBM traffic per key for one train step (probe + row r/w + slots)."""
    probe = bucket_size * 8  # bucket key gather
    row_rw = 2 * dim * 4  # value row read + write
    score = 2 * 8  # score read + write
    key_w = 8
    return float(probe + row_rw + score + key_w)


def main():
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    var = de.Variable(
        name="bench_table",
        dim=DIM,
        init_capacity=CAPACITY,
        initializer=jax.nn.initializers.normal(0.05),
    )
    state = var.init()
    opt = de.SGD(0.1)
    state = de.create_slots(var, state, opt)

    @jax.jit
    def train_step(state, ids, step):
        emb, ctx = var.embedding_lookup(state, ids)
        grads = emb * 0.01  # stand-in cotangent
        return var.apply_gradients(state, ctx, grads, opt, step=step)

    rng = np.random.default_rng(0)
    # ~50% hits at steady state: draw from 2x capacity key space
    batches = [
        jnp.asarray(
            rng.integers(1, CAPACITY * 2, size=BATCH, dtype=np.int64)
        )
        for _ in range(8)
    ]

    # warmup + fill
    state = train_step(state, batches[0], 0)
    jax.block_until_ready(state.keys)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state = train_step(state, batches[i % len(batches)], i)
    jax.block_until_ready(state.keys)
    dt = time.perf_counter() - t0

    keys_per_sec = STEPS * BATCH / dt
    gbps = HBM_GBPS.get(kind, HBM_GBPS["cpu"])
    sol = gbps * 1e9 / bytes_per_key(var.spec.bucket_size, DIM)
    result = {
        "metric": "dynamic_embedding_train_step_throughput",
        "value": round(keys_per_sec, 1),
        "unit": "keys/sec",
        "vs_baseline": round(keys_per_sec / (0.8 * sol), 4),
        "device": str(kind),
        "dim": DIM,
        "capacity": CAPACITY,
        "batch_unique_keys": BATCH,
        "speed_of_light_keys_per_sec": round(sol, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
