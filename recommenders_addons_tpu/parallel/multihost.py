"""Multi-host orchestration helpers.

The reference's multi-process story is Horovod: broadcast initial state,
allreduce dense grads, rank-0-plus-join checkpointing (SURVEY.md §2.3, §5).
The TPU-native story is `jax.distributed` + one global mesh: SPMD handles
dense replication/psum implicitly, the table's all-to-all spans all hosts'
devices over ICI/DCN, and every process writes its own rank-tagged
checkpoint shards (train/checkpoint.py) — no broadcast/join choreography.

These helpers wrap the few process-level steps that remain. They are
host-count-agnostic: on a single host they degrade to no-ops, which is how
CI exercises them (the reference tests its Horovod path the same way, with
size-1 degradation — shadow_embedding_ops.py:425-426).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with env fallbacks (JAX_COORDINATOR_*,
    TPU metadata). Call once per process before building meshes."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
        )
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "ep",
                devices: Optional[Sequence] = None) -> Mesh:
    """One mesh axis over every device of every host — the table-sharding
    and data-parallel axis (SURVEY.md §2.3: one axis serves both)."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def process_rank_size():
    return jax.process_index(), jax.process_count()


def shard_batch(mesh: Mesh, batch, axis: str = "ep"):
    """Place a per-process batch dict as a globally sharded batch.

    Each process passes ITS slice of the global batch (standard JAX
    multi-host data loading); returns global arrays sharded over ``axis``.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, batch)


def save_checkpoint(ckpt, directory: str, state, step=None, keep=None):
    """Every process writes its shards; rank 0 writes the dense leaves.
    (train.DECheckpoint is already rank-aware — this adds the rank/size
    plumbing from the live runtime.)"""
    rank, size = process_rank_size()
    return ckpt.save(directory, state, step=step, proc_size=size,
                     proc_rank=rank, keep=keep)
