"""`de.data_flow` parity: dynamic_partition / dynamic_stitch.

The reference ships CUDA CUB-based clones of these
(core/kernels/dynamic_partition_op_gpu.cu.cc:178-463,
dynamic_stitch_op_gpu.cu.cc:36-60) to shard keys across table shards. The
TPU framework does NOT use them on its hot path — routing is all_to_all with
static buckets (parallel/sharded.py) — but the ops are public reference API
(python/ops/data_flow_ops.py:40-61), so static-shape equivalents live here.

Static-shape contract: ``dynamic_partition`` returns a dense
``[num_partitions, N, ...]`` stack (each partition's entries front-packed,
tail padded) plus per-partition counts, instead of a ragged list.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable


def dynamic_partition(
    data: jax.Array, partitions: jax.Array, num_partitions: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (parts [P, N, ...], counts [P], scatter_pos [N]).

    ``parts[p, :counts[p]]`` are data rows with ``partitions == p`` in
    original order; ``scatter_pos[i]`` is row i's (p*N + rank) slot, usable
    to invert with :func:`dynamic_stitch_flat`.
    """
    n = data.shape[0]
    p = partitions.astype(jnp.int32)
    rank = hashtable._segment_rank(p, num_partitions)
    pos = p * np.int32(n) + rank
    flat_shape = (num_partitions * n,) + data.shape[1:]
    parts = jnp.zeros(flat_shape, data.dtype).at[pos].set(data)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), p, num_segments=num_partitions
    )
    return parts.reshape((num_partitions, n) + data.shape[1:]), counts, pos


def dynamic_stitch_flat(
    parts: jax.Array, scatter_pos: jax.Array, n: int
) -> jax.Array:
    """Inverse of :func:`dynamic_partition` (the role of
    TFRA>DynamicStitchFast — no duplicate resolution needed because
    positions are unique)."""
    flat = parts.reshape((-1,) + parts.shape[2:])
    return flat[scatter_pos]


def dynamic_stitch(
    indices: Sequence[jax.Array], data: Sequence[jax.Array],
    size: int | None = None,
) -> jax.Array:
    """TF ``dynamic_stitch`` parity: merge lists into one array where
    ``out[indices[i][j]] = data[i][j]`` (later lists win on duplicates —
    matches TF's documented behavior).

    Jit-safe when ``size`` (the output length) is given; without it the
    output length is data-dependent (TF's own contract) and must be read
    from concrete index values, which forces a host sync — pass ``size``
    inside jit."""
    if size is None:
        size = int(
            max(int(np.max(jax.device_get(i))) for i in indices if i.size)
            + 1
        )
    out_shape = (int(size),) + tuple(data[0].shape[1:])
    out = jnp.zeros(out_shape, data[0].dtype)
    for idx, d in zip(indices, data):
        out = out.at[idx].set(d)
    return out
