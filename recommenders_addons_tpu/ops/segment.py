"""`de.math` parity: segment reductions & sparse utilities.

The reference ships CUDA kernels for these (core/kernels/
segment_reduction_ops*, math_ops.py:60-230) because TF lacked GPU versions;
on TPU they are single XLA ops (SURVEY.md §2.1 "trivial" row) — the value
here is exact TF semantics (including the mean/sqrtn denominators and
empty-segment zeros) so reference tests port 1:1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _row_segment_sum(data, segment_ids, num_segments: int):
    """Row-shaped segment sums route through the MXU chunk combine
    (hashtable.segment_sum_rows): XLA's scatter-add serializes on
    duplicate (hot-key) segment targets — 18.0 vs 8.6 ns/key on zipf
    ids at [64Ki, 64] (tools/ab_segsum.py). 1-D data (counts, weight
    denominators) stays on the XLA op."""
    from recommenders_addons_tpu.ops import hashtable

    if (data.ndim == 2 and jnp.issubdtype(data.dtype, jnp.floating)
            and data.shape[0] == segment_ids.shape[0]):
        return hashtable.segment_sum_rows(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_sum(data, segment_ids, num_segments: int):
    return _row_segment_sum(data, segment_ids, num_segments)


def sparse_segment_sum(
    data: jax.Array,
    indices: jax.Array,
    segment_ids: jax.Array,
    num_segments: Optional[int] = None,
):
    """TF ``sparse.segment_sum``: gather ``data`` rows at ``indices`` then
    segment-sum (reference op defs core/ops/math_ops.cc:96-129)."""
    n = int(num_segments) if num_segments is not None else None
    if n is None:
        raise ValueError(
            "num_segments is required on TPU (static shapes); the reference's "
            "dynamic variant has no XLA analog"
        )
    return _row_segment_sum(data[indices], segment_ids, n)


def sparse_segment_mean(data, indices, segment_ids, num_segments: int):
    s = sparse_segment_sum(data, indices, segment_ids, num_segments)
    cnt = jax.ops.segment_sum(
        jnp.ones(segment_ids.shape, data.dtype),
        segment_ids,
        num_segments=num_segments,
    )
    return s / jnp.maximum(cnt, 1.0)[..., None]


def sparse_segment_sqrt_n(data, indices, segment_ids, num_segments: int):
    s = sparse_segment_sum(data, indices, segment_ids, num_segments)
    cnt = jax.ops.segment_sum(
        jnp.ones(segment_ids.shape, data.dtype),
        segment_ids,
        num_segments=num_segments,
    )
    return s / jnp.sqrt(jnp.maximum(cnt, 1.0))[..., None]


def weighted_segment_combine(
    rows: jax.Array,  # [N, D]
    segment_ids: jax.Array,  # [N]
    num_segments: int,
    weights: Optional[jax.Array] = None,  # [N]
    combiner: str = "mean",
):
    """The combiner core of ``embedding_lookup_sparse``
    (reference dynamic_embedding_ops.py:218-291): sum / mean / sqrtn with
    optional weights; empty segments produce zero rows."""
    if weights is None:
        weights = jnp.ones(segment_ids.shape, rows.dtype)
    weights = weights.astype(rows.dtype)
    ws = _row_segment_sum(
        rows * weights[:, None], segment_ids, num_segments
    )
    if combiner == "sum":
        return ws
    if combiner == "mean":
        denom = jax.ops.segment_sum(
            weights, segment_ids, num_segments=num_segments
        )
    elif combiner == "sqrtn":
        denom = jnp.sqrt(
            jax.ops.segment_sum(
                weights * weights, segment_ids, num_segments=num_segments
            )
        )
    else:
        raise ValueError(f"combiner must be sum|mean|sqrtn, got {combiner}")
    safe = jnp.where(denom > 0, denom, 1.0)
    return ws / safe[:, None]
