"""Sparse / ragged / multi-hot feature representations + lookups.

TPU-native re-design of the reference's sparse lookup stack
(``embedding_lookup_sparse`` / ``safe_embedding_lookup_sparse``
dynamic_embedding_ops.py:120-429 and ``ragged_embedding_ops.py:104-468``).
TF's SparseTensor/RaggedTensor carry dynamic nnz; on TPU every
representation is static-shape:

  * **Padded dense** ``[B, L]`` id matrix (+ optional ``[B, L]`` weights),
    padding marked with the EMPTY sentinel — the idiomatic TPU form for
    fixed-hotness recsys features.
  * :class:`SparseIds` — COO with static (padded) nnz, mirroring
    tf.SparseTensor for API parity.
  * :class:`RaggedIds` — (values, row_splits) with static nnz, mirroring
    tf.RaggedTensor.

All three normalize to ``(flat_ids, segment_ids, weights)`` and share one
combiner path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashing, hashtable, segment
from recommenders_addons_tpu.ops.variable import Variable


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("indices", "values"),
    meta_fields=("dense_shape",),
)
@dataclasses.dataclass
class SparseIds:
    """COO sparse ids with STATIC nnz; padding entries hold EMPTY values.

    ``indices [NNZ, R]`` int32, ``values [NNZ]`` key dtype,
    ``dense_shape`` static tuple (parity: tf.SparseTensor used by
    embedding_lookup_sparse, dynamic_embedding_ops.py:120-293).
    """

    indices: jax.Array
    values: jax.Array
    dense_shape: tuple

    @property
    def nnz(self) -> int:
        return self.values.shape[0]

    def row_ids(self) -> jax.Array:
        """Collapse all but the last dense dim into segment (row) ids."""
        shape = self.dense_shape
        if len(shape) == 1:
            return jnp.zeros((self.nnz,), jnp.int32)
        mults = np.cumprod([1] + list(shape[1:-1])[::-1])[::-1]
        rid = jnp.zeros((self.nnz,), jnp.int32)
        for d in range(len(shape) - 1):
            rid = rid + self.indices[:, d].astype(jnp.int32) * np.int32(
                mults[d]
            )
        return rid

    @property
    def num_rows(self) -> int:
        return int(np.prod(self.dense_shape[:-1]))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("values", "row_splits"),
    meta_fields=(),
)
@dataclasses.dataclass
class RaggedIds:
    """Ragged ids with static value buffer: ``values [NNZ]`` (tail padding
    beyond ``row_splits[-1]`` ignored), ``row_splits [B+1]`` int32
    (parity: tf.RaggedTensor in ragged_embedding_ops.py)."""

    values: jax.Array
    row_splits: jax.Array

    @property
    def nnz(self) -> int:
        return self.values.shape[0]

    @property
    def nrows(self) -> int:
        return self.row_splits.shape[0] - 1

    def row_ids(self) -> jax.Array:
        # values[i] belongs to row r iff row_splits[r] <= i < row_splits[r+1]
        pos = jnp.arange(self.nnz, dtype=jnp.int32)
        return (
            jnp.searchsorted(
                self.row_splits.astype(jnp.int32), pos, side="right"
            ).astype(jnp.int32)
            - 1
        )

    def valid_mask(self) -> jax.Array:
        pos = jnp.arange(self.nnz, dtype=jnp.int32)
        return pos < self.row_splits[-1]


@dataclasses.dataclass
class RaggedValues:
    """Ragged embedding rows: ``values [NNZ, D]`` + ``row_splits [B+1]`` —
    the ragged-OUTPUT of :func:`embedding_lookup_ragged` (parity:
    tf.RaggedTensor results of the reference's ragged lookups,
    shadow_embedding_ops.py:284-328)."""

    values: jax.Array
    row_splits: jax.Array

    @property
    def nrows(self) -> int:
        return self.row_splits.shape[0] - 1

    def to_padded(self, max_len: int, pad_value: float = 0.0) -> jax.Array:
        """[B, max_len, D] dense view (rows longer than max_len truncate)."""
        b = self.nrows
        d = self.values.shape[-1]
        starts = self.row_splits[:-1]
        lens = self.row_splits[1:] - starts
        pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
        idx = jnp.clip(starts[:, None] + pos, 0, self.values.shape[0] - 1)
        out = self.values[idx.reshape(-1)].reshape(b, max_len, d)
        mask = pos < lens[:, None]
        return jnp.where(mask[..., None], out,
                         jnp.asarray(pad_value, out.dtype))


IdsLike = Union[jax.Array, SparseIds, RaggedIds]


def embedding_lookup_ragged(
    var: Variable,
    state,
    ragged_ids: RaggedIds,
    *,
    training: bool = True,
    sharded=None,
):
    """Ragged-in, ragged-OUT lookup: each id's row, keeping the row_splits
    (the reference's RaggedTensor path through
    ``shadow_ops.embedding_lookup_unique``,
    shadow_embedding_ops.py:284-328 — flatten, unique-lookup, re-ragged).

    Returns ``(RaggedValues, ctx)`` when training (pass the cotangent of
    ``out.values`` to ``apply_gradients``), else just ``RaggedValues``.
    Padding entries beyond ``row_splits[-1]`` produce zero rows.
    """
    flat = jnp.where(ragged_ids.valid_mask(), ragged_ids.values,
                     var.empty_key)
    lookup_obj = sharded if sharded is not None else var
    if training:
        emb, ctx = lookup_obj.embedding_lookup(state, flat)
        emb = jnp.where(ragged_ids.valid_mask()[:, None], emb, 0)
        return RaggedValues(emb, ragged_ids.row_splits), ctx
    emb = lookup_obj.lookup(state, flat)
    emb = jnp.where(ragged_ids.valid_mask()[:, None], emb, 0)
    return RaggedValues(emb, ragged_ids.row_splits)


def ragged_fill_empty_rows(ragged: RaggedIds, default_value) -> tuple:
    """Static-shape ragged fill-empty-rows (reference
    ``_fill_empty_rows``/``_ragged_fill_empty_rows``,
    ragged_embedding_ops.py:66-127): rows with no VALID entries get one
    entry holding ``default_value``.

    Returns ``(RaggedIds, empty_row_indicator [B] bool)``. Output nnz is
    ``nnz + nrows`` (worst case), padding with EMPTY; entries are laid out
    row-major so ``row_ids``/combiners work unchanged.
    """
    b = ragged.nrows
    nnz = ragged.nnz
    empty = hashing.empty_key_for(np.dtype(ragged.values.dtype))
    valid = ragged.valid_mask() & (ragged.values != empty)
    rid = ragged.row_ids()
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), rid, num_segments=b)
    is_empty = counts == 0
    # new layout: for each row, its original entries then (if empty) the
    # fill entry. Compute output positions via per-row offsets.
    new_lens = counts + is_empty.astype(jnp.int32)
    new_splits = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(new_lens)]
    ).astype(jnp.int32)
    # position of each original valid entry within its row
    pos_in_row = jnp.arange(nnz, dtype=jnp.int32) - ragged.row_splits[
        :-1
    ].astype(jnp.int32)[rid]
    out_pos = jnp.where(
        valid, new_splits[rid] + pos_in_row, nnz + b)  # invalid -> dropped
    out_vals = jnp.full((nnz + b + 1,), empty, ragged.values.dtype)
    out_vals = out_vals.at[out_pos].set(ragged.values, mode="drop")
    fill_pos = jnp.where(is_empty, new_splits[:-1], nnz + b)
    out_vals = out_vals.at[fill_pos].set(
        jnp.asarray(default_value, ragged.values.dtype), mode="drop")
    return (
        RaggedIds(out_vals[: nnz + b], new_splits),
        is_empty,
    )


@dataclasses.dataclass
class SparseLookupContext:
    """Training residuals of a sparse (combined) lookup.

    Carries the inner row-lookup ctx plus the combiner's vjp so cotangents
    w.r.t. the COMBINED output chain back to per-row gradients. Contains a
    closure — use it within the same jit trace that produced it (the normal
    one-train-step pattern); it is not a cross-boundary pytree.
    """

    inner: Any
    vjp_fn: Any

    def row_gradient(self, g_combined: jax.Array) -> jax.Array:
        return self.vjp_fn(g_combined)[0]


def apply_sparse_gradients(
    lookup_obj,
    state,
    sctx: SparseLookupContext,
    g_combined: jax.Array,
    optimizer,
    step=0,
    epoch=0,
):
    """Apply optimizer to rows touched by a sparse lookup: chains the
    combined-output cotangent through the combiner, then runs the normal
    sparse apply (works for Variable and ShardedVariable)."""
    g_rows = sctx.row_gradient(g_combined)
    return lookup_obj.apply_gradients(
        state, sctx.inner, g_rows, optimizer, step=step, epoch=epoch
    )


def _normalize(
    var: Variable, ids: IdsLike, weights: Optional[jax.Array]
) -> Tuple[jax.Array, jax.Array, jax.Array, int, Tuple[int, ...]]:
    """-> (flat_ids, segment_ids, weights, num_rows, out_batch_shape)."""
    empty = var.empty_key
    if isinstance(ids, SparseIds):
        flat = ids.values
        seg = ids.row_ids()
        nrows = ids.num_rows
        batch_shape = tuple(ids.dense_shape[:-1])
        w = weights if weights is not None else jnp.ones(
            (flat.shape[0],), var.value_dtype
        )
    elif isinstance(ids, RaggedIds):
        flat = ids.values
        seg = ids.row_ids()
        nrows = ids.nrows
        batch_shape = (nrows,)
        w = weights if weights is not None else jnp.ones(
            (flat.shape[0],), var.value_dtype
        )
        w = jnp.where(ids.valid_mask(), w, 0.0)
        flat = jnp.where(ids.valid_mask(), flat, empty)
    else:
        arr = jnp.asarray(ids)
        assert arr.ndim >= 2, "padded-dense ids need shape [..., L]"
        batch_shape = tuple(arr.shape[:-1])
        nrows = int(np.prod(batch_shape))
        flat = arr.reshape(-1)
        seg = jnp.repeat(
            jnp.arange(nrows, dtype=jnp.int32), arr.shape[-1]
        )
        w = (
            weights.reshape(-1)
            if weights is not None
            else jnp.ones((flat.shape[0],), var.value_dtype)
        )
    valid = flat != empty
    w = jnp.where(valid, w, 0.0)
    return flat, seg, w, nrows, batch_shape


def embedding_lookup_sparse(
    var: Variable,
    state: hashtable.TableState,
    sp_ids: IdsLike,
    sp_weights: Optional[jax.Array] = None,
    combiner: str = "mean",
    *,
    training: bool = True,
    sharded=None,
):
    """Weighted segment-combined lookup (reference
    ``embedding_lookup_sparse`` dynamic_embedding_ops.py:120-293).

    Returns ``(combined [batch_shape + (dim,)], ctx)`` when training (ctx
    feeds ``apply_gradients`` — grads propagate through the combiner), else
    just ``combined``.
    """
    flat, seg, w, nrows, batch_shape = _normalize(var, sp_ids, sp_weights)
    lookup_obj = sharded if sharded is not None else var

    def combine(e):
        return segment.weighted_segment_combine(
            e, seg, nrows, weights=w, combiner=combiner
        ).reshape(batch_shape + (var.dim,))

    if training:
        emb, ctx = lookup_obj.embedding_lookup(state, flat)
        combined, vjp_fn = jax.vjp(combine, emb)
        return combined, SparseLookupContext(inner=ctx, vjp_fn=vjp_fn)
    emb = lookup_obj.lookup(state, flat)
    return combine(emb)


def safe_embedding_lookup_sparse(
    var: Variable,
    state: hashtable.TableState,
    sp_ids: IdsLike,
    sp_weights: Optional[jax.Array] = None,
    combiner: str = "mean",
    default_id: Optional[int] = None,
    *,
    training: bool = True,
    sharded=None,
):
    """Reference ``safe_embedding_lookup_sparse``
    (dynamic_embedding_ops.py:296-429): prunes invalid ids/weights, fills
    empty rows (with ``default_id``'s embedding or zeros), and guarantees a
    well-defined output for every row.

    In the static-shape design pruning = masking weights to zero, and empty
    rows fall out of the combiner's zero-denominator guard; ``default_id``
    rows are patched in afterwards.
    """
    flat, seg, w, nrows, batch_shape = _normalize(var, sp_ids, sp_weights)
    # prune: negative ids and non-positive weights are invalid
    invalid = (flat < 0) | (w <= 0)
    w = jnp.where(invalid, 0.0, w)
    flat = jnp.where(invalid, var.empty_key, flat)

    lookup_obj = sharded if sharded is not None else var
    row_has = (
        jax.ops.segment_sum(
            (w > 0).astype(jnp.int32), seg, num_segments=nrows
        )
        > 0
    )
    if default_id is not None:
        dflt_ids = jnp.full((nrows,), default_id, var.key_dtype)
        dflt = (
            sharded.lookup(state, dflt_ids)
            if sharded is not None
            else var.lookup(
                state, dflt_ids, use_init_for_missing=training
            )
        )
    else:
        dflt = jnp.zeros((nrows, var.dim), var.value_dtype)

    def combine(e):
        c = segment.weighted_segment_combine(
            e, seg, nrows, weights=w, combiner=combiner
        )
        c = jnp.where(row_has[:, None], c, dflt)
        return c.reshape(batch_shape + (var.dim,))

    if training:
        emb, ctx = lookup_obj.embedding_lookup(state, flat)
        combined, vjp_fn = jax.vjp(combine, emb)
        return combined, SparseLookupContext(inner=ctx, vjp_fn=vjp_fn)
    emb = lookup_obj.lookup(state, flat)
    return combine(emb)


# ---------------------------------------------------------------------------
# de.math sparse-tensor helpers (parity: python/ops/math_ops.py:168-230)
# ---------------------------------------------------------------------------


def sparse_fill_empty_rows(sp: SparseIds, default_value, empty_key=None):
    """Static-shape ``tf.sparse.fill_empty_rows``: rows with no entries get
    one entry (``default_value``); returns (new_sp, empty_row_indicator).

    Output nnz = nnz + num_rows (worst case), padded with EMPTY.
    """
    assert len(sp.dense_shape) == 2, "fill_empty_rows expects rank 2"
    b = sp.dense_shape[0]
    if empty_key is None:
        empty_key = hashing.empty_key_for(np.dtype(sp.values.dtype))
    valid = sp.values != empty_key
    rid = sp.indices[:, 0].astype(jnp.int32)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), rid, num_segments=b
    )
    is_empty = counts == 0
    fill_rows = jnp.arange(b, dtype=jnp.int32)
    fill_vals = jnp.where(
        is_empty, jnp.asarray(default_value, sp.values.dtype), empty_key
    )
    new_indices = jnp.concatenate(
        [
            sp.indices,
            jnp.stack(
                [fill_rows, jnp.zeros((b,), sp.indices.dtype)], axis=1
            ).astype(sp.indices.dtype),
        ]
    )
    new_values = jnp.concatenate([sp.values, fill_vals])
    return (
        SparseIds(new_indices, new_values, sp.dense_shape),
        is_empty,
    )


def sparse_reshape(sp: SparseIds, new_shape) -> SparseIds:
    """Static ``tf.sparse.reshape`` (row-major relabeling of indices)."""
    old = sp.dense_shape
    new_shape = tuple(int(x) for x in new_shape)
    if any(d == -1 for d in new_shape):
        known = int(np.prod([d for d in new_shape if d != -1]))
        infer = int(np.prod(old)) // known
        new_shape = tuple(infer if d == -1 else d for d in new_shape)
    assert int(np.prod(old)) == int(np.prod(new_shape))
    mult_old = np.cumprod([1] + list(old[::-1]))[::-1][1:]
    lin = jnp.zeros((sp.nnz,), jnp.int64)
    for d in range(len(old)):
        lin = lin + sp.indices[:, d].astype(jnp.int64) * np.int64(mult_old[d])
    mult_new = np.cumprod([1] + list(new_shape[::-1]))[::-1][1:]
    cols = []
    for d in range(len(new_shape)):
        cols.append((lin // np.int64(mult_new[d])) % np.int64(new_shape[d]))
    new_indices = jnp.stack(cols, axis=1).astype(sp.indices.dtype)
    return SparseIds(new_indices, sp.values, new_shape)


def dense_to_sparse(padded: jax.Array, empty_key=None) -> SparseIds:
    """[B, L] padded ids -> COO SparseIds (static nnz = B*L)."""
    b, l = padded.shape
    if empty_key is None:
        empty_key = hashing.empty_key_for(np.dtype(padded.dtype))
    rows = jnp.repeat(jnp.arange(b, dtype=jnp.int32), l)
    cols = jnp.tile(jnp.arange(l, dtype=jnp.int32), b)
    return SparseIds(
        jnp.stack([rows, cols], axis=1), padded.reshape(-1), (b, l)
    )
