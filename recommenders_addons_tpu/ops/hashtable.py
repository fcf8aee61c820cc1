"""TPU-native dynamic-embedding hashtable.

A from-scratch, pure-functional re-design of the reference's mutable KV table
resources (CPU cuckoo: core/kernels/cuckoo_hashtable_op.cc:184-210; GPU HKV:
core/kernels/hkv_hashtable_op_gpu.cu.cc:58-653). Rather than translate those
C++/CUDA structures, the table is designed for XLA's static-shape, functional
model:

  * **Set-associative bucket layout** (the HKV design, which is itself cache
    semantics): capacity = ``num_buckets * bucket_size``; a key hashes to
    exactly ONE bucket. Find = one vectorized gather of the bucket's keys +
    a lane-wide compare (maps 1:1 onto the VPU's 8x128 lanes).
  * **Capacity-bounded with min-score eviction**: inserting into a full bucket
    evicts the lowest-score slot (LRU/LFU/epoch scores, mirroring
    ``HkvEvictStrategy`` — reference dynamic_embedding_creator.py:140-169).
    No rehash/growth is needed, so all shapes stay static under ``jit``.
  * **State is a pytree** (`TableState`): keys [C], values [C, D], scores [C],
    plus optimizer slot columns {name: [C, D]}. Every op returns a new state;
    with buffer donation XLA updates the multi-GB arrays in place.

Batch-insert conflict resolution (the role of libcuckoo's locking /
HKV's CUDA atomics) is done *algebraically*: keys are ranked within their
bucket, the k-th unmatched key claims the k-th free slot (or the k-th
lowest-score victim), so all scatter indices are distinct by construction and
a single conflict-free scatter commits the batch. Duplicate keys in a batch
must be deduplicated first (`unique_static`), the same contract HKV imposes
(reference keras/layers/embedding.py:162-165).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashing

INT64_MAX = np.int64(np.iinfo(np.int64).max)


def _round_up_pow2(x: int) -> int:
    return 1 << (int(x) - 1).bit_length()


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """Static configuration of one table shard (hashable; safe to close over
    in jitted functions).

    Mirrors the knobs of the reference's ``HkvHashTableConfig``
    (dynamic_embedding_creator.py:149-169): capacity is bounded
    (init == max, as the reference defaults hint, creator.py:31-32) and
    eviction keeps it that way.
    """

    dim: int
    capacity: int = 1024 * 1024  # max keys (HKV default 1Mi, creator.py:31)
    key_dtype: Any = jnp.int64
    value_dtype: Any = jnp.float32
    score_dtype: Any = jnp.int64
    bucket_size: int = 64

    def __post_init__(self):
        cap = _round_up_pow2(max(int(self.capacity), self.bucket_size))
        object.__setattr__(self, "capacity", cap)
        assert self.bucket_size & (self.bucket_size - 1) == 0

    @property
    def num_buckets(self) -> int:
        return self.capacity // self.bucket_size

    @property
    def empty_key(self):
        return hashing.empty_key_for(np.dtype(self.key_dtype))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("keys", "values", "scores", "slots"),
    meta_fields=("slot_inits",),
)
@dataclasses.dataclass
class TableState:
    """One shard's storage. All arrays share the slot axis of size capacity."""

    keys: jax.Array  # [C] key_dtype; EMPTY sentinel marks free slots
    values: jax.Array  # [C, D] value_dtype
    scores: jax.Array  # [C] score_dtype (eviction priority; higher = hotter)
    slots: Dict[str, jax.Array]  # optimizer slot columns, each [C, D]
    # static: ((name, fresh-row fill value), ...) used when eviction frees a
    # slot (e.g. Adagrad's initial accumulator)
    slot_inits: tuple = ()

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def dim(self) -> int:
        return self.values.shape[1]

    def slot_init(self, name: str) -> float:
        return dict(self.slot_inits).get(name, 0.0)


def create(spec: TableSpec) -> TableState:
    """Fresh empty table (the reference's table-resource ctor,
    cuckoo_hashtable_op.cc:187-209)."""
    return TableState(
        keys=jnp.full((spec.capacity,), spec.empty_key, dtype=spec.key_dtype),
        values=jnp.zeros((spec.capacity, spec.dim), dtype=spec.value_dtype),
        scores=jnp.zeros((spec.capacity,), dtype=spec.score_dtype),
        slots={},
    )


def with_slot(state: TableState, name: str, init: float = 0.0) -> TableState:
    """Add an optimizer slot column (the reference creates slots as sibling
    tables with the same partitioner — dynamic_embedding_optimizer.py:870-958;
    here they are extra columns of the same shard, so updates stay local)."""
    if name in state.slots:
        return state
    col = jnp.full_like(state.values, init)
    return dataclasses.replace(
        state,
        slots={**state.slots, name: col},
        slot_inits=tuple(
            sorted(dict(state.slot_inits, **{name: float(init)}).items())
        ),
    )


# ---------------------------------------------------------------------------
# probing
# ---------------------------------------------------------------------------


def _bucket_slots(spec: TableSpec, keys: jax.Array):
    """Return ([N] bucket base slot, [N, B] candidate slot indices)."""
    b = hashing.bucket_of(keys, spec.num_buckets)
    base = b * np.int32(spec.bucket_size)
    offs = base[:, None] + jnp.arange(spec.bucket_size, dtype=jnp.int32)[None, :]
    return base, offs


def find(spec: TableSpec, state: TableState, keys: jax.Array):
    """Vectorized probe. Returns ``(slot [N] int32, found [N] bool)``.

    ``slot`` is only meaningful where ``found``. Keys equal to the EMPTY
    sentinel (padding) are reported not-found. Equivalent of the reference's
    ``find / find_with_exists`` kernels (cuckoo_hashtable_op.cc:39-63,
    lookup_table_op_hkv.h:730-745).
    """
    base, offs = _bucket_slots(spec, keys)
    cand = state.keys[offs]  # [N, B] gather
    match = cand == keys[:, None]
    found = jnp.any(match, axis=-1) & (keys != spec.empty_key)
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot = base + pos
    return jnp.where(found, slot, 0), found


def gather(
    spec: TableSpec,
    state: TableState,
    slot: jax.Array,
    found: jax.Array,
    default_values: jax.Array,
):
    """Rows at ``slot`` where found else ``default_values`` ([N, D] or [D])."""
    rows = state.values[slot]
    default_values = jnp.asarray(default_values, dtype=spec.value_dtype)
    if default_values.ndim < 2:
        default_values = jnp.broadcast_to(default_values, rows.shape)
    return jnp.where(found[:, None], rows, default_values)


def lookup(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
    default_values: jax.Array | float = 0.0,
):
    """Pure lookup: values for found keys, defaults for missing (the
    inference path — reference ``Variable.lookup``
    dynamic_embedding_variable.py:933-986)."""
    slot, found = find(spec, state, keys)
    if not isinstance(default_values, jax.Array):
        default_values = jnp.full(
            (spec.dim,), default_values, dtype=spec.value_dtype
        )
    return gather(spec, state, slot, found, default_values), found


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------


def _segment_rank(sort_key: jax.Array, num_segments_sentinel: int):
    """Rank of each element within its equal-valued group (vectorized).

    ``sort_key`` entries equal to ``num_segments_sentinel`` are "inactive" but
    still get ranks within that group (harmless).
    """
    n = sort_key.shape[0]
    order = jnp.argsort(sort_key, stable=True)
    sorted_k = sort_key[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_k[1:] != sorted_k[:-1]]
    )
    start_idx = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank_sorted = idx - start_idx
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    return rank


def _plan_writes(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
):
    """Assign a distinct slot to every valid key: its match, a free slot, or a
    min-score eviction victim in its bucket.

    Returns (slot [N], found [N], inserted [N], dropped [N]).
    ``dropped`` marks keys that could not be placed (bucket fully claimed by
    this same batch — only possible when > bucket_size new keys hash to one
    bucket in a single batch).
    Precondition: ``keys`` deduplicated (padding with EMPTY allowed).
    """
    n = keys.shape[0]
    cap = state.capacity
    valid = keys != spec.empty_key
    base, offs = _bucket_slots(spec, keys)
    cand = state.keys[offs]  # [N, B]
    match = cand == keys[:, None]
    found = jnp.any(match, axis=-1) & valid
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot_found = base + pos

    # Slots matched by this batch are not free and not evictable.
    claim_idx = jnp.where(found, slot_found, cap)
    claimed = (
        jnp.zeros((cap,), jnp.bool_).at[claim_idx].set(True, mode="drop")
    )
    claimed_b = claimed[offs]  # [N, B]

    empty_b = cand == spec.empty_key
    free_b = empty_b & ~claimed_b
    num_free = jnp.sum(free_b, axis=-1).astype(jnp.int32)

    need = valid & ~found
    bucket_id = base // np.int32(spec.bucket_size)
    rank = _segment_rank(
        jnp.where(need, bucket_id, np.int32(spec.num_buckets)),
        spec.num_buckets,
    )

    # k-th free position via cumulative count.
    cf = jnp.cumsum(free_b.astype(jnp.int32), axis=-1)
    kth_free = jnp.argmax(cf == (rank + 1)[:, None], axis=-1).astype(jnp.int32)

    # Eviction: k-th lowest score among occupied, unclaimed slots.
    evictable_b = ~empty_b & ~claimed_b
    sc = state.scores[offs]
    sc = jnp.where(evictable_b, sc, INT64_MAX.astype(sc.dtype))
    perm = jnp.argsort(sc, axis=-1).astype(jnp.int32)  # ascending score
    evict_rank = jnp.clip(rank - num_free, 0, spec.bucket_size - 1)
    kth_evict = jnp.take_along_axis(perm, evict_rank[:, None], axis=-1)[:, 0]
    num_evictable = jnp.sum(evictable_b, axis=-1).astype(jnp.int32)

    use_free = rank < num_free
    dropped = need & (rank >= num_free + num_evictable)
    inserted = need & ~dropped
    pos_new = jnp.where(use_free, kth_free, kth_evict)
    slot_new = base + pos_new

    slot = jnp.where(found, slot_found, slot_new)
    return slot, found, inserted, dropped


def commit(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
    values: Optional[jax.Array] = None,
    deltas: Optional[jax.Array] = None,
    slot_rows: Optional[Dict[str, jax.Array]] = None,
    scores: Optional[jax.Array] = None,
    *,
    score_mode: str = "assign",  # "assign" (LRU-style) | "add" (LFU-style)
    return_evicted: bool = False,
):
    """One planned, conflict-free batch write: keys + values (+optimizer slot
    rows, +scores) in a single scatter pass.

    * ``values`` set: insert-or-assign (``deltas`` then applies only to keys
      NOT covered by ``values``... normally pass one or the other).
    * ``deltas`` set without ``values``: insert-or-accum (bp_v2). New keys get
      the delta as their value.
    * ``slot_rows``: written for all placed keys; slot columns of evicted
      victims are reset to zero first.
    * ``return_evicted``: also return the rows displaced by score eviction
      — ``(state, evicted)`` where evicted is a dict with ``keys [N]``
      (EMPTY where nothing was displaced), ``values [N, D]``, ``scores
      [N]``, ``slots {name: [N, D]}`` — so callers can spill them to the
      host tier (the HKV hybrid role, lookup_table_op_hkv.h:428-513)
      instead of losing them.

    Precondition: keys deduplicated; EMPTY-sentinel entries are ignored.
    """
    slot, found, inserted, _ = _plan_writes(spec, state, keys)
    evicted = None
    if return_evicted:
        old_keys = state.keys[slot]
        displaced = inserted & (old_keys != spec.empty_key)
        evicted = {
            "keys": jnp.where(displaced, old_keys, spec.empty_key),
            "values": state.values[slot],
            "scores": jnp.where(displaced, state.scores[slot], 0),
            "slots": {n: c[slot] for n, c in state.slots.items()},
        }
    write = found | inserted
    idx = jnp.where(write, slot, state.capacity)  # OOB => dropped scatter
    ins_idx = jnp.where(inserted, slot, state.capacity)

    new_keys = state.keys.at[idx].set(keys, mode="drop")

    new_values = state.values
    if deltas is not None:
        add_idx = jnp.where(found, slot, state.capacity)
        new_values = new_values.at[add_idx].add(
            deltas.astype(spec.value_dtype), mode="drop"
        )
        ins_vals = values if values is not None else deltas
        new_values = new_values.at[ins_idx].set(
            ins_vals.astype(spec.value_dtype), mode="drop"
        )
    elif values is not None:
        new_values = new_values.at[idx].set(
            values.astype(spec.value_dtype), mode="drop"
        )

    if scores is None:
        scores = jnp.ones(keys.shape, dtype=spec.score_dtype)
    scores = scores.astype(spec.score_dtype)
    if score_mode == "add":
        new_sc = scores + jnp.where(found, state.scores[slot], 0)
    else:
        new_sc = scores
    new_scores = state.scores.at[idx].set(new_sc, mode="drop")

    # Newly inserted (incl. eviction victims) must reset slot columns: the old
    # optimizer rows belong to the evicted key.
    new_slots = {}
    slot_rows = slot_rows or {}
    for name, col in state.slots.items():
        if name in slot_rows:
            col = col.at[idx].set(
                slot_rows[name].astype(col.dtype), mode="drop"
            )
        else:
            fresh = jnp.full(
                (keys.shape[0], col.shape[1]), state.slot_init(name), col.dtype
            )
            col = col.at[ins_idx].set(fresh, mode="drop")
        new_slots[name] = col
    new_state = TableState(new_keys, new_values, new_scores, new_slots,
                           state.slot_inits)
    if return_evicted:
        return new_state, evicted
    return new_state


def upsert(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
    values: jax.Array,
    scores: Optional[jax.Array] = None,
    *,
    score_mode: str = "assign",
) -> TableState:
    """Insert-or-assign a batch of (deduplicated) keys.

    Reference semantics: ``Variable.upsert`` / insert_or_assign
    (dynamic_embedding_variable.py:772-804; cuckoo_hashtable_op.cc:66-111),
    plus HKV's insert-with-scores + bucket eviction
    (lookup_table_op_hkv.h:428-539).
    """
    return commit(
        spec, state, keys, values=values, scores=scores, score_mode=score_mode
    )


def accum(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
    deltas: jax.Array,
    values_for_new: Optional[jax.Array] = None,
    scores: Optional[jax.Array] = None,
    *,
    score_mode: str = "assign",
) -> TableState:
    """bp_v2 delta write: add ``deltas`` to existing rows; insert
    ``values_for_new`` (or the delta itself) for missing keys (reference
    ``Variable.accum`` dynamic_embedding_variable.py:806-855, insert_or_accum
    cuckoo_hashtable_op.cc:114-182)."""
    return commit(
        spec,
        state,
        keys,
        values=values_for_new,
        deltas=deltas,
        scores=scores,
        score_mode=score_mode,
    )


def scatter_rows(
    spec: TableSpec,
    state: TableState,
    slot: jax.Array,
    mask: jax.Array,
    values: Optional[jax.Array] = None,
    scores: Optional[jax.Array] = None,
    slot_rows: Optional[Dict[str, jax.Array]] = None,
    *,
    score_mode: str = "assign",
) -> TableState:
    """Low-level conflict-free writeback to known slots (the optimizer fast
    path after a training lookup already planned the slots)."""
    idx = jnp.where(mask, slot, state.capacity)
    new_values = state.values
    if values is not None:
        new_values = new_values.at[idx].set(
            values.astype(spec.value_dtype), mode="drop"
        )
    new_scores = state.scores
    if scores is not None:
        scores = scores.astype(spec.score_dtype)
        if score_mode == "add":
            scores = scores + jnp.where(mask, state.scores[slot], 0)
        new_scores = new_scores.at[idx].set(scores, mode="drop")
    new_slots = dict(state.slots)
    if slot_rows:
        for name, rows in slot_rows.items():
            new_slots[name] = state.slots[name].at[idx].set(
                rows.astype(state.slots[name].dtype), mode="drop"
            )
    return TableState(state.keys, new_values, new_scores, new_slots,
                      state.slot_inits)


# ---------------------------------------------------------------------------
# removal / export / stats
# ---------------------------------------------------------------------------


def remove(spec: TableSpec, state: TableState, keys: jax.Array) -> TableState:
    """Delete keys (reference ``Variable.remove``
    dynamic_embedding_variable.py:877-905). Bucket-local insertion means
    removal never breaks probe chains."""
    slot, found = find(spec, state, keys)
    idx = jnp.where(found, slot, state.capacity)
    new_keys = state.keys.at[idx].set(
        jnp.full_like(keys, spec.empty_key), mode="drop"
    )
    new_scores = state.scores.at[idx].set(
        jnp.zeros(keys.shape, spec.score_dtype), mode="drop"
    )
    return TableState(new_keys, state.values, new_scores, state.slots,
                      state.slot_inits)


def clear(spec: TableSpec, state: TableState) -> TableState:
    """Empty the table (reference ``Variable.clear``)."""
    return dataclasses.replace(
        create(spec),
        slots={k: jnp.zeros_like(v) for k, v in state.slots.items()},
    )


def size(spec: TableSpec, state: TableState) -> jax.Array:
    """Live-key count (reference ``Variable.size``
    dynamic_embedding_variable.py:1133-1153)."""
    return jnp.sum(state.keys != spec.empty_key).astype(jnp.int64)


def occupancy_mask(spec: TableSpec, state: TableState) -> jax.Array:
    return state.keys != spec.empty_key


def export(spec: TableSpec, state: TableState):
    """Full dump ``(keys [C], values [C, D], mask [C])`` — static-shape
    equivalent of the reference's export op (cuckoo_hashtable_op.cc:310-391).
    Compaction happens host-side (see train/checkpoint.py)."""
    return state.keys, state.values, occupancy_mask(spec, state)


def export_with_scores(spec: TableSpec, state: TableState):
    """HKV parity: ``export_keys_and_scores``
    (reference hkv_hashtable_ops.py:420-434)."""
    return state.keys, state.values, state.scores, occupancy_mask(spec, state)


def evict_lowest(
    spec: TableSpec, state: TableState, num_evict: int
) -> TableState:
    """Remove the ``num_evict`` lowest-score live keys (global top-k eviction;
    the role of the reference's RestrictPolicy apply_restriction
    restrict_policies.py:181-229 and HKV's evict strategies)."""
    mask = occupancy_mask(spec, state)
    sc = jnp.where(mask, state.scores, INT64_MAX.astype(spec.score_dtype))
    # lowest-k scores -> victims (integer top-k: full score precision)
    _, victim_slots = jax.lax.top_k(-sc, num_evict)
    victim_valid = mask[victim_slots]
    idx = jnp.where(victim_valid, victim_slots.astype(jnp.int32), state.capacity)
    new_keys = state.keys.at[idx].set(
        jnp.full((num_evict,), spec.empty_key, spec.key_dtype), mode="drop"
    )
    new_scores = state.scores.at[idx].set(
        jnp.zeros((num_evict,), spec.score_dtype), mode="drop"
    )
    return TableState(new_keys, state.values, new_scores, state.slots,
                      state.slot_inits)


# ---------------------------------------------------------------------------
# batch utilities
# ---------------------------------------------------------------------------


def unique_static(keys: jax.Array, size: Optional[int] = None, fill=None):
    """Static-shape dedup: ``(unique [size] padded with EMPTY, inverse [N])``.

    The TPU replacement for ``tf.unique`` in the reference's
    ``embedding_lookup_unique`` (dynamic_embedding_ops.py:64-117): output size
    is pinned to ``size`` (default N) and padded with the EMPTY sentinel.
    """
    n = keys.shape[0]
    size = size or n
    if fill is None:
        fill = hashing.empty_key_for(np.dtype(keys.dtype))
    uniq, inverse = jnp.unique(
        keys, size=size, fill_value=fill, return_inverse=True
    )
    return uniq, inverse.reshape(keys.shape).astype(jnp.int32)
