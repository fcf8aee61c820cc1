"""TPU-native dynamic-embedding hashtable.

A from-scratch, pure-functional re-design of the reference's mutable KV table
resources (CPU cuckoo: core/kernels/cuckoo_hashtable_op.cc:184-210; GPU HKV:
core/kernels/hkv_hashtable_op_gpu.cu.cc:58-653). Rather than translate those
C++/CUDA structures, the table is designed for XLA's static-shape, functional
model and the TPU memory system:

  * **Set-associative bucket layout** (the HKV design, which is itself cache
    semantics): capacity = ``num_buckets * bucket_size``; a key hashes to
    exactly ONE bucket. Find = one row-gather of the bucket's keys +
    a lane-wide compare (maps 1:1 onto the VPU's 8x128 lanes).
  * **Capacity-bounded with min-score eviction**: inserting into a full bucket
    evicts the lowest-score slot (LRU/LFU/epoch scores, mirroring
    ``HkvEvictStrategy`` — reference dynamic_embedding_creator.py:140-169).
    No rehash/growth is needed, so all shapes stay static under ``jit``.
  * **Packed row block**: the embedding vector and every optimizer slot row
    live contiguously in ONE ``[C, W]`` array (``[value | slot_0 | ... |
    pad-to-128-lanes]``) — HKV stores vectors the same way. One Pallas DMA
    (ops/pallas_ops.py) moves a key's entire training state, O(batch)
    instead of XLA's O(capacity) table-streaming gathers/scatters.
  * **State is a pytree** (`TableState`): keys [C], scores [C], rows [C, W].
    Every op returns a new state; with buffer donation XLA updates the
    multi-GB arrays in place.

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
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashing, pallas_ops

INT64_MAX = np.int64(np.iinfo(np.int64).max)
_LANES = 128


def _round_up_pow2(x: int) -> int:
    return 1 << (int(x) - 1).bit_length()


def _pad_width(w: int) -> int:
    return (w + _LANES - 1) // _LANES * _LANES


def _score_max(dtype) -> np.generic:
    return np.iinfo(np.dtype(dtype)).max


def split_key(k64: jax.Array):
    """int64 keys -> (lo, hi) int32 planes.

    PERF: XLA scatters of int64 elements cost ~7.5 ms at N=64Ki on v5e in
    every bounds mode, while int32 scatters are ~free; all stored key
    columns are therefore int32 pairs (the int64 view is reconstructed on
    demand for export paths)."""
    u = k64.astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)
    return lo, hi


def join_key(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(lo, hi) int32 planes -> int64 keys."""
    u = (
        hi.astype(jnp.uint32).astype(jnp.uint64) << jnp.uint64(32)
    ) | lo.astype(jnp.uint32).astype(jnp.uint64)
    return u.astype(jnp.int64)


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
    score_dtype: Any = jnp.int32
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
    data_fields=("key_lo", "key_hi", "rows", "scores"),
    meta_fields=("dim", "slot_names", "slot_inits", "key_dtype_name",
                 "value_dtype_name"),
)
@dataclasses.dataclass
class TableState:
    """One shard's storage.

    ``rows`` packs the value vector and optimizer slot columns:
    ``rows[:, :dim]`` is the embedding, slot ``i`` (by ``slot_names`` order)
    occupies ``rows[:, dim*(1+i) : dim*(2+i)]``; the tail up to the 128-lane
    padded width is unused. This is the layout the Pallas row-DMA kernels
    require (pallas_ops.py) and mirrors HKV's contiguous vectors.

    Keys are stored as two int32 planes (see :func:`split_key` for why);
    ``state.keys`` reconstructs the int64 view.

    ``rows`` is stored PHYSICALLY as ``[(C+1) * W/128, 128]`` (the shape
    the Pallas DMA kernels address) — XLA's buffer aliasing only sees
    through identity reshapes, so handing the kernels a pre-shaped buffer
    keeps the in-place scatter alias intact even inside ``lax.scan`` (a
    logical [C, W] operand would be reshaped and cost a full-table copy
    per scan iteration). The extra row block at logical index ``C`` is the
    TRASH ROW: the drop sentinel (``capacity``) redirects writes there so
    the DMA issue loops run branch-free (~2.4x faster issue rate,
    tools/dma_bench.py). ``state.rows_logical`` is the [C, W] view (trash
    excluded).
    """

    key_lo: jax.Array  # [C] int32 (low 32 bits; EMPTY -> 0)
    key_hi: jax.Array  # [C] int32 (high 32 bits; EMPTY -> int32 min)
    rows: jax.Array  # [(C+1) * W/128, 128] value_dtype (physical)
    scores: jax.Array  # [C] score_dtype (eviction priority; higher = hotter)
    dim: int = 0
    slot_names: tuple = ()
    slot_inits: tuple = ()  # ((name, fresh-row fill), ...)
    key_dtype_name: str = "int64"
    value_dtype_name: str = "float32"

    @property
    def capacity(self) -> int:
        return self.key_lo.shape[-1]

    @property
    def keys(self) -> jax.Array:
        """[C] int64 (or key_dtype) view of the stored keys."""
        k = join_key(self.key_lo, self.key_hi)
        if self.key_dtype_name != "int64":
            k = k.astype(jnp.dtype(self.key_dtype_name))
        return k

    @property
    def value_dtype(self):
        return jnp.dtype(self.value_dtype_name)

    @property
    def width(self) -> int:
        """Logical packed-row width in VALUE elements (dim * (1+n_slots),
        padded so the physical container is 128-lane aligned)."""
        return _packed_width(self.dim, len(self.slot_names),
                             self.value_dtype)

    @property
    def chunks(self) -> int:
        """Physical 128-lane container rows per logical row."""
        return self.width // (_LANES * _pack_factor(self.value_dtype))

    @property
    def rows_logical(self) -> jax.Array:
        """[..., C, W] logical view of the physical [..., (C+1)*ch, 128]
        rows (trash row excluded; bitcast for 16-bit value dtypes; stacked
        [S, ...] states work)."""
        return _to_logical_rows(self.rows, self.value_dtype,
                                self.capacity, self.width)

    def with_rows_logical(self, new_logical: jax.Array) -> "TableState":
        """Rebuild the state from a modified [..., C, W] logical view
        (re-appends the trash row block)."""
        return self.replace(rows=_to_physical_rows(
            new_logical.astype(self.value_dtype), self.rows.dtype,
            self.capacity * self.chunks, trash_row=True,
        ))

    @property
    def values(self) -> jax.Array:
        """[..., dim] view of the embedding columns."""
        return self.rows_logical[..., : self.dim]

    @property
    def slots(self) -> Dict[str, jax.Array]:
        """{name: [..., dim]} views of the optimizer slot columns."""
        d = self.dim
        rl = self.rows_logical
        return {
            name: rl[..., d * (1 + i): d * (2 + i)]
            for i, name in enumerate(self.slot_names)
        }

    def slot_init(self, name: str) -> float:
        return dict(self.slot_inits).get(name, 0.0)

    def slot_offset(self, name: str) -> int:
        return self.dim * (1 + self.slot_names.index(name))

    def replace(self, **kw) -> "TableState":
        return dataclasses.replace(self, **kw)


def _container_dtype(value_dtype):
    """Physical storage dtype: 32-bit container for sub-32-bit values
    (bitcast-packed) so the Pallas DMA kernels — which Mosaic only accepts
    for 32-bit 128-lane layouts — serve bf16/f16/int8 tables too."""
    dt = np.dtype(value_dtype)
    if dt.itemsize == 2:
        return jnp.float32
    if dt == np.dtype(np.int8):
        return jnp.int32
    return jnp.dtype(value_dtype)


def _pack_factor(value_dtype) -> int:
    """Logical values per physical container element (1 when the container
    IS the value dtype)."""
    dt = np.dtype(value_dtype)
    cdt = np.dtype(_container_dtype(value_dtype))
    if cdt.name == dt.name:
        return 1
    return cdt.itemsize // dt.itemsize


def _packed_width(dim: int, n_slots: int, value_dtype=jnp.float32) -> int:
    pf = _pack_factor(value_dtype)
    w = dim * (1 + n_slots)
    return (w + _LANES * pf - 1) // (_LANES * pf) * (_LANES * pf)


def _to_logical_rows(rows_phys: jax.Array, value_dtype, n_rows: int,
                     width: int) -> jax.Array:
    """[..., >=n*ch, 128] physical container -> [..., n, W] logical values
    (extra physical rows — the trash row block — are sliced off)."""
    dt = jnp.dtype(value_dtype)
    lead = rows_phys.shape[:-2]
    pf = _pack_factor(dt)
    lanes_rows = n_rows * (width // (_LANES * pf))
    if rows_phys.shape[-2] != lanes_rows:
        rows_phys = rows_phys[..., :lanes_rows, :]
    if rows_phys.dtype == dt:
        return rows_phys.reshape(lead + (n_rows, width))
    half = jax.lax.bitcast_convert_type(rows_phys, dt)  # [..., 128, pf]
    return half.reshape(lead + (n_rows, width))


def _to_physical_rows(rows_logical: jax.Array, container_dtype,
                      lanes_rows: int, trash_row: bool = False) -> jax.Array:
    """[..., n, W] logical -> [..., n*ch (+ch), 128] physical container.
    ``trash_row=True`` appends the zeroed trash row block tables carry
    (see TableState docstring); payload conversions leave it off."""
    lead = rows_logical.shape[:-2]
    if rows_logical.dtype == jnp.dtype(container_dtype):
        phys = rows_logical.reshape(lead + (lanes_rows, _LANES))
    else:
        pf = _pack_factor(rows_logical.dtype)
        x = rows_logical.reshape(lead + (lanes_rows, _LANES, pf))
        phys = jax.lax.bitcast_convert_type(x, container_dtype)
    if trash_row:
        ch = lanes_rows // max(rows_logical.shape[-2], 1)
        phys = jnp.concatenate(
            [phys, jnp.zeros(lead + (ch, _LANES), phys.dtype)], axis=-2
        )
    return phys


def create(spec: TableSpec) -> TableState:
    """Fresh empty table (the reference's table-resource ctor,
    cuckoo_hashtable_op.cc:187-209)."""
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    return TableState(
        key_lo=jnp.full((spec.capacity,), e_lo, jnp.int32),
        key_hi=jnp.full((spec.capacity,), e_hi, jnp.int32),
        rows=jnp.zeros(
            ((spec.capacity + 1)  # +1: trash row for sentinel writes
             * (_packed_width(spec.dim, 0, spec.value_dtype)
                // (_LANES * _pack_factor(spec.value_dtype))),
             _LANES),
            _container_dtype(spec.value_dtype),
        ),
        scores=jnp.zeros((spec.capacity,), dtype=spec.score_dtype),
        dim=spec.dim,
        slot_names=(),
        slot_inits=(),
        key_dtype_name=np.dtype(spec.key_dtype).name,
        value_dtype_name=np.dtype(spec.value_dtype).name,
    )


def _trim_trash(rows_phys: jax.Array, lead, lanes_rows: int) -> jax.Array:
    """Drop the trailing trash-row block from a physical rows array."""
    if rows_phys.shape[-2] != lanes_rows:
        rows_phys = rows_phys[..., :lanes_rows, :]
    return rows_phys


def with_slot(state: TableState, name: str, init: float = 0.0) -> TableState:
    """Add an optimizer slot column block (the reference creates slots as
    sibling tables with the same partitioner —
    dynamic_embedding_optimizer.py:870-958; here they are extra columns of
    the same packed row, so an optimizer step is ONE gather + ONE scatter)."""
    if name in state.slot_names:
        return state
    names = tuple(sorted(state.slot_names + (name,)))
    inits = dict(state.slot_inits)
    inits[name] = float(init)
    d = state.dim
    vdt = state.value_dtype
    pf = _pack_factor(vdt)
    new_w = _packed_width(d, len(names), vdt)
    lead = state.key_lo.shape  # (C,) or (S, C) for stacked sharded state
    cap = state.capacity
    if pf > 1 and d % pf == 0:
        # container-word space: column blocks map 1:1 onto word blocks
        # (d % pf == 0), so the rebuild never materializes a table-wide
        # 16-bit view — XLA's TPU layout for a [C*ch, 128, pf] bitcast
        # intermediate mis-sizes its allocation at some shapes (observed:
        # a 512 MB bf16 bitcast rejected as a 32 GB allocation on v5e)
        dw = d // pf
        ch = state.chunks
        bshape = lead[:-1]  # leading stack dims (capacity excluded)
        view = _trim_trash(state.rows, bshape, cap * ch).reshape(
            bshape + (cap, ch * _LANES))
        cols = [view[..., :dw]]
        for n in names:
            if n in state.slot_names:
                off = d * (1 + state.slot_names.index(n)) // pf
                cols.append(view[..., off:off + dw])
            else:
                fill_word = np.asarray(
                    [inits[n]] * pf, np.dtype(vdt)
                ).view(np.dtype(state.rows.dtype))[0]
                cols.append(jnp.full(bshape + (cap, dw), fill_word,
                                     state.rows.dtype))
        packed = jnp.concatenate(cols, axis=-1)
        new_ww = new_w // pf  # container words per row
        if packed.shape[-1] < new_ww:
            packed = jnp.concatenate(
                [packed,
                 jnp.zeros(bshape + (cap, new_ww - packed.shape[-1]),
                           state.rows.dtype)], axis=-1)
        phys = packed.reshape(bshape + (cap * (new_ww // _LANES), _LANES))
        phys = jnp.concatenate(
            [phys, jnp.zeros(bshape + (new_ww // _LANES, _LANES),
                             phys.dtype)], axis=-2)  # trash row
        return state.replace(
            rows=phys, slot_names=names,
            slot_inits=tuple(sorted(inits.items())),
        )
    cols = [state.values]
    old_slots = state.slots
    for n in names:
        if n in old_slots:
            cols.append(old_slots[n])
        else:
            cols.append(jnp.full(lead + (d,), inits[n], vdt))
    packed = jnp.concatenate(cols, axis=-1)
    if packed.shape[-1] < new_w:
        packed = jnp.concatenate(
            [packed, jnp.zeros(lead + (new_w - packed.shape[-1],), vdt)],
            axis=-1)
    lanes_rows = state.capacity * (
        new_w // (_LANES * _pack_factor(vdt))
    )
    packed = _to_physical_rows(packed, state.rows.dtype, lanes_rows,
                               trash_row=True)
    return state.replace(
        rows=packed,
        slot_names=names,
        slot_inits=tuple(sorted(inits.items())),
    )


# ---------------------------------------------------------------------------
# probing
# ---------------------------------------------------------------------------


def take_elem(vec: jax.Array, idx: jax.Array) -> jax.Array:
    """``vec[idx]`` for a 1-D capacity-sized ``vec`` and random ``idx``,
    reformulated as a 128-lane ROW gather + lane one-hot select.

    PERF: XLA lowers big-table ELEMENT gathers ~7x slower than row gathers
    (measured v5e, C=2Mi: 14.0 ns/key element vs 1.9 ns/key row+select —
    tools/plan_bench.py); same effect as the bucket-row reshape in
    :func:`_bucket_gather`. ``idx`` must be int32 in ``[0, len(vec))``
    (out-of-range up to the 128-pad reads the zero pad)."""
    m = vec.shape[0]
    mpad = (m + 127) // 128 * 128
    if mpad != m:
        vec = jnp.concatenate([vec, jnp.zeros((mpad - m,), vec.dtype)])
    idx = idx.astype(jnp.int32)
    rows = vec.reshape(-1, _LANES)[idx >> 7]  # [N, 128]
    onehot = (idx & 127)[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, _LANES), 1
    )
    zero = jnp.zeros((), vec.dtype)
    # explicit dtype: x64 mode would promote the int32 reduction to int64
    return jnp.sum(jnp.where(onehot, rows, zero), axis=1, dtype=vec.dtype)


def _first_occurrence(sidx: jax.Array, n: int, cap: int):
    """First batch position holding each value of ``sidx`` (slot indices in
    ``[0, cap]``; ``cap`` = trash sentinel). Returns ``rep [N]`` = position
    of the first occurrence of ``sidx[i]``. One scatter-min into a 128-
    padded [C] buffer + a row-gather read-back (see :func:`take_elem`)."""
    pos = jnp.arange(n, dtype=jnp.int32)
    size = (cap + 1 + _LANES - 1) // _LANES * _LANES
    first = jnp.full((size,), n, jnp.int32).at[sidx].min(pos)
    return take_elem(first, sidx)


def _bucket_of(spec: TableSpec, keys: jax.Array):
    """Return ([N] bucket id, [N] bucket base slot)."""
    b = hashing.bucket_of(keys, spec.num_buckets)
    return b, b * np.int32(spec.bucket_size)


def _bucket_gather(spec: TableSpec, flat: jax.Array, bucket: jax.Array):
    """Gather each key's whole bucket from a flat [C]-shaped column.

    PERF: a flat gather with [N, B] element offsets lowers to an XLA gather
    that streams the table once per element column (~170 ms at C=4Mi on
    v5e); reshaping to [num_buckets, B] and row-gathering is ~400x faster
    because XLA moves whole 512-byte bucket rows.
    """
    return flat.reshape(spec.num_buckets, spec.bucket_size)[bucket]


def find(spec: TableSpec, state: TableState, keys: jax.Array):
    """Vectorized probe. Returns ``(slot [N] int32, found [N] bool)``.

    ``slot`` is only meaningful where ``found``. Keys equal to the EMPTY
    sentinel (padding) are reported not-found. Equivalent of the reference's
    ``find / find_with_exists`` kernels (cuckoo_hashtable_op.cc:39-63,
    lookup_table_op_hkv.h:730-745).
    """
    bucket, base = _bucket_of(spec, keys)
    lo, hi = split_key(keys.astype(jnp.int64))
    cl = _bucket_gather(spec, state.key_lo, bucket)  # [N, B] int32
    ch = _bucket_gather(spec, state.key_hi, bucket)
    match = (cl == lo[:, None]) & (ch == hi[:, None])
    found = jnp.any(match, axis=-1) & (keys != spec.empty_key)
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot = base + pos
    return jnp.where(found, slot, 0), found


def gather_packed(
    state: TableState,
    slot: jax.Array,
    found: jax.Array,
) -> jax.Array:
    """Packed rows at ``slot`` via the Pallas row-DMA kernel (O(batch)).
    Returns logical [N, W] rows in the value dtype (bitcast from the 32-bit
    container for 16-bit values).

    Rows where ``found`` is False carry UNSPECIFIED data (the trash row /
    stale slot contents) — every internal consumer re-masks the lanes it
    reads by ``found``, so the kernel skips a full-width zero-masking pass
    (one [N, W] pass saved per gather)."""
    idx = jnp.where(found, slot, state.capacity)  # sentinel -> trash row
    n = idx.shape[0]
    if pallas_ops.use_pallas(state.rows):
        phys = pallas_ops.gather_rows_2d(state.rows, state.chunks, idx,
                                         cap=state.capacity, masked=False)
        return _to_logical_rows(
            phys.reshape(n * state.chunks, _LANES), state.value_dtype,
            n, state.width,
        )
    return pallas_ops.gather_rows(state.rows_logical, idx)


def gather_packed_phys(state: TableState, slot: jax.Array,
                       found: jax.Array) -> jax.Array:
    """Packed rows at ``slot`` in the PHYSICAL container layout
    ``[N*ch, 128]`` — skips the sublane->lane relayout pass that
    :func:`gather_packed` pays to produce the logical [N, W] view (the
    fused apply kernel does that merge for free in VREGS instead,
    pallas_ops.fused_update_scatter_refs). Pallas path only."""
    idx = jnp.where(found, slot, state.capacity)  # sentinel -> trash row
    return pallas_ops.gather_rows_2d(state.rows, state.chunks, idx,
                                     cap=state.capacity, masked=False,
                                     flat=True)


def packed_is_phys(state: TableState, n: int, packed: jax.Array) -> bool:
    """True when a ctx packed block is in the PHYSICAL [N*ch, 128]
    container layout (vs the logical [N, W] value layout). When the two
    coincide (ch == 1, pf == 1, W == 128) either interpretation is
    byte-identical, so the answer is immaterial."""
    return (packed.ndim == 2
            and packed.dtype == state.rows.dtype
            and packed.shape[0] == n * state.chunks
            and packed.shape[1] == _LANES)


def packed_logical_view(state: TableState, n: int,
                        packed: jax.Array) -> jax.Array:
    """[N, W] logical view of a ctx packed block in either format."""
    if packed_is_phys(state, n, packed):
        return _to_logical_rows(packed, state.value_dtype, n, state.width)
    return packed


def packed_value_rows(state: TableState, n: int,
                      packed: jax.Array) -> jax.Array:
    """[N, dim] value columns of a ctx packed block in either format —
    for the phys layout this is a chunk-0 lane slice, NOT a full-width
    relayout."""
    d = state.dim
    if not packed_is_phys(state, n, packed):
        return packed[:, :d]
    pf = _pack_factor(state.value_dtype)
    ch = state.chunks
    if d % pf or d // pf > _LANES:
        return packed_logical_view(state, n, packed)[:, :d]
    dc = d // pf
    col = packed.reshape(n, ch, _LANES)[:, 0, :dc]
    if pf == 1:
        return col
    half = jax.lax.bitcast_convert_type(col, state.value_dtype)
    return half.reshape(n, dc * pf)


def reset_inserted_slots(state: TableState, n: int, packed: jax.Array,
                         inserted: jax.Array) -> jax.Array:
    """Overwrite a ctx packed block's SLOT columns with their fresh-fill
    values on ``inserted`` rows (either layout; returns the same layout).

    Inserted rows' packed data was gathered with the found-only mask, so
    their slot columns hold trash/stale victim state. Resetting them HERE —
    in the lookup's miss branch, where inserts structurally live — lets the
    fused apply kernel consume the slot columns verbatim, with no [N, D]
    found-mask block to materialize and stream on every steady-state step
    (~1-2 ns/key of pure hit-path waste)."""
    if not state.slot_names:
        return packed
    d = state.dim
    vdt = state.value_dtype
    if packed_is_phys(state, n, packed):
        pf = _pack_factor(vdt)
        ch = state.chunks
        wc = ch * _LANES  # container words per row
        dw = d // pf
        fresh = np.zeros((wc - dw,), np.dtype(state.rows.dtype))
        for i, nm in enumerate(state.slot_names):
            fill_word = np.asarray(
                [state.slot_init(nm)] * pf, np.dtype(vdt)
            ).view(np.dtype(state.rows.dtype))[0]
            off = d * (1 + i) // pf - dw
            fresh[off:off + dw] = fill_word
        view = packed.reshape(n, wc)
        tail = jnp.where(inserted[:, None], jnp.asarray(fresh),
                         view[:, dw:])
        return view.at[:, dw:].set(tail).reshape(n * ch, _LANES)
    w = state.width
    fresh = np.zeros((w - d,), np.dtype(vdt))
    for i, nm in enumerate(state.slot_names):
        off = d * (1 + i) - d
        fresh[off:off + d] = state.slot_init(nm)
    tail = jnp.where(inserted[:, None], jnp.asarray(fresh), packed[:, d:])
    return packed.at[:, d:].set(tail)


def phys_packed_ok(state: TableState) -> bool:
    """Whether plan_lookup_train may carry its packed gather in PHYSICAL
    [N*ch, 128] layout (value columns sit in chunk 0, Pallas live).

    For pf == 1 (f32 tables): MEASURED OFF (v5e, dim 64, cap 2Mi,
    within-run FULL HIT): logical ctx.packed 49.5 ns/key; phys ctx with
    the in-kernel VREG merge 54.0 (the merge stalls the fused kernel's
    issue loop); phys ctx with an XLA-side merge before the kernel 63.5
    (the standalone relayout pass is ~2x the one XLA fuses into the
    lookup's gather/cond output). The logical materialization inside the
    lookup is the cheapest arrangement for f32.

    For pf == 2 (bf16/f16 tables) the trade-off flips: the LOGICAL view
    costs a 16-bit bitcast relayout out of the gather AND a bitcast back
    to container words before the kernel, while the phys block feeds the
    pf2 kernel's container-word input directly (an identity reshape at
    ch == 1) — only the small [N, dim] value slice converts."""
    pf = _pack_factor(state.value_dtype)
    return (pf == 2
            and pallas_ops.use_pallas(state.rows)
            and state.dim % pf == 0
            and state.dim // pf <= _LANES)


def _scatter_rows_state(state: TableState, idx: jax.Array,
                        packed_rows: jax.Array) -> jax.Array:
    """Scatter logical [N, W] rows; returns the new PHYSICAL rows array."""
    if pallas_ops.use_pallas(state.rows):
        n = packed_rows.shape[0]
        phys = _to_physical_rows(
            packed_rows.astype(state.value_dtype), state.rows.dtype,
            n * state.chunks,
        )
        return pallas_ops.scatter_rows_set_2d(
            state.rows, state.chunks, idx, phys, cap=state.capacity
        )
    new_logical = pallas_ops.scatter_rows_set(
        state.rows_logical, idx, packed_rows
    )
    return _to_physical_rows(
        new_logical, state.rows.dtype,
        state.capacity * state.chunks, trash_row=True,
    )


def gather_values(state: TableState, slot: jax.Array,
                  found: jax.Array) -> jax.Array:
    """[N, dim] VALUE rows at ``slot`` — DMAs only each row's value
    chunks instead of the full packed row, and skips the [N*ch, 128] ->
    [N, W] relayout pass entirely.

    The serving path never reads slot columns, but ``gather_packed``
    moves them anyway (with Adam slots at dim 64 the packed row is 2
    chunks; values are 1) and then pays a relayout + a full-width mask.
    Measured (tools/ab_probe_gather.py, v5e, C=2Mi, dim 64, ch=2):
    full lookup 22.3 ns/key vs value-chunk lookup 17.7 (44.8 -> 56.4 M
    keys/s). Not-found rows carry UNSPECIFIED data (the trash row), as
    for ``gather_packed`` with ``masked=False`` — callers mask by
    ``found``. Falls back to the packed gather when the value columns
    don't tile cleanly onto whole leading chunks."""
    d = state.dim
    pf = _pack_factor(state.value_dtype)
    ch = state.chunks
    dc = d // pf if d % pf == 0 else 0  # container words per value row
    vc = (dc + _LANES - 1) // _LANES  # value chunks
    if (dc == 0 or vc == 0 or ch % vc
            or not pallas_ops.use_pallas(state.rows)):
        return gather_packed(state, slot, found)[:, :d]
    idx = jnp.where(found, slot, state.capacity) * jnp.int32(ch // vc)
    # premultiplied stride trick: the kernel multiplies by its own ch
    # argument (vc), so idx * (ch // vc) * vc lands on the row's first
    # physical chunk at the true stride ch
    out = pallas_ops.gather_rows_2d(state.rows, vc, idx, masked=False)
    col = out[:, :dc]
    if pf == 1:
        return col
    half = jax.lax.bitcast_convert_type(col, state.value_dtype)
    return half.reshape(col.shape[0], dc * pf)[:, :d]


def gather(
    spec: TableSpec,
    state: TableState,
    slot: jax.Array,
    found: jax.Array,
    default_values: jax.Array,
):
    """Value rows at ``slot`` where found else ``default_values``
    ([N, D] or [D])."""
    rows = gather_values(state, slot, found)
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
# fused dedup + probe + write planning (the training-lookup hot path)
# ---------------------------------------------------------------------------


def _kth_lowest_slot(sc_masked: jax.Array, k: jax.Array) -> jax.Array:
    """Index (along the last axis) of the k-th lowest entry of ``sc_masked``
    [N, B], ties broken by position — argsort-free selection.

    Rank of slot j = count of slots that beat it. Computed as an UNROLLED
    sum over the B competitor columns: each term is an [N, B] elementwise
    compare against one broadcast column, so XLA fuses the whole chain into
    a single pass over ``sc_masked`` (compute-bound, ~268M lane-ops at
    N=64Ki B=64). The [N, B, B] broadcast formulation of the same rank
    materialized several 268M-element intermediates with transposed
    layouts (seen in the compiled HLO) — memory-bound and ~4x slower.
    """
    n, bsz = sc_masked.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, bsz), 1)
    cnt = jnp.zeros((n, bsz), jnp.int32)
    for l in range(bsz):
        col = jax.lax.dynamic_slice_in_dim(sc_masked, l, 1, axis=1)  # [N,1]
        beats = (col < sc_masked) | (
            (col == sc_masked) & (l < lanes)
        )
        cnt = cnt + beats.astype(jnp.int32)
    return jnp.argmax(cnt == k[:, None], axis=-1).astype(jnp.int32)


def _dup_probe(n: int, cap: int, sidx: jax.Array):
    """One scatter of batch positions into slot space, shared by the dup
    TEST and the dedup itself.

    Returns ``(pos [N], buf [pad128(cap+1)], n_distinct)``: ``buf[s]``
    holds SOME batch position whose slot is ``s`` (-1 where untouched;
    misses/EMPTY land in the trash cell at ``cap``), and ``n_distinct``
    counts the touched live slots. The winner among duplicates is whichever
    scatter write lands last — any occurrence is a valid representative
    (same key ⇒ same row; grads segment-sum in batch order regardless), so
    a plain scatter-set beats the round-2 scatter-min.

    PERF: the distinct count is a [C]-pass reduce (~0.2 ns/key at C=2Mi,
    N=64Ki) — far cheaper than the take_elem read-back (~4-6 ns/key), which
    the dup-free steady state therefore SKIPS entirely (the round-2 path
    paid scatter-min + read-back, ~10 ns/key, on every step)."""
    pos = jnp.arange(n, dtype=jnp.int32)
    size = (cap + 1 + _LANES - 1) // _LANES * _LANES
    buf = jnp.full((size,), -1, jnp.int32).at[sidx].set(pos)
    n_distinct = jnp.sum((buf[:cap] != -1).astype(jnp.int32))
    return pos, buf, n_distinct


def plan_lookup_fast(spec: TableSpec, state: TableState, keys: jax.Array):
    """``plan_lookup`` with fast paths for all-hit batches.

    Steady-state training batches find every key resident; then each key's
    slot is already a collision-free identity, so dedup needs no sort: one
    scatter of positions into slot space (``_dup_probe``). Dup-free batches
    (the common case) skip even the read-back — uniq IS the batch, inverse
    IS the iota. Any miss in the batch falls back to :func:`plan_lookup`
    via ``lax.cond`` (one branch executes on TPU).

    Output contract matches :func:`plan_lookup`; in the fast paths the
    unique array keeps each representative at its ORIGINAL batch position
    (EMPTY holes elsewhere) rather than compacted order — all consumers
    mask by key value.
    """
    flat = keys.reshape(-1)
    n = flat.shape[0]
    cap = state.capacity
    slot_f, found_f = find(spec, state, flat)
    valid = flat != spec.empty_key
    all_hit = jnp.all(found_f | ~valid)

    def hit_paths(_):
        sidx = jnp.where(found_f, slot_f, cap)  # misses/EMPTY -> trash
        pos, buf, n_distinct = _dup_probe(n, cap, sidx)
        no_dups = n_distinct == jnp.sum(found_f.astype(jnp.int32))
        zeros = jnp.zeros((n,), bool)

        def pristine(_):
            return flat, pos, (slot_f, found_f, zeros, zeros)

        def dedup(_):
            rep = take_elem(buf, sidx)
            is_rep = (rep == pos) & found_f
            uniq = jnp.where(is_rep, flat, spec.empty_key)
            inverse = jnp.where(found_f, rep, pos)
            return uniq, inverse, (slot_f, is_rep, zeros, zeros)

        return jax.lax.cond(no_dups, pristine, dedup, None)

    def miss_path(_):
        uniq, inverse, plan, _no_dups = plan_lookup(spec, state, flat)
        return uniq, inverse, plan

    return jax.lax.cond(all_hit, hit_paths, miss_path, None)


def plan_lookup_train(spec: TableSpec, state: TableState, keys: jax.Array,
                      init_fn, score_const=None, defer_dedup=False):
    """:func:`plan_lookup_fast` + packed-row gather + value-row blend, with
    the WHOLE per-branch pipeline inside the all-hit ``lax.cond``.

    Why: the per-key initializer (``init_fn(uniq) -> [N, D]``, typically
    ~100 threefry u32 ops per element) is only needed for missing keys, but
    hoisting it outside the branch makes it run on every steady-state step
    (~3-6 ns/key measured). In-branch, the hit path's rows are just the
    gathered packed values — no init, no blend. Returns
    ``(uniq, inverse, (slot, found, inserted, dropped), packed, no_dups)``
    with the same contracts as :func:`plan_lookup_fast`; ``no_dups`` is a
    scalar bool — True means uniq IS the batch and inverse IS the iota, so
    downstream consumers (``emb = rows[inverse]``, the grad segment-sum)
    can skip their gather/scatter entirely.

    Invariant: the packed block's VALUE COLUMNS hold the blended value row
    (stored row for hits, ``init_fn`` row for misses) — the miss branch
    writes the blend into them, so callers slice
    (:func:`packed_value_rows`) instead of carrying a second [N, D] cond
    output. Likewise the SLOT COLUMNS of inserted rows are reset to their
    fresh fills (:func:`reset_inserted_slots`), so the fused apply kernel
    reads slot state verbatim — no found-mask block. Non-representative /
    EMPTY rows are unspecified (consumers mask by key value, as for
    ``gather_packed``).

    Layout: when :func:`phys_packed_ok`, ``packed`` is the PHYSICAL
    ``[N*ch, 128]`` container block (the fused apply kernel merges it to
    logical in VREGS; XLA never pays the relayout); otherwise the logical
    ``[N, W]`` view. :func:`packed_is_phys` distinguishes them.

    The returned tuple also carries ``(new_key_lo, new_key_hi)``: the key
    planes with this batch's inserts committed. Writing keys HERE — in
    the miss branch, where the inserts structurally live — instead of at
    apply time keeps the key-plane scatters out of the all-hit path
    entirely (XLA's conditional simplifier flattens an
    any(inserted)-cond at apply time and runs both scatters with dropped
    indices on every steady-state step, ~5-8 ns/key of waste). The hit
    branches pass the planes through unchanged; a caller that drops the
    ctx leaves the table untouched, exactly as before.

    ``score_const`` (optional scalar): a CONSTANT batch score (LRU /
    EPOCHLRU assign-mode strategies, where every key's new score is the
    same step value). When given, this batch's scores are ALSO committed
    here and the tuple grows to 9 entries (``+ new_scores``), and — the
    actual point — the scores scatter DOUBLES AS THE DUPLICATE PROBE:
    writing the constant into ``scores[slot]`` and counting how many
    entries newly equal it yields the exact number of distinct touched
    slots (exact when the score constant is fresh, i.e. steps increase
    monotonically; a stale constant can only UNDER-count, which falls back
    to the dedup branch — never a false "no dups"). The steady-state hit
    path then carries ZERO dedicated probe scatters: the one element
    scatter it issues is the LRU score update it needed anyway
    (~3 ns/key saved at N=64Ki, tools/ab_glue.py element-scatter price).
    """
    flat = keys.reshape(-1)
    n = flat.shape[0]
    cap = state.capacity
    d = state.dim
    slot_f, found_f = find(spec, state, flat)
    valid = flat != spec.empty_key
    all_hit = jnp.all(found_f | ~valid)
    phys = phys_packed_ok(state)
    gather_fn = gather_packed_phys if phys else gather_packed

    scored = score_const is not None
    if scored:
        sc = jnp.asarray(score_const, state.scores.dtype)
        sc_vec = jnp.broadcast_to(sc, (n,))

    def hit_paths(_):
        sidx = jnp.where(found_f, slot_f, cap)  # misses/EMPTY -> trash
        zeros = jnp.zeros((n,), bool)
        if scored:
            # the LRU score update IS the dup probe (see docstring): one
            # scatter + two [C] passes replaces _dup_probe's dedicated
            # position scatter AND the apply-time commit_scores scatter
            pos = jnp.arange(n, dtype=jnp.int32)
            n_found = jnp.sum(found_f.astype(jnp.int32))
            cnt_before = jnp.sum((state.scores == sc).astype(jnp.int32))
            new_scores = state.scores.at[sidx].set(sc_vec, mode="drop")
            cnt_after = jnp.sum((new_scores == sc).astype(jnp.int32))
            no_dups = (cnt_after - cnt_before) == n_found
            if defer_dedup:
                # dedup DEFERRED to the apply-side sorted combine
                # (sorted_combine_batch): every hit batch keeps the
                # occurrence contract — uniq IS the batch, ``found``
                # marks occurrences, the gather is per occurrence — so
                # the dedicated probe scatter AND the take_elem
                # read-back disappear along with the inner cond
                # (tools/ab_dup_contract.py: the sorted pipeline is
                # 9.9 vs 23.2 ns/key on zipf batches). ``no_dups``
                # still rides out so the apply can skip the combine on
                # dup-free steps.
                packed = gather_fn(state, slot_f, found_f)
                return (flat, pos, (slot_f, found_f, zeros, zeros),
                        packed, no_dups, jnp.asarray(True),
                        state.key_lo, state.key_hi, new_scores)
        else:
            pos, buf, n_distinct = _dup_probe(n, cap, sidx)
            no_dups = n_distinct == jnp.sum(found_f.astype(jnp.int32))

        def pristine(_):
            packed = gather_fn(state, slot_f, found_f)
            return flat, pos, (slot_f, found_f, zeros, zeros), packed

        def dedup(_):
            if scored:
                _, dbuf, _ = _dup_probe(n, cap, sidx)
            else:
                dbuf = buf
            rep = take_elem(dbuf, sidx)
            is_rep = (rep == pos) & found_f
            uniq = jnp.where(is_rep, flat, spec.empty_key)
            inverse = jnp.where(found_f, rep, pos)
            # gather PER OCCURRENCE (found_f), not per representative:
            # duplicates DMA their shared row again — same descriptor
            # count either way (non-reps fetched the trash row before) —
            # and the caller's [N, D] ``rows[inverse]`` expansion gather
            # disappears (rows_aligned below). The write plan still
            # carries is_rep as ``found``, so the apply updates each
            # unique row exactly once. Measured (tools/profile_dlrm.py):
            # the dup-heavy table step is the entire DLRM gap.
            packed = gather_fn(state, slot_f, found_f)
            return uniq, inverse, (slot_f, is_rep, zeros, zeros), packed

        out = jax.lax.cond(no_dups, pristine, dedup, None)
        # both hit branches now produce occurrence-aligned rows
        out = out + (no_dups, jnp.asarray(True), state.key_lo,
                     state.key_hi)
        if scored:
            out = out + (new_scores,)
        return out

    def miss_path(_):
        uniq, inverse, plan, no_dups = plan_lookup(spec, state, flat)
        slot, found = plan[0], plan[1]
        inserted = plan[2]
        # all-insert batches (cold start, ingest, the fresh-keys bench)
        # have NO stored rows to read: every descriptor would fetch the
        # trash row just to be masked out by the blend below. Skipping it
        # measured NEUTRAL on the miss slope (~102 ns/key either way —
        # the issue loop hides under the surrounding XLA passes) but
        # removes N descriptors + 1 KB/key of DMA traffic that real
        # ingest pipelines shouldn't spend
        packed_shape = jax.eval_shape(
            lambda: gather_fn(state, slot, found))
        packed = jax.lax.cond(
            jnp.any(found),
            lambda _: gather_fn(state, slot, found),
            lambda _: jnp.zeros(packed_shape.shape, packed_shape.dtype),
            None,
        )
        init_rows = init_fn(uniq)
        stored = packed_value_rows(state, n, packed)
        rows = jnp.where(found[:, None], stored,
                         init_rows.astype(state.value_dtype))
        if phys:
            pf = _pack_factor(state.value_dtype)
            ch = state.chunks
            dc = d // pf
            if pf == 1:
                newcol = rows
            else:
                newcol = jax.lax.bitcast_convert_type(
                    rows.reshape(n, dc, pf), packed.dtype)
            packed = packed.reshape(n, ch, _LANES).at[:, 0, :dc].set(
                newcol).reshape(n * ch, _LANES)
        else:
            packed = packed.at[:, :d].set(rows)
        # fused-apply invariant (2): inserted rows' slot columns are reset
        # to their fresh fills here, so the kernel consumes the packed
        # block verbatim (no found-mask block on the steady-state path)
        packed = reset_inserted_slots(state, n, packed, inserted)
        # commit this batch's inserted keys to the key planes here (see
        # docstring); only the miss branch carries insert scatters
        k_lo, k_hi = split_key(uniq.astype(jnp.int64))
        ins_idx = jnp.where(inserted, slot, cap)
        new_lo = state.key_lo.at[ins_idx].set(k_lo, mode="drop")
        new_hi = state.key_hi.at[ins_idx].set(k_hi, mode="drop")
        # miss-branch rows are per-REPRESENTATIVE (non-reps hold
        # unspecified data): occurrence-aligned only when dup-free
        out = (uniq, inverse, plan, packed, no_dups, no_dups,
               new_lo, new_hi)
        if scored:
            widx = jnp.where(found | inserted, slot, cap)
            out = out + (state.scores.at[widx].set(sc_vec, mode="drop"),)
        return out

    return jax.lax.cond(all_hit, hit_paths, miss_path, None)


def plan_lookup(spec: TableSpec, state: TableState, keys: jax.Array):
    """Dedup + probe + write-plan in ONE sort (the fused hot path used by
    ``Variable.embedding_lookup``).

    Equivalent to ``unique_static(keys)`` followed by
    ``_plan_writes(spec, state, uniq)`` (same conflict-freedom and
    eviction-priority semantics), but:

      * one argsort total: keys sort by their ROTATED mixed bits, which puts
        the bucket bits on top — equal keys stay adjacent (mix is a
        bijection) AND same-bucket keys become contiguous, so the
        within-bucket insert rank falls out of a segmented cumsum instead of
        a second argsort;
      * eviction order by pairwise-comparison rank instead of an [N, B]
        argsort (see :func:`_kth_lowest_slot`).

    Returns ``(uniq [N], inverse [N], (slot, found, inserted, dropped),
    no_dups)``. ``no_dups`` (scalar bool) is True when the batch carried
    no duplicate valid keys — then ``uniq`` IS the batch and ``inverse``
    IS the iota (computed behind a cond, skipping the take_elem
    read-back + scatter), and consumers can skip their expansion gather /
    grad segment-sum exactly as for the all-hit fast paths. Unlike
    ``unique_static``, EMPTY-key entries may appear anywhere in ``uniq``
    (not only as tail padding); all consumers mask by key value.
    """
    flat = keys.reshape(-1)
    n = flat.shape[0]
    cap = state.capacity
    bsz = spec.bucket_size
    nb_bits = spec.num_buckets.bit_length() - 1

    m = hashing.mix(flat)
    width = m.dtype.itemsize * 8
    if nb_bits == 0:  # single bucket: no rotation needed
        rot = m
    else:
        rot = (m << (width - nb_bits)) | (m >> nb_bits)  # bucket bits->MSBs
    # two-operand sort: mix is a bijection, so the original keys are
    # recovered from the sorted rotation (hashing.unmix) instead of riding
    # through the sort as a third 8-byte operand (~40% less sort traffic)
    rot_s, order = jax.lax.sort(
        (rot, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    if nb_bits == 0:
        b_s = jnp.zeros((n,), jnp.int32)
        m_s = rot_s
    else:
        b_s = (rot_s >> (width - nb_bits)).astype(jnp.int32)
        m_s = (rot_s >> (width - nb_bits)) | (rot_s << nb_bits)
    sk = hashing.unmix(m_s, flat.dtype)
    sk_lo, sk_hi = split_key(sk.astype(jnp.int64))

    # dedup bookkeeping; equal rot <=> equal key (bijection)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), rot_s[1:] != rot_s[:-1]])

    # probe (in sorted space; duplicates probe the same bucket row — the
    # gather is row-granular so this costs nothing extra)
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    cl = _bucket_gather(spec, state.key_lo, b_s)  # [N, B]
    ch = _bucket_gather(spec, state.key_hi, b_s)
    match = (cl == sk_lo[:, None]) & (ch == sk_hi[:, None])
    valid_s = sk != spec.empty_key
    found_s = jnp.any(match, axis=-1) & valid_s
    pos_s = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot_found_s = b_s * np.int32(bsz) + pos_s

    # within-bucket insert rank via segmented exclusive cumsum (same-bucket
    # keys are contiguous after the rotated sort)
    need_s = is_start & valid_s & ~found_s
    ind = need_s.astype(jnp.int32)
    pre = jnp.cumsum(ind) - ind  # exclusive count of need keys so far
    is_bstart = jnp.concatenate(
        [jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
    base = jax.lax.cummax(jnp.where(is_bstart, pre, 0))
    rank_s = pre - base

    # slots claimed by found keys are not free / not evictable
    claim_idx = jnp.where(is_start & found_s, slot_found_s, cap)
    claimed = (
        jnp.zeros((cap,), jnp.bool_).at[claim_idx].set(True, mode="drop")
    )
    claimed_b = _bucket_gather(spec, claimed, b_s)
    empty_b = (cl == e_lo) & (ch == e_hi)
    free_b = empty_b & ~claimed_b
    num_free = jnp.sum(free_b, axis=-1).astype(jnp.int32)
    cf = jnp.cumsum(free_b.astype(jnp.int32), axis=-1)
    kth_free = jnp.argmax(cf == (rank_s + 1)[:, None], axis=-1).astype(
        jnp.int32)

    evictable_b = ~empty_b & ~claimed_b
    num_evictable = jnp.sum(evictable_b, axis=-1).astype(jnp.int32)
    use_free = rank_s < num_free

    # eviction-victim ranking only when some bucket actually overflows:
    # the [N, B] score gather + the B^2-lane-op rank selection
    # (_kth_lowest_slot) are the two most expensive pieces of the miss
    # plan (~7-8 ns/key), and a non-full table never needs them
    def _rank_victims(_):
        sc = _bucket_gather(spec, state.scores, b_s)
        sc = jnp.where(evictable_b, sc, _score_max(sc.dtype))
        evict_rank = jnp.clip(rank_s - num_free, 0, bsz - 1)
        return _kth_lowest_slot(sc, evict_rank)

    kth_evict = jax.lax.cond(
        jnp.any(need_s & ~use_free), _rank_victims,
        lambda _: jnp.zeros((n,), jnp.int32), None,
    )

    dropped_s = need_s & (rank_s >= num_free + num_evictable)
    inserted_s = need_s & ~dropped_s
    pos_new = jnp.where(use_free, kth_free, kth_evict)
    slot_new_s = b_s * np.int32(bsz) + pos_new
    slot_s = jnp.where(found_s, slot_found_s, slot_new_s)

    # Per-unique outputs at the representative's ORIGINAL batch position
    # (EMPTY holes elsewhere — the same layout the all-hit fast paths use;
    # consumers mask by key value). ONE packed int32 scatter replaces the
    # round-2 design's seven (u_lo/u_hi/inverse/slot/found/inserted/
    # dropped): the slot rides bits 0-27, the three plan flags bits 28-30.
    # TPU element scatters cost ~3-5 ns/key EACH (tools/ab_glue.py), so
    # collapsing them is the single biggest miss-path lever. Shard
    # capacities are HBM-bounded far below 2^28 rows.
    assert cap <= (1 << 28), "plan_lookup packed-plan slot-bit bound"
    rep_idx = jnp.where(is_start, order, n)
    word_s = (slot_s
              | (found_s.astype(jnp.int32) << 28)
              | (inserted_s.astype(jnp.int32) << 29)
              | (dropped_s.astype(jnp.int32) << 30))
    word = jnp.zeros((n,), jnp.int32).at[rep_idx].set(word_s, mode="drop")
    found = ((word >> 28) & 1).astype(bool)
    inserted = ((word >> 29) & 1).astype(bool)
    dropped = ((word >> 30) & 1).astype(bool)
    slot = jnp.where(found | inserted, word & ((1 << 28) - 1), 0)
    # a valid representative is exactly found|inserted|dropped; its key is
    # already at its own position in the batch — no key-plane scatters
    uniq = jnp.where(found | inserted | dropped, flat,
                     jnp.asarray(spec.empty_key, flat.dtype))
    # inverse[i] = the representative's original position: propagate each
    # group start's sorted index (cummax — monotone), read the start's
    # original position back (take_elem), scatter along the sort order.
    # Dup-free batches (unique miss batches are the common insert shape)
    # skip the read-back + scatter entirely: every key is its own
    # representative at its own position, so inverse IS the iota.
    n_valid = jnp.sum(valid_s.astype(jnp.int32))
    n_distinct = jnp.sum((is_start & valid_s).astype(jnp.int32))
    no_dups = n_distinct == n_valid
    idx_s = jnp.arange(n, dtype=jnp.int32)

    def _iota_inverse(_):
        return idx_s

    def _general_inverse(_):
        start_idx = jax.lax.cummax(jnp.where(is_start, idx_s, 0))
        rep_orig_s = take_elem(order, start_idx)
        return jnp.zeros((n,), jnp.int32).at[order].set(rep_orig_s)

    inverse = jax.lax.cond(no_dups, _iota_inverse, _general_inverse, None)
    return uniq, inverse, (slot, found, inserted, dropped), no_dups


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------


def _segment_rank(sort_key: jax.Array, num_segments_sentinel: int):
    """Rank of each element within its equal-valued group (vectorized).

    ``sort_key`` entries equal to ``num_segments_sentinel`` are "inactive" but
    still get ranks within that group (harmless).
    """
    n = sort_key.shape[0]
    sorted_k, order = jax.lax.sort(
        (sort_key, jnp.arange(n, dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
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
    bucket_id, base = _bucket_of(spec, keys)
    lo, hi = split_key(keys.astype(jnp.int64))
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    cl = _bucket_gather(spec, state.key_lo, bucket_id)  # [N, B] int32
    ch = _bucket_gather(spec, state.key_hi, bucket_id)
    match = (cl == lo[:, None]) & (ch == hi[:, None])
    found = jnp.any(match, axis=-1) & valid
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot_found = base + pos

    # Slots matched by this batch are not free and not evictable.
    claim_idx = jnp.where(found, slot_found, cap)
    claimed = (
        jnp.zeros((cap,), jnp.bool_).at[claim_idx].set(True, mode="drop")
    )
    claimed_b = _bucket_gather(spec, claimed, bucket_id)  # [N, B]

    empty_b = (cl == e_lo) & (ch == e_hi)
    free_b = empty_b & ~claimed_b
    num_free = jnp.sum(free_b, axis=-1).astype(jnp.int32)

    need = valid & ~found
    rank = _segment_rank(
        jnp.where(need, bucket_id, np.int32(spec.num_buckets)),
        spec.num_buckets,
    )

    # k-th free position via cumulative count.
    cf = jnp.cumsum(free_b.astype(jnp.int32), axis=-1)
    kth_free = jnp.argmax(cf == (rank + 1)[:, None], axis=-1).astype(jnp.int32)

    # Eviction: k-th lowest score among occupied, unclaimed slots
    # (argsort-free — see _kth_lowest_slot), computed only when some
    # bucket actually overflows (same cond as plan_lookup: the score
    # gather + B^2 ranking are the plan's most expensive pieces)
    evictable_b = ~empty_b & ~claimed_b
    num_evictable = jnp.sum(evictable_b, axis=-1).astype(jnp.int32)
    use_free = rank < num_free

    def _rank_victims(_):
        sc = _bucket_gather(spec, state.scores, bucket_id)
        sc = jnp.where(evictable_b, sc, _score_max(sc.dtype))
        evict_rank = jnp.clip(rank - num_free, 0, spec.bucket_size - 1)
        return _kth_lowest_slot(sc, evict_rank)

    kth_evict = jax.lax.cond(
        jnp.any(need & ~use_free), _rank_victims,
        lambda _: jnp.zeros((n,), jnp.int32), None,
    )
    dropped = need & (rank >= num_free + num_evictable)
    inserted = need & ~dropped
    pos_new = jnp.where(use_free, kth_free, kth_evict)
    slot_new = base + pos_new

    slot = jnp.where(found, slot_found, slot_new)
    return slot, found, inserted, dropped


def _pack_rows(
    state: TableState,
    n: int,
    values: Optional[jax.Array],
    slot_rows: Optional[Dict[str, jax.Array]],
    old_packed: jax.Array,
    found: jax.Array,
    inserted: jax.Array,
    deltas: Optional[jax.Array] = None,
) -> jax.Array:
    """Build the new packed [N, W] rows for a commit.

    * value columns: ``values`` (assign) and/or ``old + deltas`` (accum);
    * slot columns: ``slot_rows[name]`` when given, else keep old where
      found, fresh fill where inserted (eviction victims' slots reset).
    """
    d = state.dim
    dt = state.value_dtype  # logical dtype (rows.dtype is the container)
    w = state.width
    out = old_packed

    # fresh slot fills for inserted rows (victim rows carry stale slot state)
    if state.slot_names:
        fresh_cols = [jnp.zeros((n, d), dt)]
        for nm in state.slot_names:
            fresh_cols.append(jnp.full((n, d), state.slot_init(nm), dt))
        fresh = jnp.concatenate(fresh_cols, axis=1)
        if fresh.shape[1] < w:
            fresh = jnp.concatenate(
                [fresh, jnp.zeros((n, w - fresh.shape[1]), dt)], axis=1)
        out = jnp.where(inserted[:, None], fresh, out)

    if deltas is not None:
        old_vals = jnp.where(found[:, None], old_packed[:, :d], 0)
        acc = old_vals + deltas.astype(dt)
        if values is not None:
            new_vals = jnp.where(found[:, None], acc, values.astype(dt))
        else:
            new_vals = jnp.where(found[:, None], acc, deltas.astype(dt))
        out = out.at[:, :d].set(new_vals)
    elif values is not None:
        out = out.at[:, :d].set(values.astype(dt))

    if slot_rows:
        for nm, rows_nm in slot_rows.items():
            if nm not in state.slot_names:
                continue
            off = state.slot_offset(nm)
            out = out.at[:, off:off + d].set(rows_nm.astype(dt))
    return out


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
    """One planned, conflict-free batch write: keys + packed rows (+scores)
    in ONE row-scatter pass (plus the [C]-column key/score scatters).

    * ``values`` set: insert-or-assign.
    * ``deltas`` set: insert-or-accum (bp_v2) — add to existing rows, write
      ``values`` (or the delta) for missing keys.
    * ``slot_rows``: optimizer slot rows written for all placed keys;
      slot columns of eviction victims are reset to the fresh fill.
    * ``return_evicted``: also return rows displaced by score eviction —
      ``(state, {keys, values, scores, slots})`` — so callers can spill
      them to the host tier (the HKV hybrid role) instead of losing them.

    Precondition: keys deduplicated; EMPTY-sentinel entries are ignored.
    """
    plan = _plan_writes(spec, state, keys)
    return commit_planned(
        spec, state, keys, plan,
        values=values, deltas=deltas, slot_rows=slot_rows, scores=scores,
        score_mode=score_mode, return_evicted=return_evicted,
    )


def commit_planned(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
    plan,
    values: Optional[jax.Array] = None,
    deltas: Optional[jax.Array] = None,
    slot_rows: Optional[Dict[str, jax.Array]] = None,
    scores: Optional[jax.Array] = None,
    *,
    score_mode: str = "assign",
    return_evicted: bool = False,
):
    """Commit against a precomputed write plan (``_plan_writes`` output,
    e.g. carried from the training lookup so the writeback skips the
    probe/rank/score-sort work — valid while the state's key layout is
    unchanged, which a lookup->writeback training step guarantees)."""
    n = keys.shape[0]
    slot, found, inserted, dropped_mask = plan
    write = found | inserted
    idx = jnp.where(write, slot, state.capacity)  # OOB => dropped scatter
    # fast path: when the write fully overwrites every column (assign with
    # all slot rows provided, or no slots), the old rows are never read —
    # skip the gather entirely
    full_cover = (
        values is not None
        and deltas is None
        and not return_evicted
        and all(nm in (slot_rows or {}) for nm in state.slot_names)
    )
    if full_cover:
        old_packed = jnp.zeros((n, state.width), state.rows.dtype)
    else:
        old_packed = gather_packed(state, slot, write)

    evicted = None
    if return_evicted:
        old_keys = join_key(
            take_elem(state.key_lo, slot), take_elem(state.key_hi, slot)
        ).astype(jnp.asarray(spec.empty_key).dtype)
        displaced = inserted & (old_keys != spec.empty_key)
        d = state.dim
        # gather_packed rows are unmasked; zero the non-displaced entries so
        # the public evicted dict stays well-defined. "dropped_*" are the
        # INPUT rows that could not be placed (bucket exhausted by this
        # batch) — spill tiers absorb both so no row is ever lost.
        dropped = dropped_mask
        if values is not None:
            dv = jnp.where(dropped[:, None], values.astype(state.value_dtype),
                           0)
        elif deltas is not None:
            dv = jnp.where(dropped[:, None], deltas.astype(state.value_dtype),
                           0)
        else:
            dv = jnp.zeros((n, d), state.value_dtype)
        evicted = {
            "keys": jnp.where(displaced, old_keys, spec.empty_key),
            "values": jnp.where(displaced[:, None], old_packed[:, :d], 0),
            "scores": jnp.where(displaced, take_elem(state.scores, slot), 0),
            "slots": {
                nm: jnp.where(
                    displaced[:, None],
                    old_packed[:, state.slot_offset(nm):
                               state.slot_offset(nm) + d],
                    0,
                )
                for nm in state.slot_names
            },
            "dropped_keys": jnp.where(dropped, keys, spec.empty_key),
            "dropped_values": dv,
        }

    new_packed = _pack_rows(
        state, n, values, slot_rows, old_packed, found, inserted,
        deltas=deltas,
    )
    new_rows = _scatter_rows_state(state, idx, new_packed)

    k_lo, k_hi = split_key(keys.astype(jnp.int64))
    new_lo = state.key_lo.at[idx].set(k_lo, mode="drop")
    new_hi = state.key_hi.at[idx].set(k_hi, mode="drop")
    if scores is None:
        scores = jnp.ones(keys.shape, dtype=spec.score_dtype)
    scores = scores.astype(spec.score_dtype)
    if score_mode == "add":
        new_sc = scores + jnp.where(found, take_elem(state.scores, slot), 0)
    else:
        new_sc = scores
    new_scores = state.scores.at[idx].set(new_sc, mode="drop")

    new_state = state.replace(key_lo=new_lo, key_hi=new_hi, rows=new_rows,
                              scores=new_scores)
    if return_evicted:
        return new_state, evicted
    return new_state


def commit_keys_scores(
    spec: TableSpec,
    state: TableState,
    keys: jax.Array,
    plan,
    scores: Optional[jax.Array] = None,
    *,
    score_mode: str = "assign",
) -> TableState:
    """Key-plane + score updates of a planned commit WITHOUT touching rows
    (the fused optimizer kernel writes rows itself — see
    pallas_ops.fused_update_scatter_refs)."""
    slot, found, inserted, _ = plan
    write = found | inserted
    idx = jnp.where(write, slot, state.capacity)
    if scores is None:
        scores = jnp.ones(keys.shape, dtype=spec.score_dtype)
    scores = scores.astype(spec.score_dtype)
    if score_mode == "add":
        scores = scores + jnp.where(found, take_elem(state.scores, slot), 0)

    # keys change only where inserted: all-hit batches (steady-state
    # training) skip both key-plane scatters behind one cond. The SCORES
    # scatter lives in BOTH branches on purpose: with an identity false
    # branch, XLA's conditional simplifier flattened the cond and ran the
    # key scatters (all indices dropped) on every hit step (~5-8 ns/key
    # of pure waste, seen in the compiled HLO); branches that both carry
    # real work survive as a true cond.
    def _with_keys(args):
        lo, hi, sc = args
        k_lo, k_hi = split_key(keys.astype(jnp.int64))
        ins_idx = jnp.where(inserted, slot, state.capacity)
        return (lo.at[ins_idx].set(k_lo, mode="drop"),
                hi.at[ins_idx].set(k_hi, mode="drop"),
                sc.at[idx].set(scores, mode="drop"))

    def _scores_only(args):
        lo, hi, sc = args
        return lo, hi, sc.at[idx].set(scores, mode="drop")

    new_lo, new_hi, new_scores = jax.lax.cond(
        jnp.any(inserted), _with_keys, _scores_only,
        (state.key_lo, state.key_hi, state.scores),
    )
    return state.replace(key_lo=new_lo, key_hi=new_hi, scores=new_scores)


def commit_scores(
    spec: TableSpec,
    state: TableState,
    plan,
    scores: jax.Array,
    *,
    score_mode: str = "assign",
) -> TableState:
    """Score-plane update of a planned commit whose KEY planes were
    already committed (plan_lookup_train's miss branch writes inserted
    keys at lookup time — see its docstring). One scatter."""
    slot, found, inserted, _ = plan
    write = found | inserted
    idx = jnp.where(write, slot, state.capacity)
    scores = scores.astype(spec.score_dtype)
    if score_mode == "add":
        scores = scores + jnp.where(found, take_elem(state.scores, slot), 0)
    return state.replace(
        scores=state.scores.at[idx].set(scores, mode="drop"))


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


def scatter_packed(
    state: TableState,
    slot: jax.Array,
    mask: jax.Array,
    packed_rows: jax.Array,
    scores: Optional[jax.Array] = None,
    *,
    score_mode: str = "assign",
) -> TableState:
    """Low-level conflict-free writeback of PACKED rows to known slots (the
    optimizer fast path: the training lookup already planned the slots)."""
    idx = jnp.where(mask, slot, state.capacity)
    new_rows = _scatter_rows_state(state, idx, packed_rows)
    new_scores = state.scores
    if scores is not None:
        scores = scores.astype(state.scores.dtype)
        if score_mode == "add":
            scores = scores + jnp.where(mask, take_elem(state.scores, slot), 0)
        new_scores = new_scores.at[idx].set(scores, mode="drop")
    return state.replace(rows=new_rows, scores=new_scores)


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
    """Writeback of value/slot rows to known slots. When only ``scores`` are
    given this is a pure score refresh (no row traffic)."""
    if values is None and not slot_rows:
        idx = jnp.where(mask, slot, state.capacity)
        new_scores = state.scores
        if scores is not None:
            scores = scores.astype(state.scores.dtype)
            if score_mode == "add":
                scores = scores + jnp.where(mask, take_elem(state.scores, slot), 0)
            new_scores = new_scores.at[idx].set(scores, mode="drop")
        return state.replace(scores=new_scores)
    packed = gather_packed(state, slot, mask)
    d = state.dim
    if values is not None:
        packed = packed.at[:, :d].set(values.astype(packed.dtype))
    for nm, rows_nm in (slot_rows or {}).items():
        if nm in state.slot_names:
            off = state.slot_offset(nm)
            packed = packed.at[:, off:off + d].set(
                rows_nm.astype(packed.dtype))
    return scatter_packed(state, slot, mask, packed, scores,
                          score_mode=score_mode)


# ---------------------------------------------------------------------------
# removal / export / stats
# ---------------------------------------------------------------------------


def remove(spec: TableSpec, state: TableState, keys: jax.Array) -> TableState:
    """Delete keys (reference ``Variable.remove``
    dynamic_embedding_variable.py:877-905). Bucket-local insertion means
    removal never breaks probe chains."""
    slot, found = find(spec, state, keys)
    idx = jnp.where(found, slot, state.capacity)
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    new_lo = state.key_lo.at[idx].set(
        jnp.full(keys.shape, e_lo, jnp.int32), mode="drop")
    new_hi = state.key_hi.at[idx].set(
        jnp.full(keys.shape, e_hi, jnp.int32), mode="drop")
    new_scores = state.scores.at[idx].set(
        jnp.zeros(keys.shape, spec.score_dtype), mode="drop"
    )
    return state.replace(key_lo=new_lo, key_hi=new_hi, scores=new_scores)


def clear(spec: TableSpec, state: TableState) -> TableState:
    """Empty the table (reference ``Variable.clear``)."""
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    return state.replace(
        key_lo=jnp.full((state.capacity,), e_lo, jnp.int32),
        key_hi=jnp.full((state.capacity,), e_hi, jnp.int32),
        rows=jnp.zeros_like(state.rows),
        scores=jnp.zeros_like(state.scores),
    )


def size(spec: TableSpec, state: TableState) -> jax.Array:
    """Live-key count (reference ``Variable.size``
    dynamic_embedding_variable.py:1133-1153)."""
    return jnp.sum(occupancy_mask(spec, state)).astype(jnp.int64)


def occupancy_mask(spec: TableSpec, state: TableState) -> jax.Array:
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    return ~((state.key_lo == e_lo) & (state.key_hi == e_hi))


def export(spec: TableSpec, state: TableState):
    """Full dump ``(keys [C], values [C, D], mask [C])`` — static-shape
    equivalent of the reference's export op (cuckoo_hashtable_op.cc:310-391).
    Compaction happens host-side (see train/checkpoint.py)."""
    return state.keys, state.values, occupancy_mask(spec, state)


def export_with_scores(spec: TableSpec, state: TableState):
    """HKV parity: ``export_keys_and_scores``
    (reference hkv_hashtable_ops.py:420-434)."""
    return state.keys, state.values, state.scores, occupancy_mask(spec, state)


def to_unsigned_order(sc: jax.Array) -> jax.Array:
    """Order-preserving signed -> unsigned map (flip the sign bit)."""
    if sc.dtype == jnp.int64:
        return sc.astype(jnp.uint64) ^ jnp.uint64(1 << 63)
    return sc.astype(jnp.uint32) ^ jnp.uint32(1 << 31)


def radix_select_threshold(u: jax.Array, mask: jax.Array, k: jax.Array):
    """Exact k-th-smallest selection over masked unsigned scores ``u`` [C].

    Returns ``(t, count_below)``: the value of the k-th smallest masked
    entry and the count of masked entries strictly below it. Byte-wise
    radix refinement — 4 (uint32) or 8 (uint64) histogram passes over [C],
    O(C) bandwidth with no sort and no ``lax.top_k``, so eviction scales to
    production capacities (a capacity-wide top_k does not)."""
    bits = u.dtype.itemsize * 8
    prefix = jnp.zeros((), u.dtype)
    below = jnp.zeros((), jnp.int32)
    remaining = k.astype(jnp.int32)
    for shift in range(bits - 8, -1, -8):
        if shift + 8 >= bits:
            active = mask
        else:
            active = mask & ((u >> (shift + 8)) == (prefix >> (shift + 8)))
        bins = ((u >> shift) & u.dtype.type(0xFF)).astype(jnp.int32)
        hist = jax.ops.segment_sum(
            active.astype(jnp.int32), bins, num_segments=256)
        cum = jnp.cumsum(hist)
        b = jnp.argmax(cum >= remaining).astype(jnp.int32)
        below_bin = jnp.where(b > 0, cum[jnp.maximum(b - 1, 0)], 0)
        below = below + below_bin
        remaining = remaining - below_bin
        prefix = prefix | (b.astype(u.dtype) << shift)
    return prefix, below


def lowest_k_indices(scores: jax.Array, mask: jax.Array, num_evict: int):
    """Slot indices of the ``num_evict`` lowest-score entries where ``mask``
    (ties broken by slot order), WITHOUT a capacity-wide ``lax.top_k``:
    an exact radix threshold select (O(C) histogram passes) + a cumsum
    rank extraction (int32 scatter — ~free on TPU).

    Returns ``(idx [num_evict] int32, valid [num_evict] bool)``; invalid
    tail entries (fewer than ``num_evict`` live) point at ``len(scores)``
    (the drop/trash sentinel)."""
    cap = scores.shape[0]
    live = jnp.sum(mask).astype(jnp.int32)
    n_victim = jnp.minimum(live, jnp.int32(num_evict))
    u = to_unsigned_order(scores)
    u = jnp.where(mask, u, jnp.asarray(0, u.dtype) - 1)  # max for dead
    t, below = radix_select_threshold(u, mask, n_victim)
    strict = mask & (u < t)
    eq = mask & (u == t)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))  # inclusive, slot order
    victims = (strict | (eq & (eq_rank <= n_victim - below))) & (
        n_victim > 0)
    rank = jnp.cumsum(victims.astype(jnp.int32)) - 1  # victim order
    idx = jnp.full((num_evict,), cap, jnp.int32).at[
        jnp.where(victims, rank, num_evict)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    valid = jnp.arange(num_evict, dtype=jnp.int32) < n_victim
    return idx, valid


def lowest_score_victims(spec: TableSpec, state: TableState,
                         num_evict: int):
    """:func:`lowest_k_indices` over a table's live slots."""
    return lowest_k_indices(
        state.scores, occupancy_mask(spec, state), num_evict
    )


def evict_lowest(
    spec: TableSpec, state: TableState, num_evict: int
) -> TableState:
    """Remove the ``num_evict`` lowest-score live keys (global eviction;
    the role of the reference's RestrictPolicy apply_restriction
    restrict_policies.py:181-229 and HKV's evict strategies). Victim
    selection is an exact radix select — no capacity-wide top_k."""
    idx, valid = lowest_score_victims(spec, state, num_evict)
    idx = jnp.where(valid, idx, state.capacity)
    e_lo, e_hi = split_key(jnp.asarray(spec.empty_key, jnp.int64))
    new_lo = state.key_lo.at[idx].set(
        jnp.full((num_evict,), e_lo, jnp.int32), mode="drop")
    new_hi = state.key_hi.at[idx].set(
        jnp.full((num_evict,), e_hi, jnp.int32), mode="drop")
    new_scores = state.scores.at[idx].set(
        jnp.zeros((num_evict,), spec.score_dtype), mode="drop"
    )
    return state.replace(key_lo=new_lo, key_hi=new_hi, scores=new_scores)


# ---------------------------------------------------------------------------
# batch utilities
# ---------------------------------------------------------------------------


def dedup_last(keys: jax.Array, arrays=(), size: Optional[int] = None):
    """Deterministic last-occurrence-wins dedup for batch write ops.

    Returns ``(unique_keys [size], picked)`` where ``picked[i] = arrays[i]``
    gathered at each unique key's LAST occurrence in ``keys``. The reference
    C++ tables apply duplicate batch keys sequentially so the final stored
    row is one occurrence's row (cuckoo_hashtable_op.cc:114-182); this pins
    that to the last occurrence, deterministically, which an XLA duplicate-
    index scatter does not guarantee.
    """
    flat = keys.reshape(-1)
    n = flat.shape[0]
    uniq, inverse = unique_static(flat, size=size)
    last = jax.ops.segment_max(
        jnp.arange(n, dtype=jnp.int32),
        inverse,
        num_segments=uniq.shape[0],
    )
    # groups with no members (padding beyond n_unique) get int32 min -> clip;
    # their uniq entry is the EMPTY fill, ignored at commit
    safe = jnp.clip(last, 0, n - 1)
    picked = tuple(a.reshape((n,) + a.shape[len(keys.shape):])[safe]
                   for a in arrays)
    return uniq, picked


def segment_sum_rows(g: jax.Array, seg: jax.Array,
                     num_segments: int) -> jax.Array:
    """``out[t] = sum(g[i] for seg[i] == t)`` — the grad-combine segment
    sum, reformulated for the MXU.

    XLA lowers ``jax.ops.segment_sum`` as a scatter-add that SERIALIZES
    on duplicate targets: 18.0 ns/key on zipf batches at N=64Ki, D=64
    (11.3 distinct) on v5e. Here each 128-row chunk first collapses its
    own duplicates with a pairwise-equality one-hot matmul (out[j] =
    sum_i [first(i) == j] g[i] — 128x128 @ 128xD on the MXU), so the
    scatter-add sees at most ONE row per (chunk, target): 8.6 ns/key
    zipf / 11.1 distinct (tools/ab_segsum.py; sorted-order segment-sum
    and cumsum-difference reformulations measured worse, 13.4-15.3).
    EXACT (not approximate): the matmul runs ``precision=HIGHEST`` — the
    default TPU f32 matmul rounds operands to bf16, which the 0/1
    one-hot survives but the grads do not (measured 7e-2 abs error).
    Rows with ``seg`` outside [0, num_segments) are dropped. Parity
    role: IndexedSlices duplicate aggregation (reference
    dynamic_embedding_optimizer.py:184).
    """
    n, d = g.shape
    b = _LANES
    n_pad = -(-n // b) * b
    seg = seg.astype(jnp.int32)
    if n_pad != n:
        g = jnp.concatenate([g, jnp.zeros((n_pad - n, d), g.dtype)])
        seg = jnp.concatenate(
            [seg, jnp.full((n_pad - n,), num_segments, jnp.int32)])
    nc = n_pad // b
    g3 = g.reshape(nc, b, d)
    t3 = seg.reshape(nc, b)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    eq = t3[:, :, None] == t3[:, None, :]  # [nc, B, B]
    first = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # chunk-local rep
    onehot = (first[:, None, :] == lane[:, :, None]).astype(g.dtype)
    partial = jnp.einsum(
        "cji,cid->cjd", onehot, g3,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(g.dtype)
    is_rep = first == lane
    tgt = jnp.where(is_rep, t3, num_segments)
    return jnp.zeros((num_segments, d), g.dtype).at[
        tgt.reshape(-1)].add(partial.reshape(-1, d), mode="drop")


def sorted_combine_batch(g: jax.Array, slot: jax.Array, found: jax.Array):
    """Duplicate-grad combine for the OCCURRENCE contract (deferred dedup).

    ``(g [N, D], slot [N], found [N])`` with one entry per batch
    occurrence -> ``(combined [N, D], rep [N])``: each touched row's TOTAL
    gradient lands at exactly one of its occurrences (its representative),
    ``rep`` marks them, and every other position holds zeros. Replaces the
    probe-scatter + ``take_elem`` read-back + rep-position scatter-add of
    the ``inverse``-based path (:func:`segment_sum_rows`): sort the
    occurrences by slot (duplicates become ADJACENT), collapse each
    128-row chunk with the one-hot MXU matmul, and fix groups straddling
    chunk boundaries with a segmented associative scan over the per-chunk
    continuation-head sums — no [C]-buffer scatter, no element-gather
    read-back, and the only batch-random scatter is the final
    distinct-target row scatter back to batch positions. Measured
    (tools/ab_dup_contract.py, v5e N=64Ki D=64): the sorted pipeline is
    9.9 vs 23.2 ns/key against the inverse contract on zipf batches
    (13% distinct) and ~par on fully-distinct ones. EXACT up to f32 sum
    reassociation: the one-hot matmul runs precision=HIGHEST (default TPU
    f32 matmuls round operands to bf16), the carry is plain f32 adds.

    Parity role: IndexedSlices duplicate aggregation (reference
    dynamic_embedding_optimizer.py:184), like :func:`segment_sum_rows`.
    """
    n, d = g.shape
    b = _LANES
    n_pad = -(-n // b) * b
    sent = jnp.iinfo(jnp.int32).max
    sidx = jnp.where(found, slot.astype(jnp.int32), sent)
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    if n_pad != n:
        g = jnp.concatenate([g, jnp.zeros((n_pad - n, d), g.dtype)])
        sidx = jnp.concatenate(
            [sidx, jnp.full((n_pad - n,), sent, jnp.int32)])
    nc = n_pad // b
    s_s, order = jax.lax.sort((sidx, pos), num_keys=1)
    g_s = g[order]
    s3 = s_s.reshape(nc, b)
    g3 = g_s.reshape(nc, b, d)
    lane = jnp.arange(b, dtype=jnp.int32)
    eq = s3[:, :, None] == s3[:, None, :]  # [nc, B, B]
    first = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # chunk-local rep
    onehot = (first[:, None, :] == lane[None, :, None]).astype(g.dtype)
    partial = jnp.einsum("cji,cid->cjd", onehot, g3,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    is_lrep = first == lane[None, :]
    # sorted order => a group continuing from the previous chunk is
    # exactly the PREFIX of rows equal to the previous chunk's last slot
    prev_last = jnp.concatenate(
        [jnp.full((1,), -1, s3.dtype), s3[:-1, -1]])
    cont = s3 == prev_last[:, None]  # [nc, B]
    head_sum = jnp.sum(g3 * cont[..., None].astype(g.dtype), axis=1)
    chain = jnp.all(cont, axis=1)  # whole chunk is one continuing group
    # carry[c] = head_sum[c+1] + chain[c+1] * carry[c+1]  (suffix affine
    # recurrence -> segmented associative scan, log2(nc) levels)
    hs = jnp.concatenate([head_sum[1:], jnp.zeros((1, d), g.dtype)])
    ch = jnp.concatenate(
        [chain[1:], jnp.zeros((1,), bool)]).astype(g.dtype)[:, None]

    def comb(x, y):
        # reverse=True folds LATER elements on the left (reverse-scan-
        # reverse), so the combine composes y AFTER x: (y∘x)(t) =
        # ya + yf*(xa + xf*t); orientation pinned by the unit test
        xf, xa = x
        yf, ya = y
        return yf * xf, ya + yf * xa

    _, carry = jax.lax.associative_scan(comb, (ch, hs), reverse=True)
    # deposit each chunk's carry on the local rep of its OPEN (last)
    # group; if that rep is itself a continuation the row is masked by
    # ``rep`` below and its raw rows were already counted upstream in the
    # head_sum chain
    openrep = first[:, -1]  # [nc]
    partial = partial + carry[:, None, :] * (
        lane[None, :] == openrep[:, None])[..., None].astype(g.dtype)
    is_grep = (is_lrep & ~cont & (s3 != sent)).reshape(n_pad)
    # distinct-target row scatter back to batch positions; the rep flags
    # ride a [N, 2] two-column ROW scatter (~free) instead of an [N]
    # element-plane scatter (~3 ns/key, tools/ab_route.py)
    tgt = jnp.where(is_grep, order, n_pad)
    combined = jnp.zeros((n, d), g.dtype).at[tgt].set(
        partial.reshape(n_pad, d).astype(g.dtype), mode="drop")
    flag = jnp.zeros((n, 2), jnp.int32).at[tgt].set(
        jnp.ones((n_pad, 2), jnp.int32), mode="drop")
    return combined, flag[:, 0] != 0


def dedup_sum(keys: jax.Array, arrays=(), size: Optional[int] = None):
    """Dedup with per-key summation of the payload rows (the deterministic
    semantics for duplicate accum deltas: each occurrence's delta is applied,
    matching the reference's sequential insert_or_accum,
    cuckoohash_map.hh:756-765)."""
    flat = keys.reshape(-1)
    n = flat.shape[0]
    uniq, inverse = unique_static(flat, size=size)
    summed = tuple(
        jax.ops.segment_sum(
            a.reshape((n,) + a.shape[len(keys.shape):]),
            inverse,
            num_segments=uniq.shape[0],
        )
        for a in arrays
    )
    return uniq, summed


def unique_static(keys: jax.Array, size: Optional[int] = None, fill=None):
    """Static-shape dedup: ``(unique [size] padded with EMPTY, inverse [N])``.

    The TPU replacement for ``tf.unique`` in the reference's
    ``embedding_lookup_unique`` (dynamic_embedding_ops.py:64-117): output size
    is pinned to ``size`` (default N) and padded with the EMPTY sentinel.

    Hand-rolled sort-based dedup instead of ``jnp.unique``: unique's int64
    cumulative ops lower to reduce-windows that exceed the 16 MB scoped-VMEM
    limit at N=64Ki on v5e; an int32 cumsum compiles and is faster.
    """
    flat = keys.reshape(-1)
    n = flat.shape[0]
    size = size or n
    if fill is None:
        fill = hashing.empty_key_for(np.dtype(keys.dtype))
    # one multi-operand sort instead of argsort + gather
    sk, order = jax.lax.sort(
        (flat, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # group id, sorted order
    gid_c = jnp.minimum(gid, size - 1)
    # int64 element scatters are ~40x slower than int32 on TPU (see
    # split_key); scatter the two 32-bit planes separately and rejoin.
    sk_lo, sk_hi = split_key(sk.astype(jnp.int64))
    f_lo, f_hi = split_key(jnp.asarray(fill, jnp.int64))
    u_lo = jnp.full((size,), f_lo, jnp.int32).at[gid_c].set(sk_lo)
    u_hi = jnp.full((size,), f_hi, jnp.int32).at[gid_c].set(sk_hi)
    uniq = join_key(u_lo, u_hi).astype(flat.dtype)
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid_c)
    return uniq, inverse.reshape(keys.shape)
