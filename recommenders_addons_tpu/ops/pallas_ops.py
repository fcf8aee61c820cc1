"""Pallas TPU kernels for the dynamic-embedding hot path: random row
gather/scatter against HBM-resident tables.

Why these exist (measured on v5e, C=4Mi rows, N=64Ki batch): XLA lowers
table gathers/scatters by STREAMING THE WHOLE TABLE through the VPU — cost
is O(capacity), ~4.4 ms per gather and ~12 ms per scatter at 1 GB, and it
scales linearly with table size. These kernels instead issue one async DMA
per row (O(batch)): ~51 ns/row issue rate, so a 64Ki-row gather costs
~3.3 ms REGARDLESS of capacity — the bigger the table, the bigger the win.

Mosaic constraints and how they're met:
  * DMA slices must be 128-lane aligned; a [1, W] slice of a [C, W] memref
    with W > 128 gets (8, 128) tiling and is rejected. We therefore view
    the table as [C * W/128, 128] and copy [W/128, 128] slices — one DMA
    per logical row at any W % 128 == 0.
  * x64 mode: all in-kernel scalars pinned to int32; index_map literals
    written as `i * 0` so they don't promote to i64 (Mosaic crashes on
    mixed-type index tuples).
  * Invalid indices (negative or >= capacity, the drop sentinel): both the
    DMA start and its paired wait are predicated on the same recomputed
    condition, so semaphore accounting stays balanced.

Role parity: these are the TPU equivalents of the reference's CUDA
gather/scatter kernels inside HKV (lookup_table_op_hkv.h:522-745).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024  # keys per grid step
_NBUF = 16  # DMAs in flight (semaphore slots)
_LANES = 128


def use_pallas(table: jax.Array) -> bool:
    import os

    if os.environ.get("TFRA_TPU_DISABLE_PALLAS") == "1":
        return False
    # any 32-bit container works (f32 values, f32-bitcast bf16/f16,
    # int32-bitcast int8); DMA moves bytes, not dtypes
    if table.ndim != 2 or table.dtype.itemsize != 4:
        return False
    if table.shape[1] % _LANES != 0 or table.shape[1] == 0:
        return False
    try:
        platform = next(iter(table.devices())).platform
    except Exception:
        platform = jax.default_backend()
    return platform == "tpu"


def _pad_idx(idx: jax.Array, sentinel: int):
    n = idx.shape[0]
    n_pad = (n + _TILE - 1) // _TILE * _TILE
    if n_pad != n:
        idx = jnp.concatenate(
            [idx, jnp.full((n_pad - n,), sentinel, idx.dtype)]
        )
    return idx, n


def _row_dma_loop(cap: int, ch: int, idx_ref, mk):
    """Software-pipelined DMA loop: start j, wait j-NBUF, both predicated
    on the (recomputed) validity of their own row index."""
    i32 = jnp.int32

    def cond_wait(j):
        row, dma = mk(j)

        @pl.when((row >= 0) & (row < cap))
        def _():
            dma.wait()

    def cond_start(j):
        row, dma = mk(j)

        @pl.when((row >= 0) & (row < cap))
        def _():
            dma.start()

    def loop(j, _):
        @pl.when(j >= i32(_NBUF))
        def _():
            cond_wait(j - i32(_NBUF))

        cond_start(j)
        return ()

    jax.lax.fori_loop(i32(0), i32(_TILE), loop, ())

    def drain(j, _):
        cond_wait(i32(_TILE - _NBUF) + j)
        return ()

    jax.lax.fori_loop(i32(0), i32(_NBUF), drain, ())


def _gather_kernel(cap, ch, idx_ref, table_ref, out_ref, sems):
    g = pl.program_id(0)
    i32 = jnp.int32

    def mk(j):
        row = idx_ref[g * i32(_TILE) + j]
        dma = pltpu.make_async_copy(
            table_ref.at[pl.ds(row * i32(ch), ch), :],
            out_ref.at[pl.ds(j * i32(ch), ch), :],
            sems.at[jax.lax.rem(j, i32(_NBUF))],
        )
        return row, dma

    _row_dma_loop(cap, ch, idx_ref, mk)


def _scatter_kernel(cap, ch, idx_ref, table_ref, rows_ref, out_ref, sems):
    del table_ref  # aliased with out_ref
    g = pl.program_id(0)
    i32 = jnp.int32

    def mk(j):
        row = idx_ref[g * i32(_TILE) + j]
        dma = pltpu.make_async_copy(
            rows_ref.at[pl.ds(j * i32(ch), ch), :],
            out_ref.at[pl.ds(row * i32(ch), ch), :],
            sems.at[jax.lax.rem(j, i32(_NBUF))],
        )
        return row, dma

    _row_dma_loop(cap, ch, idx_ref, mk)


def gather_rows_2d(table2d: jax.Array, ch: int, idx: jax.Array):
    """Gather logical rows from the PHYSICAL [C*ch, 128] layout; returns
    [N, ch*128]. Out-of-range idx yield zero rows. The physical layout
    avoids a reshape on the (potentially aliased/donated) table operand —
    XLA's scan-aliasing only sees through identity reshapes."""
    cap = table2d.shape[0] // ch
    idx = idx.astype(jnp.int32)
    idx_p, n = _pad_idx(idx, cap)
    np_ = idx_p.shape[0]
    out = pl.pallas_call(
        functools.partial(_gather_kernel, cap, ch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // _TILE,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (_TILE * ch, _LANES), lambda i, idx_ref: (i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((np_ * ch, _LANES), table2d.dtype),
    )(idx_p, table2d)
    out = out.reshape(np_, ch * _LANES)[:n]
    valid = (idx >= 0) & (idx < cap)
    return jnp.where(valid[:, None], out, 0)


def _gather_pallas(table: jax.Array, idx: jax.Array):
    cap, w = table.shape
    ch = w // _LANES
    return gather_rows_2d(table.reshape(cap * ch, _LANES), ch, idx)


def scatter_rows_set_2d(table2d: jax.Array, ch: int, idx: jax.Array,
                        rows: jax.Array):
    """In-place set of logical rows on the PHYSICAL [C*ch, 128] layout.
    ``rows`` is [N, ch*128]. Passing the table un-reshaped keeps XLA's
    aliasing intact even inside lax.scan (a reshape on the aliased operand
    forces a full-table copy per iteration)."""
    cap = table2d.shape[0] // ch
    idx = idx.astype(jnp.int32)
    idx_p, n = _pad_idx(idx, cap)
    np_ = idx_p.shape[0]
    w = ch * _LANES
    rows = rows.astype(table2d.dtype).reshape(-1, w)
    if np_ != n:
        rows = jnp.concatenate(
            [rows, jnp.zeros((np_ - n, w), rows.dtype)]
        )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, cap, ch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // _TILE,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # table (aliased)
                pl.BlockSpec(
                    (_TILE * ch, _LANES), lambda i, idx_ref: (i, i * 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct(table2d.shape, table2d.dtype),
        input_output_aliases={1: 0},  # table -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx_p, table2d, rows.reshape(np_ * ch, _LANES))


def _scatter_pallas(table: jax.Array, idx: jax.Array, rows: jax.Array):
    cap, w = table.shape
    ch = w // _LANES
    out = scatter_rows_set_2d(
        table.reshape(cap * ch, _LANES), ch, idx, rows
    )
    return out.reshape(cap, w)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` with O(batch) cost on TPU. Out-of-range idx (< 0 or
    >= capacity — the drop sentinel) yield zero rows."""
    if use_pallas(table):
        return _gather_pallas(table, idx)
    cap = table.shape[0]
    idx = idx.astype(jnp.int32)
    valid = (idx >= 0) & (idx < cap)
    out = table[jnp.where(valid, idx, 0)]
    return jnp.where(valid[:, None], out, 0)


def scatter_rows_set(table: jax.Array, idx: jax.Array,
                     rows: jax.Array) -> jax.Array:
    """``table.at[idx].set(rows)`` with O(batch) cost on TPU. Valid indices
    must be unique; out-of-range indices (the drop sentinel) are skipped."""
    if use_pallas(table):
        return _scatter_pallas(table, idx, rows)
    cap = table.shape[0]
    idx = idx.astype(jnp.int32)
    safe = jnp.where((idx >= 0) & (idx < cap), idx, cap)
    return table.at[safe].set(rows.astype(table.dtype), mode="drop",
                              unique_indices=True)
