"""DMA issue-rate microbenchmark: how cheap can the per-row descriptor loop
get? Tests variants of the row-gather kernel (predication, rem vs bitwise
semaphore indexing, unrolling, in-flight depth) on the real chip with the
scan-slope methodology.

    python tools/dma_bench.py [log2_capacity] [chunks]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 21)
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 2  # 128-lane rows per row
_TILE = 1024
_LANES = 128
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def make_gather(nbuf: int, predicated: bool, bitand: bool, unroll: int,
                premul: bool = False):
    i32 = jnp.int32

    def kernel(cap, ch, idx_ref, table_ref, out_ref, sems):
        g = pl.program_id(0)

        def sem_at(j):
            if bitand:
                return sems.at[jax.lax.bitwise_and(j, i32(nbuf - 1))]
            return sems.at[jax.lax.rem(j, i32(nbuf))]

        def mk(j):
            row = idx_ref[g * i32(_TILE) + j]
            base = row if premul else row * i32(ch)
            dma = pltpu.make_async_copy(
                table_ref.at[pl.ds(base, ch), :],
                out_ref.at[pl.ds(j * i32(ch), ch), :],
                sem_at(j),
            )
            return row, dma

        def start(j):
            row, dma = mk(j)
            if predicated:
                @pl.when((row >= 0) & (row < cap))
                def _():
                    dma.start()
            else:
                dma.start()

        def wait(j):
            row, dma = mk(j)
            if predicated:
                @pl.when((row >= 0) & (row < cap))
                def _():
                    dma.wait()
            else:
                dma.wait()

        def loop(jj, _):
            for u in range(unroll):
                j = jj * i32(unroll) + i32(u)

                @pl.when(j >= i32(nbuf))
                def _():
                    wait(j - i32(nbuf))

                start(j)
            return ()

        jax.lax.fori_loop(i32(0), i32(_TILE // unroll), loop, ())

        def drain(j, _):
            wait(i32(_TILE - nbuf) + j)
            return ()

        jax.lax.fori_loop(i32(0), i32(nbuf), drain, ())

    def gather(table2d, idx):
        cap = table2d.shape[0] // CH
        if premul:
            idx = idx * np.int32(CH)
        n = idx.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, cap, CH),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // _TILE,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (_TILE * CH, _LANES), lambda i, idx_ref: (i, i * 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
            ),
            out_shape=jax.ShapeDtypeStruct((n * CH, _LANES), table2d.dtype),
        )(idx, table2d)

    return gather


def make_gather_grouped(ngroups: int, group: int):
    """Grouped-wait gather: ``group`` row copies signal ONE semaphore;
    one wait per group consumes group*row_bytes (a contiguous dummy slice
    supplies the byte count). Waits drop group-fold and the in-flight
    window becomes ngroups*group rows."""
    i32 = jnp.int32

    def kernel(idx_ref, table_ref, out_ref, sems):
        g = pl.program_id(0)

        def start(j, sem_idx):
            row = idx_ref[g * i32(_TILE) + j]  # premultiplied
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, CH), :],
                out_ref.at[pl.ds(j * i32(CH), CH), :],
                sems.at[sem_idx],
            ).start()

        def wait_group(grp):
            # byte count = group rows; source slice only sizes the wait
            pltpu.make_async_copy(
                table_ref.at[pl.ds(i32(0), CH * group), :],
                out_ref.at[pl.ds(grp * i32(CH * group), CH * group), :],
                sems.at[jax.lax.bitwise_and(grp, i32(ngroups - 1))],
            ).wait()

        n_grp_total = _TILE // group

        # group == unroll: the wait check is once per (static) group body
        def loop(jj, _):
            @pl.when(jj >= i32(ngroups))
            def _():
                wait_group(jj - i32(ngroups))

            sem_idx = jax.lax.bitwise_and(jj, i32(ngroups - 1))
            for u in range(group):
                start(jj * i32(group) + i32(u), sem_idx)
            return ()

        jax.lax.fori_loop(i32(0), i32(n_grp_total), loop, ())

        def drain(gg, _):
            wait_group(i32(n_grp_total - ngroups) + gg)
            return ()

        jax.lax.fori_loop(i32(0), i32(min(ngroups, n_grp_total)), drain, ())

    def gather(table2d, idx):
        idx = idx * np.int32(CH)
        n = idx.shape[0]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // _TILE,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (_TILE * CH, _LANES), lambda i, idx_ref: (i, i * 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA((ngroups,))],
            ),
            out_shape=jax.ShapeDtypeStruct((n * CH, _LANES), table2d.dtype),
        )(idx, table2d)

    return gather


def make_scatter_grouped(ngroups: int, group: int):
    """Grouped-wait aliased scatter (trash row; premultiplied idx)."""
    i32 = jnp.int32

    def kernel(idx_ref, table_ref, rows_ref, out_ref, sems):
        del table_ref
        g = pl.program_id(0)

        def start(j, sem_idx):
            row = idx_ref[g * i32(_TILE) + j]  # premultiplied
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(j * i32(CH), CH), :],
                out_ref.at[pl.ds(row, CH), :],
                sems.at[sem_idx],
            ).start()

        def wait_group(grp):
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(grp * i32(CH * group), CH * group), :],
                out_ref.at[pl.ds(i32(0), CH * group), :],
                sems.at[jax.lax.bitwise_and(grp, i32(ngroups - 1))],
            ).wait()

        n_grp_total = _TILE // group

        def loop(jj, _):
            @pl.when(jj >= i32(ngroups))
            def _():
                wait_group(jj - i32(ngroups))

            sem_idx = jax.lax.bitwise_and(jj, i32(ngroups - 1))
            for u in range(group):
                start(jj * i32(group) + i32(u), sem_idx)
            return ()

        jax.lax.fori_loop(i32(0), i32(n_grp_total), loop, ())

        def drain(gg, _):
            wait_group(i32(n_grp_total - ngroups) + gg)
            return ()

        jax.lax.fori_loop(i32(0), i32(min(ngroups, n_grp_total)), drain, ())

    def scatter(table2d, idx, rows):
        idx = idx * np.int32(CH)
        n = idx.shape[0]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // _TILE,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (_TILE * CH, _LANES), lambda i, idx_ref: (i, i * 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((ngroups,))],
            ),
            out_shape=jax.ShapeDtypeStruct(table2d.shape, table2d.dtype),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table2d, rows)

    return scatter


def make_scatter(nbuf: int, predicated: bool, unroll: int,
                 extra_rows: int = 0, premul: bool = False):
    """Aliased scatter kernel; with extra_rows=1 the table carries a trash
    row at index CAP and sentinel writes are redirected there instead of
    predicated off."""
    i32 = jnp.int32

    def kernel(cap, ch, idx_ref, table_ref, rows_ref, out_ref, sems):
        del table_ref
        g = pl.program_id(0)

        def mk(j):
            row = idx_ref[g * i32(_TILE) + j]
            base = row if premul else row * i32(ch)
            dma = pltpu.make_async_copy(
                rows_ref.at[pl.ds(j * i32(ch), ch), :],
                out_ref.at[pl.ds(base, ch), :],
                sems.at[jax.lax.bitwise_and(j, i32(nbuf - 1))],
            )
            return row, dma

        def start(j):
            row, dma = mk(j)
            if predicated:
                @pl.when((row >= 0) & (row < cap))
                def _():
                    dma.start()
            else:
                dma.start()

        def wait(j):
            row, dma = mk(j)
            if predicated:
                @pl.when((row >= 0) & (row < cap))
                def _():
                    dma.wait()
            else:
                dma.wait()

        def loop(jj, _):
            for u in range(unroll):
                j = jj * i32(unroll) + i32(u)

                @pl.when(j >= i32(nbuf))
                def _():
                    wait(j - i32(nbuf))

                start(j)
            return ()

        jax.lax.fori_loop(i32(0), i32(_TILE // unroll), loop, ())

        def drain(j, _):
            wait(i32(_TILE - nbuf) + j)
            return ()

        jax.lax.fori_loop(i32(0), i32(nbuf), drain, ())

    def scatter(table2d, idx, rows):
        cap = table2d.shape[0] // CH - extra_rows
        if premul:
            idx = idx * np.int32(CH)
        n = idx.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, cap, CH),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // _TILE,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (_TILE * CH, _LANES), lambda i, idx_ref: (i, i * 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
            ),
            out_shape=jax.ShapeDtypeStruct(table2d.shape, table2d.dtype),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table2d, rows)

    return scatter


REPS = 7


def _pair_slope(run_by_b, consume):
    """Marginal ns/row from ADJACENTLY-timed (b0, b1) runs, median over
    REPS (bench.py methodology). The tunnel's device throughput drifts
    +-20% between measurement blocks, which corrupts slopes taken from
    separately-timed batch-size blocks — the previous min-of-3-per-size
    timing here produced nonsense under host load (1.7 ns/row for a
    variant that is really ~11)."""
    b0, b1 = BATCHES
    for b in BATCHES:  # compile + warm
        consume(run_by_b[b]())
    slopes = []
    for _rep in range(REPS):
        ts = {}
        for b in BATCHES:
            t0 = time.perf_counter()
            consume(run_by_b[b]())
            ts[b] = time.perf_counter() - t0
        slopes.append((ts[b1] - ts[b0]) / (b1 - b0) / STEPS)
    slopes.sort()
    return slopes[len(slopes) // 2]


def timed_scatter(scatter_fn, table, idx_by_b, rows_by_b):
    def mk(b):
        base_idx, rows = idx_by_b[b], rows_by_b[b]

        @jax.jit
        def run(table, base_idx, rows):
            def step(tbl, i):
                idx = (base_idx + i * np.int32(2654435761 % CAP)) & (CAP - 1)
                tbl = scatter_fn(tbl, idx, rows)
                return tbl, ()
            tbl, _ = jax.lax.scan(step, table,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return tbl

        return lambda: run(table, base_idx, rows)

    return _pair_slope({b: mk(b) for b in BATCHES},
                       lambda out: float(out[0, 0]))


def timed(gather_fn, table, idx_by_b):
    def mk(b):
        base_idx = idx_by_b[b]

        @jax.jit
        def run(table, base_idx):
            def step(acc, i):
                idx = (base_idx + i * np.int32(2654435761 % CAP)) & (CAP - 1)
                out = gather_fn(table, idx)
                return acc + out[0, 0], ()
            acc, _ = jax.lax.scan(
                step, jnp.zeros((), table.dtype),
                jnp.arange(STEPS, dtype=jnp.int32))
            return acc

        return lambda: run(table, base_idx)

    return _pair_slope({b: mk(b) for b in BATCHES}, float)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((CAP * CH, _LANES), np.float32))
    print(f"cap={CAP} row={CH * _LANES * 4}B "
          f"device={jax.devices()[0].device_kind}")
    variants = [
        ("unroll16  nbuf32 premul", dict(nbuf=32, predicated=False,
                                         bitand=True, unroll=16,
                                         premul=True)),
        ("grouped g16 x 4sem", dict(grouped=True, ngroups=4, group=16)),
        ("grouped g16 x 8sem", dict(grouped=True, ngroups=8, group=16)),
        ("grouped g16 x 16sem", dict(grouped=True, ngroups=16, group=16)),
        ("grouped g32 x 8sem", dict(grouped=True, ngroups=8, group=32)),
        ("grouped g8 x 8sem", dict(grouped=True, ngroups=8, group=8)),
    ]
    for name, kw in variants:
        try:
            if kw.get("grouped"):
                g = make_gather_grouped(kw["ngroups"], kw["group"])
            else:
                g = make_gather(**kw)
            idx_by_b = {
                b: jnp.asarray(rng.integers(0, CAP, size=b, dtype=np.int32))
                for b in BATCHES
            }
            s = timed(g, table, idx_by_b)
            print(f"{name:>28}: {s * 1e9:6.1f} ns/row", flush=True)
        except Exception as e:
            print(f"{name:>28}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    sc_variants = [
        ("SC u16 nbuf32 premul", dict(nbuf=32, predicated=False,
                                      unroll=16, extra_rows=1,
                                      premul=True)),
        ("SC grouped g8 x 8sem", dict(grouped=True, ngroups=8, group=8)),
        ("SC grouped g16 x 8sem", dict(grouped=True, ngroups=8, group=16)),
        ("SC grouped g8 x 16sem", dict(grouped=True, ngroups=16, group=8)),
    ]
    for name, kw in sc_variants:
        try:
            tbl = jnp.concatenate(
                [table, jnp.zeros((CH, _LANES), table.dtype)])
            if kw.get("grouped"):
                sfn = make_scatter_grouped(kw["ngroups"], kw["group"])
            else:
                kw2 = dict(kw); kw2.pop("grouped", None)
                sfn = make_scatter(**kw2)
            idx_by_b = {
                b: jnp.asarray(rng.integers(0, CAP, size=b, dtype=np.int32))
                for b in BATCHES
            }
            rows_by_b = {
                b: jnp.ones((b * CH, _LANES), table.dtype) for b in BATCHES
            }
            s = timed_scatter(sfn, tbl, idx_by_b, rows_by_b)
            print(f"{name:>28}: {s * 1e9:6.1f} ns/row", flush=True)
        except Exception as e:
            print(f"{name:>28}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
