"""Isolate the fused-apply kernel's in-kernel costs on the real chip.

Variants of fused_update_scatter_refs-shaped kernels, timed with the
scan-slope method:
  * adam      — production tile_fn (Adam math + concat + reshape to phys)
  * identity  — tile_fn returns the packed block unchanged (no math; still
                pays the [TILE, W] -> [TILE*ch, 128] reshape + vmem store)
  * rawcopy   — vmem staged via direct ref copy, no tile_fn at all
  * chunk256  — adam tile_fn computed per 256-row sub-chunk, issue loop
                interleaved per chunk (tests scalar/vector co-scheduling)

    python tools/ab_kernel_cost.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 1 << 21
D = 64
W = 256
CH = 2
_TILE = 1024
_NBUF = 32
_UNROLL = 16
_LANES = 128
BATCHES = (1 << 13, 1 << 16)
STEPS = 10


def adam_tile(blks, step):
    packed, g = blks
    rows = packed[:, :D]
    m = packed[:, D:2 * D]
    v = packed[:, 2 * D:3 * D]
    t = jnp.full((1, 1), step, rows.dtype) + 1.0
    m = 0.9 * m + 0.1 * g
    v = 0.999 * v + 0.001 * g * g
    lr = 0.001 * jnp.sqrt(1.0 - 0.999**t) / (1.0 - 0.9**t)
    new = rows - lr * m / (jnp.sqrt(v) + 1e-7)
    out = jnp.concatenate(
        [new, m, v, jnp.zeros((new.shape[0], W - 3 * D), new.dtype)], axis=1)
    return out


def make_fused(mode: str, sub: int = _TILE, nbuf: int = _NBUF):
    i32 = jnp.int32

    def kernel(idx_ref, step_ref, table_ref, packed_ref, g_ref,
               out_ref, vmem, sems):
        del table_ref
        g_id = pl.program_id(0)

        def sem_at(j):
            return sems.at[jax.lax.bitwise_and(j, i32(nbuf - 1))]

        def mk_start(j):
            row = idx_ref[g_id * i32(_TILE) + j]
            return pltpu.make_async_copy(
                vmem.at[pl.ds(j * i32(CH), CH), :],
                out_ref.at[pl.ds(row, CH), :],
                sem_at(j),
            )

        def mk_wait(j):
            return pltpu.make_async_copy(
                vmem.at[pl.ds(j * i32(CH), CH), :],
                out_ref.at[pl.ds(i32(0), CH), :],
                sem_at(j),
            )

        nchunks = _TILE // sub
        for c in range(nchunks):
            if mode == "rawcopy":
                vmem[c * sub * CH:(c + 1) * sub * CH, :] = (
                    packed_ref[c * sub:(c + 1) * sub, :].reshape(
                        sub * CH, _LANES))
            else:
                blks = (packed_ref[c * sub:(c + 1) * sub, :],
                        g_ref[c * sub:(c + 1) * sub, :])
                if mode == "identity":
                    new_rows = blks[0]
                else:
                    new_rows = adam_tile(blks, step_ref[0])
                vmem[c * sub * CH:(c + 1) * sub * CH, :] = new_rows.reshape(
                    sub * CH, _LANES)
            base = c * sub

            def loop(jj, _):
                for u in range(_UNROLL):
                    j = i32(base) + jj * i32(_UNROLL) + i32(u)

                    @pl.when(j >= i32(nbuf))
                    def _():
                        mk_wait(j - i32(nbuf)).wait()

                    mk_start(j).start()
                return ()

            jax.lax.fori_loop(i32(0), i32(sub // _UNROLL), loop, ())

        def drain(j, _):
            mk_wait(i32(_TILE - nbuf) + j).wait()
            return ()

        jax.lax.fori_loop(i32(0), i32(nbuf), drain, ())

    def call(table2d, idx, packed, g, step):
        n = idx.shape[0]
        idx = idx * jnp.int32(CH)
        step_arr = jnp.asarray([step], jnp.float32)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n // _TILE,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((_TILE, W), lambda i, *_: (i, i * 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_TILE, D), lambda i, *_: (i, i * 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((_TILE * CH, _LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(table2d.shape, table2d.dtype),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, step_arr, table2d, packed, g)

    return call


def timed(fn, table, idx, packed, g):
    @jax.jit
    def run(table, idx, packed, g):
        def step(tbl, i):
            ix = (idx + i * np.int32(2654435761 % CAP)) & (CAP - 1)
            tbl = fn(tbl, ix, packed, g, i)
            return tbl, ()
        tbl, _ = jax.lax.scan(step, table,
                              jnp.arange(STEPS, dtype=jnp.int32))
        return tbl

    out = run(table, idx, packed, g)
    _ = float(out[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(table, idx, packed, g)
        _ = float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal(((CAP + 1) * CH, _LANES)).astype(np.float32))
    print(f"cap={CAP} device={jax.devices()[0].device_kind}")
    variants = [
        ("adam chunk128", make_fused("adam", sub=128)),
        ("adam chunk64", make_fused("adam", sub=64)),
        ("adam chunk128 nbuf64", make_fused("adam", sub=128, nbuf=64)),
        ("adam chunk64 nbuf64", make_fused("adam", sub=64, nbuf=64)),
        ("ident chunk128", make_fused("identity", sub=128)),
    ]
    b0, b1 = BATCHES
    for name, fn in variants:
        try:
            ts = {}
            for b in BATCHES:
                idx = jnp.asarray(
                    rng.integers(0, CAP, size=b, dtype=np.int32))
                packed = jnp.asarray(
                    rng.standard_normal((b, W)).astype(np.float32))
                g = jnp.asarray(
                    rng.standard_normal((b, D)).astype(np.float32) * 0.01)
                ts[b] = timed(fn, table, idx, packed, g)
            s = (ts[b1] - ts[b0]) / (b1 - b0)
            print(f"{name:>18}: {s * 1e9:6.1f} ns/row  "
                  f"[{ts[b0]*1e3:6.2f} ms, {ts[b1]*1e3:6.2f} ms]",
                  flush=True)
        except Exception as e:
            print(f"{name:>18}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
