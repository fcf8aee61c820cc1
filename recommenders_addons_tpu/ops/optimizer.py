"""Sparse row-wise optimizers for dynamic-embedding tables.

Re-design of the reference's ``DynamicEmbeddingOptimizer`` wrapper
(python/ops/dynamic_embedding_optimizer.py:103-958). The reference patches TF
optimizers so their slot variables become sibling KV tables and the apply
sequence is read-rows -> dense-math -> write-rows-back. Here the same idea is
functional and local: optimizer slots are extra columns of the table shard
(``TableState.slots``), the update math runs on the gathered [U, D] rows, and
a single planned scatter commits rows + slots + scores together — so an
optimizer step never moves data across shards or the interconnect.

Two optimizer families:
  * Named TF-semantics optimizers (sgd/momentum/adagrad/adam/ftrl/rmsprop/
    adamw) with the same slot names and update math as the TF originals, so
    the reference's parity-vs-dense-baseline tests translate directly
    (dynamic_embedding_optimizer_test.py strategy, SURVEY.md §4).
  * ``from_optax``: wraps ANY optax GradientTransformation by vmapping its
    scalar per-parameter update over rows; optax state leaves become slot
    columns (per-row, incl. per-row step counts — strictly better than the
    reference's global-step slots for sparse training).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable


class SparseOptimizer:
    """Row-wise optimizer protocol.

    ``slot_specs()`` -> {slot_name: fresh-row fill value};
    ``update(rows, grads, slots, step)`` -> (new_rows, new_slots).
    All arrays are [U, D]; ``step`` is the global step (TF bias-correction
    semantics for adam — the reference keeps beta powers global too).
    """

    def slot_specs(self) -> Dict[str, float]:
        raise NotImplementedError

    def update(
        self,
        rows: jax.Array,
        grads: jax.Array,
        slots: Dict[str, jax.Array],
        step: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True, eq=False)
class SGD(SparseOptimizer):
    learning_rate: float = 0.01

    def slot_specs(self):
        return {}

    def update(self, rows, grads, slots, step):
        return rows - self.learning_rate * grads, {}


@dataclasses.dataclass(frozen=True, eq=False)
class Momentum(SparseOptimizer):
    learning_rate: float = 0.01
    momentum: float = 0.9
    nesterov: bool = False

    def slot_specs(self):
        return {"momentum": 0.0}

    def update(self, rows, grads, slots, step):
        m = slots["momentum"] * self.momentum + grads
        if self.nesterov:
            upd = grads + self.momentum * m
        else:
            upd = m
        return rows - self.learning_rate * upd, {"momentum": m}


@dataclasses.dataclass(frozen=True, eq=False)
class Adagrad(SparseOptimizer):
    learning_rate: float = 0.001
    initial_accumulator_value: float = 0.1
    epsilon: float = 1e-7

    def slot_specs(self):
        return {"accumulator": self.initial_accumulator_value}

    def update(self, rows, grads, slots, step):
        acc = slots["accumulator"] + grads * grads
        new = rows - self.learning_rate * grads / (
            jnp.sqrt(acc) + self.epsilon
        )
        return new, {"accumulator": acc}


@dataclasses.dataclass(frozen=True, eq=False)
class Adam(SparseOptimizer):
    learning_rate: float = 0.001
    beta_1: float = 0.9
    beta_2: float = 0.999
    epsilon: float = 1e-7

    def slot_specs(self):
        return {"m": 0.0, "v": 0.0}

    def update(self, rows, grads, slots, step):
        t = jnp.asarray(step, rows.dtype) + 1.0
        m = self.beta_1 * slots["m"] + (1.0 - self.beta_1) * grads
        v = self.beta_2 * slots["v"] + (1.0 - self.beta_2) * grads * grads
        lr_t = (
            self.learning_rate
            * jnp.sqrt(1.0 - self.beta_2**t)
            / (1.0 - self.beta_1**t)
        )
        new = rows - lr_t * m / (jnp.sqrt(v) + self.epsilon)
        return new, {"m": m, "v": v}


@dataclasses.dataclass(frozen=True, eq=False)
class AdamW(Adam):
    weight_decay: float = 0.004

    def update(self, rows, grads, slots, step):
        new, s = super().update(rows, grads, slots, step)
        return new - self.learning_rate * self.weight_decay * rows, s


@dataclasses.dataclass(frozen=True, eq=False)
class RMSprop(SparseOptimizer):
    learning_rate: float = 0.001
    rho: float = 0.9
    momentum: float = 0.0
    epsilon: float = 1e-7

    def slot_specs(self):
        return {"rms": 0.0, "momentum": 0.0}

    def update(self, rows, grads, slots, step):
        rms = self.rho * slots["rms"] + (1.0 - self.rho) * grads * grads
        mom = (
            self.momentum * slots["momentum"]
            + self.learning_rate * grads / jnp.sqrt(rms + self.epsilon)
        )
        return rows - mom, {"rms": rms, "momentum": mom}


@dataclasses.dataclass(frozen=True, eq=False)
class FTRL(SparseOptimizer):
    learning_rate: float = 0.001
    learning_rate_power: float = -0.5
    initial_accumulator_value: float = 0.1
    l1_regularization_strength: float = 0.0
    l2_regularization_strength: float = 0.0

    def slot_specs(self):
        return {
            "accumulator": self.initial_accumulator_value,
            "linear": 0.0,
        }

    def update(self, rows, grads, slots, step):
        n, z = slots["accumulator"], slots["linear"]
        lr, p = self.learning_rate, self.learning_rate_power
        n_new = n + grads * grads
        sigma = (n_new**-p - n**-p) / lr
        z_new = z + grads - sigma * rows
        l1, l2 = (
            self.l1_regularization_strength,
            self.l2_regularization_strength,
        )
        quad = n_new**-p / lr + 2.0 * l2
        pruned = jnp.clip(z_new, -l1, l1) - z_new
        new = jnp.where(jnp.abs(z_new) > l1, pruned / quad, 0.0)
        return new, {"accumulator": n_new, "linear": z_new}


class OptaxSparseOptimizer(SparseOptimizer):
    """Adapter: any optax ``GradientTransformation`` applied row-wise.

    State leaves from ``tx.init(zeros[D])`` become slot columns [C, D].
    Scalar leaves (e.g. step counts) are stored broadcast across the column
    and advance **per-row** — each row's bias correction tracks its own
    update count, which is the correct semantics for sparse training.
    Note: transforms that couple parameters globally (e.g. clip_by_global_norm)
    see one ROW as the whole "tree" here.
    """

    def __init__(self, tx, dim: int, dtype=jnp.float32):
        self._tx = tx
        self._dim = dim
        # may be constructed inside a jit trace (lazy resolve): force the
        # probe to evaluate at compile time so fills are concrete floats
        with jax.ensure_compile_time_eval():
            probe = tx.init(jnp.zeros((dim,), dtype))
        leaves, self._treedef = jax.tree_util.tree_flatten(probe)
        self._leaf_shapes = [l.shape for l in leaves]
        self._leaf_dtypes = [l.dtype for l in leaves]
        self._names = [f"optax_{i}" for i in range(len(leaves))]
        self._fills = [float(np.asarray(l).reshape(-1)[0]) for l in leaves]

    def slot_specs(self):
        return dict(zip(self._names, self._fills))

    def _state_from_slots(self, slots):
        leaves = []
        for name, shape, dt in zip(
            self._names, self._leaf_shapes, self._leaf_dtypes
        ):
            col = slots[name]  # [U, D]
            if shape == ():
                leaves.append(col[:, 0].astype(dt))  # per-row scalar
            else:
                leaves.append(col.astype(dt))
        return leaves

    def update(self, rows, grads, slots, step):
        leaves = self._state_from_slots(slots)

        def row_update(g, p, *state_leaves):
            st = jax.tree_util.tree_unflatten(self._treedef, list(state_leaves))
            upd, new_st = self._tx.update(g, st, p)
            return p + upd, jax.tree_util.tree_leaves(new_st)

        new_rows, new_leaves = jax.vmap(row_update)(grads, rows, *leaves)
        new_slots = {}
        for name, shape, leaf in zip(
            self._names, self._leaf_shapes, new_leaves
        ):
            if shape == ():
                leaf = jnp.broadcast_to(leaf[:, None], rows.shape).astype(
                    rows.dtype
                )
            new_slots[name] = leaf
        return new_rows, new_slots


def DynamicEmbeddingOptimizer(opt, bp_v2: Optional[bool] = None, **_kw):
    """Parity entry point (reference dynamic_embedding_optimizer.py:103).

    Accepts a ``SparseOptimizer`` (returned unchanged), an optax
    ``GradientTransformation`` (wrapped lazily per-table via
    :func:`resolve_for`), or a name string.
    ``bp_v2`` lives on the ``Variable`` in this design; the kwarg is accepted
    for call-site compatibility and ignored here.
    """
    del bp_v2
    if isinstance(opt, SparseOptimizer):
        return opt
    if isinstance(opt, str):
        return {
            "sgd": SGD,
            "momentum": Momentum,
            "adagrad": Adagrad,
            "adam": Adam,
            "adamw": AdamW,
            "rmsprop": RMSprop,
            "ftrl": FTRL,
        }[opt.lower()]()
    return _LazyOptax(opt)


class _LazyOptax:
    """Defers optax wrapping until the table dim is known."""

    def __init__(self, tx):
        self.tx = tx
        self._cache: Dict[Tuple[int, Any], OptaxSparseOptimizer] = {}

    def resolve(self, dim: int, dtype) -> OptaxSparseOptimizer:
        k = (dim, jnp.dtype(dtype).name)
        if k not in self._cache:
            self._cache[k] = OptaxSparseOptimizer(self.tx, dim, dtype)
        return self._cache[k]


def resolve_for(opt, var) -> SparseOptimizer:
    if isinstance(opt, _LazyOptax):
        return opt.resolve(var.dim, var.value_dtype)
    if isinstance(opt, SparseOptimizer):
        return opt
    return DynamicEmbeddingOptimizer(opt)


def create_slots(var, state: hashtable.TableState, opt) -> hashtable.TableState:
    """Ensure slot columns exist (reference ``create_slots``
    dynamic_embedding_optimizer.py:870-958)."""
    opt = resolve_for(opt, var)
    for name, fill in opt.slot_specs().items():
        state = hashtable.with_slot(state, name, fill)
    return state


def gather_slot_rows(var, state, ctx, opt) -> Dict[str, jax.Array]:
    """Slot rows for the looked-up keys; misses get the fresh fill value.

    Reuses the packed rows captured by the lookup's row-DMA when their
    width matches (i.e. the slots already existed then); otherwise one
    re-gather — this happens only on the first step after a new slot column
    appears. Never per-column XLA gathers (those stream the whole table)."""
    from recommenders_addons_tpu.ops import hashtable

    specs = opt.slot_specs()
    if not specs:
        return {}
    packed = ctx.packed
    n = ctx.slot.shape[0]
    if packed is not None and hashtable.packed_is_phys(state, n, packed):
        packed = hashtable.packed_logical_view(state, n, packed)
    if packed is None or packed.shape[1] != state.width:
        packed = hashtable.gather_packed(state, ctx.slot, ctx.found)
    d = state.dim
    out = {}
    for name, fill in specs.items():
        off = state.slot_offset(name)
        col = packed[:, off:off + d]
        out[name] = jnp.where(ctx.found[:, None], col,
                              jnp.asarray(fill, col.dtype))
    return out


def apply_gradients(
    var,
    state: hashtable.TableState,
    ctx,
    grads: jax.Array,
    opt,
    step: jax.Array | int = 0,
    epoch: jax.Array | int = 0,
    already_unique: bool = False,
    return_evicted: bool = False,
) -> hashtable.TableState:
    """Full sparse apply: dedup grads -> row-wise optimizer math -> one
    planned scatter of rows+slots+scores (reference apply sequence
    dynamic_embedding_optimizer.py:306-368, collapsed to three steps).

    ``grads`` is the cotangent of the ``emb`` output of ``embedding_lookup``
    (any shape ending in [dim]); duplicates are segment-summed onto unique
    rows. Pass ``already_unique=True`` if you pre-reduced to [U, dim].

    When the Pallas path is live (f32-container table, no bp_v2, plan
    captured at lookup), the optimizer math runs INSIDE the scatter kernel
    (pallas_ops.fused_update_scatter_refs): the updated packed rows are never
    materialized by XLA and the VPU math overlaps the DMA issue loop.

    ``return_evicted``: also return the rows displaced by bucket eviction
    (keys/values/scores/slots) so spill tiers can absorb them.
    """
    opt = resolve_for(opt, var)
    if not already_unique:
        if getattr(ctx, "deferred", False):
            # the lookup deferred duplicate handling (occurrence
            # contract): combine duplicate grads AND narrow the write
            # mask to one representative per row here, in one sorted MXU
            # pass — everything downstream consumes the patched ctx
            # unchanged (hashtable.sorted_combine_batch)
            import dataclasses as _dc

            grads, found_rep = var.reduce_gradient_deferred(ctx, grads)
            ctx = _dc.replace(ctx, found=found_rep)
        else:
            grads = var.reduce_gradient(ctx, grads)
    state = create_slots(var, state, opt)

    if _can_fuse(var, state, ctx, opt):
        # No EMPTY-padding grad zeroing here: padding rows are neither
        # found nor inserted, so the kernel DMAs their (garbage) update to
        # the trash row — one full [U, D] masking pass saved.
        evicted = (
            _capture_evicted(var, state, ctx) if return_evicted else None
        )
        new_state = _apply_fused(
            var, state, ctx, grads, opt, None, step, epoch
        )
        if return_evicted:
            return new_state, evicted
        return new_state

    # Guard padding rows (EMPTY keys): zero their grads so update math on
    # them is inert (the unfused writeback masks by the same plan, but
    # NaN/inf from garbage rows must not be fed to optimizer state math
    # that could flush them into adjacent slot columns via packed writes).
    valid = ctx.unique_keys != var.empty_key
    grads = jnp.where(valid[:, None], grads, 0.0)
    slot_rows = gather_slot_rows(var, state, ctx, opt)
    new_rows, new_slot_rows = opt.update(
        ctx.rows, grads.astype(ctx.rows.dtype), slot_rows, step
    )
    return var.writeback(
        state, ctx, new_rows, slot_rows=new_slot_rows, step=step,
        epoch=epoch, return_evicted=return_evicted,
    )


def _capture_evicted(var, state, ctx):
    """Rows about to be displaced by this apply's planned inserts (read
    from the pre-commit state).

    The victim rows are gathered FRESH from the table at ``ctx.slot`` where
    ``displaced`` — ``ctx.packed`` cannot be reused here: it was gathered
    with the found-only mask (inserted positions carry trash-row garbage)
    and ``plan_lookup_train`` overwrites ``packed[:, :dim]`` with the NEW
    key's init rows, so reusing it would spill the new key's values as the
    victim's."""
    d = var.dim
    old_keys = hashtable.join_key(
        hashtable.take_elem(state.key_lo, ctx.slot),
        hashtable.take_elem(state.key_hi, ctx.slot),
    ).astype(jnp.asarray(var.empty_key).dtype)
    displaced = ctx.inserted & (old_keys != var.empty_key)
    victim = hashtable.gather_packed(state, ctx.slot, displaced)
    # dropped keys (bucket exhausted this batch) keep their looked-up row
    # in the tier: the step's gradient is skipped but the key survives
    return {
        "keys": jnp.where(displaced, old_keys, var.empty_key),
        "values": jnp.where(displaced[:, None], victim[:, :d], 0),
        "scores": jnp.where(
            displaced, hashtable.take_elem(state.scores, ctx.slot), 0),
        "slots": {
            nm: jnp.where(
                displaced[:, None],
                victim[:, state.slot_offset(nm):
                       state.slot_offset(nm) + d],
                0,
            )
            for nm in state.slot_names
        },
        "dropped_keys": jnp.where(
            ctx.dropped, ctx.unique_keys, var.empty_key),
        "dropped_values": jnp.where(
            ctx.dropped[:, None], ctx.rows.astype(state.value_dtype), 0),
    }


def _can_fuse(var, state, ctx, opt) -> bool:
    import os

    from recommenders_addons_tpu.ops import pallas_ops

    if os.environ.get("TFRA_TPU_DISABLE_FUSED_APPLY") == "1":
        return False
    # named optimizers only: their update math is known Mosaic-lowerable;
    # arbitrary optax transforms (OptaxSparseOptimizer) may contain ops the
    # kernel compiler rejects, so they take the unfused path
    if not isinstance(opt, (SGD, Momentum, Adagrad, Adam, AdamW, RMSprop,
                            FTRL)):
        return False
    pf = hashtable._pack_factor(state.value_dtype)
    # f32 tables fuse directly; bf16 tables fuse through the
    # even/odd-plane integer unpack (see _fused_rows_pf2) when the dim is
    # even so every column block is word-aligned. f16 is EXCLUDED — its
    # bit layout is not an f32 prefix, so the same-width trick cannot
    # represent its values (Mosaic rejects real width-changing converts
    # via bitcast); f16 and int8 stay on the unfused path.
    container_ok = (
        (pf == 1 and state.rows.dtype == state.value_dtype)
        or (pf == 2 and var.dim % 2 == 0
            and state.value_dtype == jnp.bfloat16
            and state.rows.dtype == jnp.float32)
    )
    if (var.bp_v2 or ctx.inserted is None or not container_ok
            or not pallas_ops.use_pallas(state.rows)
            or not set(opt.slot_specs()) <= set(state.slot_names)
            or ctx.packed is None):
        return False
    # the packed block must cover the CURRENT width (slots existed at
    # lookup), in either the logical [N, W] or physical [N*ch, 128] layout
    n = ctx.slot.shape[0]
    return (ctx.packed.shape[1] == state.width
            or hashtable.packed_is_phys(state, n, ctx.packed))


def _apply_fused(var, state, ctx, grads, opt, slot_rows, step, epoch):
    """Optimizer math fused into the row-scatter kernel.

    The kernel reads its per-row operands as SEPARATE refs — the lookup's
    packed rows (whose value columns ARE the blended rows and whose slot
    columns are already reset for inserted rows, the ``plan_lookup_train``
    invariants — no separate rows ref, no found-mask ref) and the reduced
    grads. Nothing is concatenated or re-masked XLA-side (a [N, 256]
    concatenate alone lowered to ~7 full-array pad/maximum passes,
    ~10 ns/key at N=64Ki)."""
    del slot_rows  # slots are blended in-kernel from ctx.packed
    from recommenders_addons_tpu.ops import pallas_ops

    pf = hashtable._pack_factor(state.value_dtype)
    if pf == 2:
        blocks, tile_fn = _fused_rows_pf2(var, state, ctx, grads, opt)
    else:
        blocks, tile_fn = _fused_rows_pf1(var, state, ctx, grads, opt)

    plan = (ctx.slot, ctx.found, ctx.inserted, ctx.dropped)
    write = ctx.found | ctx.inserted
    idx = jnp.where(write, ctx.slot, state.capacity)
    new_rows_phys = pallas_ops.fused_update_scatter_refs(
        state.rows, state.chunks, idx, blocks, tile_fn,
        cap=state.capacity, step=jnp.asarray(step, jnp.float32),
    )
    ctx_scores = getattr(ctx, "scores", None)
    if ctx_scores is not None and ctx.key_lo is not None:
        # the lookup committed BOTH the inserted keys and this batch's
        # scores (its score scatter doubled as the dup probe) — the apply
        # issues ZERO element scatters; apply-time step is ignored for
        # scoring (embedding_lookup docstring)
        state = state.replace(key_lo=ctx.key_lo, key_hi=ctx.key_hi,
                              scores=ctx_scores)
    else:
        scores, mode = var.scores_for(ctx.unique_keys, step=step,
                                      epoch=epoch)
        if ctx.key_lo is not None:
            # the lookup already committed inserted keys to the planes it
            # carries (plan_lookup_train miss branch) — the steady-state
            # apply issues exactly ONE scatter (scores)
            state = hashtable.commit_scores(
                var.spec,
                state.replace(key_lo=ctx.key_lo, key_hi=ctx.key_hi),
                plan, scores, score_mode=mode,
            )
        else:
            state = hashtable.commit_keys_scores(
                var.spec, state, ctx.unique_keys, plan, scores=scores,
                score_mode=mode,
            )
    return state.replace(rows=new_rows_phys)


def _fused_rows_pf1(var, state, ctx, grads, opt):
    """Blocks + in-kernel tile function for f32-valued tables."""
    d = var.dim
    w = state.width
    names = tuple(state.slot_names)
    dt = ctx.rows.dtype
    # no separate rows ref: packed's value columns ARE the blended rows
    # (plan_lookup_train invariant, re-established by the sharded owner
    # path) — one [N, D] block stream + its XLA-side materialization saved.
    # No found-mask block either: inserted rows' slot columns are already
    # reset to fresh fills at lookup time (invariant (2),
    # hashtable.reset_inserted_slots), so the kernel reads them verbatim.
    # A PHYSICAL [N*ch, 128] packed block is merged to [N, W] here, just
    # before the kernel (measured: the in-kernel VREG merge stalls the
    # issue loop ~8 ns/key; the XLA relayout pass is ~2-3)
    n = ctx.slot.shape[0]
    packed = hashtable.packed_logical_view(state, n, ctx.packed)
    blocks = (packed, grads.astype(dt))

    def tile_fn(blks, step_scalar):
        packed, g = blks
        rows = packed[:, :d]
        slots = {}
        for i, nm in enumerate(names):
            off = d * (1 + i)
            slots[nm] = packed[:, off:off + d]
        # (1, 1)-shaped step: Mosaic lowers vector powf (Adam bias
        # correction) but rejects the scalar form
        step2d = jnp.full((1, 1), step_scalar, rows.dtype)
        new_rows, new_slots = opt.update(rows, g, slots, step2d)
        out = [new_rows.astype(rows.dtype)]
        out += [new_slots.get(nm, slots[nm]).astype(rows.dtype)
                for nm in names]
        full = jnp.concatenate(out, axis=1)
        if full.shape[1] < w:
            full = jnp.concatenate(
                [full,
                 jnp.zeros((full.shape[0], w - full.shape[1]),
                           rows.dtype)], axis=1)
        return full

    return blocks, tile_fn


def _fused_rows_pf2(var, state, ctx, grads, opt):
    """Blocks + tile function for BFLOAT16-valued tables (packed
    two-per-f32-word containers; bf16 only — an f16's bits are not an
    f32 prefix).

    Mosaic rejects bitwidth-changing bitcasts in kernels, so the 16-bit
    values are processed as two interleaved f32 PLANES with same-width
    integer ops: logical element 2i lives in the LOW 16 bits of container
    word i (plane value = ``bits << 16`` bitcast f32), element 2i+1 in the
    HIGH bits (``bits & 0xFFFF0000``). The optimizer math is elementwise,
    so the planes update independently in f32 (mixed precision: 16-bit
    inputs, f32 math, one round at the end); the repack rounds to nearest
    even exactly like XLA's convert (verified bit-exact on chip:
    ``(bits + 0x7FFF + ((bits >> 16) & 1)) >> 16``)."""
    d = var.dim
    half = d // 2
    w = state.width  # logical (16-bit) elements, e.g. 256
    wc = w // 2  # container f32 words per row == chunks * 128
    names = tuple(state.slot_names)

    n = ctx.slot.shape[0]
    if hashtable.packed_is_phys(state, n, ctx.packed):
        # the physical block IS the container-word layout: one f32
        # reshape, no bf16 bitcast relayout
        packed_c = ctx.packed.reshape(n, wc)
    else:
        packed_c = jax.lax.bitcast_convert_type(
            ctx.packed.reshape(-1, wc, 2), jnp.float32
        )  # [N, wc] container words holding (even, odd) 16-bit pairs
    g32 = grads.astype(jnp.float32)
    # no separate row-plane refs: the value planes are the first d/2
    # container words of ``packed_c`` (plan_lookup_train invariant), and a
    # bf16->f32 convert is exactly ``bits << 16`` — the in-kernel unpack
    # reproduces rows32[:, 0::2] / [:, 1::2] bit-for-bit without the two
    # XLA-side strided-slice relayouts they used to cost. No found-mask
    # block either: inserted rows' slot columns are reset at lookup time
    # (hashtable.reset_inserted_slots invariant).
    blocks = (packed_c, g32[:, 0::2], g32[:, 1::2])

    u32 = jnp.uint32

    def _rne16(x_f32):
        b = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
        return b + u32(0x7FFF) + ((b >> u32(16)) & u32(1))

    def tile_fn(blks, step_scalar):
        pc, g_ev, g_od = blks
        bits = jax.lax.bitcast_convert_type(pc, jnp.uint32)
        ev = jax.lax.bitcast_convert_type(bits << u32(16), jnp.float32)
        od = jax.lax.bitcast_convert_type(
            bits & u32(0xFFFF0000), jnp.float32)
        step2d = jnp.full((1, 1), step_scalar, jnp.float32)
        n_rows = pc.shape[0]

        def plane(plane_src, rp, gp):
            slots = {}
            for i, nm in enumerate(names):
                off = (d * (1 + i)) // 2
                slots[nm] = plane_src[:, off:off + half]
            new_rows, new_slots = opt.update(rp, gp, slots, step2d)
            parts = [new_rows.astype(jnp.float32)]
            parts += [new_slots.get(nm, slots[nm]).astype(jnp.float32)
                      for nm in names]
            full = jnp.concatenate(parts, axis=1)
            if full.shape[1] < wc:
                full = jnp.concatenate(
                    [full, jnp.zeros((n_rows, wc - full.shape[1]),
                                     jnp.float32)], axis=1)
            return full

        out_ev = plane(ev, ev[:, :half], g_ev)
        out_od = plane(od, od[:, :half], g_od)
        word = ((_rne16(out_od) & u32(0xFFFF0000))
                | (_rne16(out_ev) >> u32(16)))
        return jax.lax.bitcast_convert_type(word, jnp.float32)

    return blocks, tile_fn
