"""Mesh-sharded dynamic-embedding tables: all-to-all routed lookup/update.

TPU-native replacement for BOTH of the reference's sharding mechanisms:

  * intra-process ``Variable(devices=[...])`` sharding via
    TFRA>DynamicPartition / DynamicStitch custom ops
    (dynamic_embedding_variable.py:484-681, 933-986), and
  * inter-process ``HvdVariable`` / ``HvdAllToAllEmbedding``
    ``hvd.alltoall`` embedding parallelism
    (shadow_embedding_ops.py:397-447, keras/layers/embedding.py:545-594).

Design (SURVEY.md §7): ONE mesh axis serves both data- and embedding-
parallelism. Table state leaves get a leading shard axis [S, ...] with
``NamedSharding(P(axis))``. Inside ``shard_map``:

    1. dedup local ids; owner shard = high mixed bits of the key
    2. pack keys into fixed-capacity per-destination buckets
       (static shapes — the TPU replacement for dynamic_partition)
    3. ``jax.lax.all_to_all`` over ICI; owner probes its local bucket table
    4. rows ride the inverse ``all_to_all`` back; an inverse permutation
       (not dynamic_stitch) restores batch order
    5. backward: row-cotangents take the same route in reverse and the
       sparse optimizer applies owner-side — updates never leave the shard.

Routing capacity is static: ``K = ceil(capacity_factor * U / S)`` keys per
(src, dst) pair. With uniform key mixing, overflow probability is tiny;
overflowing keys gracefully degrade (they read their deterministic init row
and skip that step's update) and are counted in ``ctx.num_dropped`` so users
can raise the factor.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommenders_addons_tpu.ops import hashing, hashtable, initializers
from recommenders_addons_tpu.ops import optimizer as opt_lib
from recommenders_addons_tpu.ops.variable import LookupContext, Variable


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("send_pos", "routed", "num_dropped", "deduped", "octx"),
    meta_fields=("ids_shape",),
)
@dataclasses.dataclass
class ShardedLookupContext:
    """Per-device routing residuals + the OWNER-side lookup plan (leaves
    carry a leading shard axis in the global view; inside shard_map they are
    the local block).

    Carrying ``octx`` — the owner shard's full ``LookupContext`` over its
    received exchange buffer — is what makes the sharded apply as cheap as
    the single-table apply: the gradient step re-uses the probe, the dedup,
    the write plan, the packed row-DMA gather, AND the key/score planes
    committed at lookup time, instead of re-probing the table a second time
    (the round-3 design re-ran find + dup-probe + gather inside
    ``apply_gradients``, doubling the table work of every training step).
    """

    send_pos: jax.Array  # [N] per-occurrence position in the [S*K] buffer
    routed: jax.Array  # [N] bool: made it into the buffer
    num_dropped: jax.Array  # [] int32 overflowed keys (capacity_factor)
    # [] bool: the lookup took the dedup-retry route (hot-key overflow) —
    # occurrences of one key then SHARE a buffer slot, so the grad
    # route-back must scatter-ADD instead of set (_apply_local)
    deduped: jax.Array
    octx: LookupContext  # owner-side plan over the [S*K] recv buffer
    ids_shape: tuple


@dataclasses.dataclass(frozen=True, eq=False)
class ShardedVariable:
    """A ``de.Variable`` bound to one or more mesh axes.

    Parity role: ``Variable(devices=[...])`` + ``HvdAllToAllEmbedding``.

    ``axis`` may be a single axis name or a TUPLE of names (e.g.
    ``("dp", "ep")`` on a 2-D pod mesh): the table rows shard over the
    flattened product axis, and the all-to-all exchanges ride the mesh's
    physical topology so XLA can schedule them across both ICI dimensions
    — the "mixed dp x ep" configuration for pods where one axis saturates
    ICI. Dense model parameters are free to use the individual axes
    (psum over "dp", shard over "ep", ...) in the same jit.
    """

    var: Variable
    mesh: Mesh
    axis: Any = "ep"
    capacity_factor: float = 2.0

    def __post_init__(self):
        if isinstance(self.axis, (list, tuple)):
            object.__setattr__(self, "axis", tuple(self.axis))
        s = self.num_shards
        if self.var.num_shards != s:
            object.__setattr__(
                self, "var", dataclasses.replace(self.var, num_shards=s)
            )

    @property
    def axes(self) -> tuple:
        return self.axis if isinstance(self.axis, tuple) else (self.axis,)

    @property
    def num_shards(self) -> int:
        n = 1
        for a in self.axes:
            n *= self.mesh.shape[a]
        return n

    @property
    def spec(self):
        return self.var.spec

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init(self) -> hashtable.TableState:
        """Sharded state: every leaf [S, ...] with NamedSharding(P(axis))."""
        s = self.num_shards
        spec = self.spec

        def build():
            st = hashtable.create(spec)
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (s,) + x.shape), st
            )

        shape = jax.eval_shape(build)
        shardings = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P(self.axis)), shape
        )
        return jax.jit(build, out_shardings=shardings)()

    def create_slots(self, state, optimizer) -> hashtable.TableState:
        """Add missing optimizer slot columns, preserving sharding
        (reference ``create_slots``, dynamic_embedding_optimizer.py:870)."""
        opt = opt_lib.resolve_for(optimizer, self.var)
        return self.ensure_slot_columns(state, opt.slot_specs())

    def ensure_slot_columns(self, state, specs) -> hashtable.TableState:
        """Add missing slot columns by name -> fresh fill value."""
        missing = {
            k: v for k, v in specs.items() if k not in state.slot_names
        }
        if not missing:
            return state

        def build(st):
            for name, fill in missing.items():
                st = hashtable.with_slot(st, name, fill)
            return st

        out_shape = jax.eval_shape(build, state)
        shardings = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P(self.axis)), out_shape
        )
        return jax.jit(build, out_shardings=shardings)(state)

    def state_pspec(self, state=None):
        """PartitionSpec tree for the sharded state (for pjit in_shardings)."""
        template = state if state is not None else jax.eval_shape(self.init)
        return jax.tree.map(lambda _: P(self.axis), template)

    def _k_per_pair(self, num_unique: int, worst_case: bool = False) -> int:
        """Per-(src, dst) routing buffer capacity.

        ``worst_case=True`` sizes the buffer to the full unique count so NO
        key can overflow regardless of owner skew — required for bulk write
        ops (import/upsert/accum), where saved checkpoints are
        owner-partitioned and a whole chunk can route to ONE shard (silent
        drops there are data corruption, not graceful degradation)."""
        if worst_case:
            return max(8, _round_up(num_unique, 8))
        s = self.num_shards
        k = int(np.ceil(self.capacity_factor * num_unique / s))
        return max(8, _round_up(min(k, num_unique), 8))

    def _pad_axis0(self, x: jax.Array, fill) -> Tuple[jax.Array, int]:
        """Pad axis 0 to a multiple of the mesh axis (the reference accepts
        any batch size; shard_map requires divisibility). Returns
        ``(padded, original_len)``; pad entries are EMPTY keys / zero rows,
        which every table op ignores."""
        n = x.shape[0]
        s = self.num_shards
        n_pad = -(-n // s) * s
        if n_pad == n:
            return x, n
        block = jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, block]), n

    # ------------------------------------------------------------------
    # routing core (runs per device inside shard_map)
    # ------------------------------------------------------------------

    def _rank_in_owner(self, owner: jax.Array, valid: jax.Array) -> jax.Array:
        """Occurrence rank of each key within its destination-shard group.

        The routing analog of ``dynamic_partition``'s within-partition
        order. Sort-free for the small shard counts of real meshes: a
        [N, S] one-hot cumsum + a one-hot row select (no gather). Falls
        back to the sort-based ``_segment_rank`` above 64 shards, where
        the [N, S] block stops being cheap."""
        s = self.num_shards
        if s > 64:
            return hashtable._segment_rank(
                jnp.where(valid, owner, s), s
            )
        oh = owner[:, None] == jnp.arange(s, dtype=owner.dtype)[None, :]
        oh = jnp.where(valid[:, None], oh, False)
        csum = jnp.cumsum(oh.astype(jnp.int32), axis=0)
        return jnp.sum(jnp.where(oh, csum - 1, 0), axis=1,
                       dtype=jnp.int32)

    def _route(self, keys: jax.Array, k: int):
        """Plan the send buffer for ``keys`` (duplicates allowed — each
        occurrence gets its own slot; the owner side dedups).

        Returns ``(buf2 [S*K, 2] int32, send_pos, routed, num_dropped)``.
        The key buffer is ONE two-column int32 ROW scatter: an int64
        element scatter costs ~7.5 ms at N=64Ki in every bounds mode, two
        separate int32 plane scatters ~6.6 ns/key, but a batch-sized
        [N, 2] row scatter is ~free (tools/ab_route.py — the [C]-sized
        "never merge planes" rule does NOT apply to batch-sized buffers),
        and the joined buffer rides ONE all_to_all instead of two."""
        spec = self.spec
        s = self.num_shards
        owner = hashing.shard_of(keys, s)
        valid = keys != spec.empty_key
        rank = self._rank_in_owner(owner, valid)
        send_pos = owner * np.int32(k) + rank
        routed = valid & (rank < k)
        buf2 = self._key_buf2(keys, jnp.where(routed, send_pos, s * k), k)
        num_dropped = jnp.sum(valid & ~routed).astype(jnp.int32)
        return buf2, send_pos, routed, num_dropped

    def _key_buf2(self, keys: jax.Array, pos: jax.Array, k: int):
        """[S*K, 2] int32 (lo, hi) key buffer via one two-column row
        scatter (see :meth:`_route` for why this beats element planes)."""
        s = self.num_shards
        lo, hi = hashtable.split_key(keys.astype(jnp.int64))
        e = int(self.spec.empty_key) & ((1 << 64) - 1)  # host split_key
        empty_row = jnp.asarray(np.asarray(
            [e & 0xFFFFFFFF, e >> 32], np.uint32).view(np.int32))
        return jnp.broadcast_to(empty_row, (s * k, 2)).at[pos].set(
            jnp.stack([lo, hi], axis=-1), mode="drop")

    def _exchange_keys(self, buf2: jax.Array, k: int):
        """all_to_all the two-column key buffer and rejoin owner-side."""
        s = self.num_shards
        r = jax.lax.all_to_all(
            buf2.reshape(s, k, 2), self.axis, 0, 0).reshape(s * k, 2)
        return hashtable.join_key(r[:, 0], r[:, 1]).astype(
            self.var.key_dtype)

    def _init_fn(self):
        var = self.var
        return lambda u: initializers.materialize_rows(
            var.initializer, var._rng(), u, var.dim, var.value_dtype
        )

    def _lookup_local_train(self, st_l, ids, score_const=None):
        """Training lookup, per device. NO batch-side dedup/sort on the
        fast path: every occurrence routes (duplicates land in distinct
        buffer slots via their occurrence rank), and the OWNER side runs
        the single-table fast path ``plan_lookup_train`` over its received
        buffer — one probe, one dup-probe (merged with the LRU score
        scatter when ``score_const`` is given), one packed row-DMA, with
        the miss/insert planning and the per-key initializer all behind
        the all-hit cond. Duplicate keys only cost all-to-all bandwidth
        (D floats/occurrence), not table work.

        Hot-key guard (ADVICE r4 medium): a key repeated more than
        ~``capacity_factor * n / s`` times per device would overflow its
        owner's fixed-K buffer every step under per-occurrence routing —
        silently reading init rows and dropping its gradients. When ANY
        device overflows (psum'd, so all devices branch together), the
        routing retries through a batch-side dedup: each DISTINCT key
        routes once and its occurrences share that buffer slot (the
        forward gathers the shared row per occurrence; the grad
        route-back scatter-ADDS — ``ctx.deduped``), so overflow again
        depends only on hash skew of unique keys (round-3 semantics; a
        residual drop is still counted in ``ctx.num_dropped``). The
        steady state pays one scalar psum; the sort runs only on
        overflow steps.

        Parity: the production distributed lookup,
        shadow_embedding_ops.py:397-447 (hvd.alltoall embedding lookup).
        """
        var, spec = self.var, self.spec
        s = self.num_shards
        d = var.dim
        flat = ids.reshape(-1)
        n = flat.shape[0]
        k = self._k_per_pair(n)
        valid = flat != spec.empty_key
        if k >= n:
            # overflow structurally impossible (rank < n <= k): no psum,
            # no fallback cond — true whenever s <= capacity_factor
            # (notably the 1-device bench mesh)
            buf2, send_pos, routed, num_dropped = self._route(flat, k)
            deduped = jnp.asarray(False)
        else:
            owner = hashing.shard_of(flat, s)
            rank = self._rank_in_owner(owner, valid)
            routed0 = valid & (rank < k)
            num_dropped0 = jnp.sum(valid & ~routed0).astype(jnp.int32)
            total_dropped = jax.lax.psum(num_dropped0, self.axis)
            deduped = total_dropped > 0

            def fast(_):
                # real scatter work in BOTH branches: XLA's conditional
                # simplifier flattens a cond whose other branch is
                # identity and would run the dedup sort every step
                send_pos = owner * np.int32(k) + rank
                buf2 = self._key_buf2(
                    flat, jnp.where(routed0, send_pos, s * k), k)
                return buf2, send_pos, routed0, num_dropped0

            def dedup(_):
                uniq, inverse = hashtable.unique_static(flat)
                buf2, sp_u, r_u, _ = self._route(uniq, k)
                sp = sp_u[inverse]
                r = r_u[inverse] & valid
                nd = jnp.sum(valid & ~r).astype(jnp.int32)
                return buf2, sp, r, nd

            buf2, send_pos, routed, num_dropped = jax.lax.cond(
                deduped, dedup, fast, None)
        recv = self._exchange_keys(buf2, k)

        out = hashtable.plan_lookup_train(
            spec, st_l, recv, self._init_fn(), score_const=score_const)
        if score_const is not None:
            (u2, inv2, plan2, packed2, no_dups2, aligned2, new_lo, new_hi,
             new_scores) = out
        else:
            (u2, inv2, plan2, packed2, no_dups2, aligned2, new_lo,
             new_hi) = out
            new_scores = None
        slot2, found2, ins2, drop2 = plan2
        rows2 = hashtable.packed_value_rows(st_l, s * k, packed2)
        # rows for every recv position; the all-hit paths gather per
        # occurrence (rows_aligned), so only a dup-carrying miss exchange
        # pays the expansion gather
        owner_rows = jax.lax.cond(
            aligned2, lambda r: r, lambda r: r[inv2], rows2)
        back = jax.lax.all_to_all(
            owner_rows.reshape(s, k, d), self.axis, 0, 0
        ).reshape(s * k, d)

        taken = back[jnp.clip(send_pos, 0, s * k - 1)]
        valid = flat != spec.empty_key

        def no_fallback(t):
            return jnp.where(valid[:, None], t, 0)

        def with_fallback(t):
            # overflowed keys read their deterministic init row and skip
            # this step's update (graceful degradation, counted in
            # ctx.num_dropped) — the init materialization only runs when
            # something actually dropped
            fb = self._init_fn()(flat).astype(t.dtype)
            return jnp.where(valid[:, None],
                             jnp.where(routed[:, None], t, fb), 0)

        emb_rows = jax.lax.cond(
            num_dropped == 0, no_fallback, with_fallback, taken)
        emb = emb_rows.reshape(ids.shape + (d,))
        octx = LookupContext(
            unique_keys=u2,
            slot=slot2,
            found=found2,
            rows=rows2,
            inverse=inv2,
            packed=packed2,
            inserted=ins2,
            dropped=drop2,
            no_dups=no_dups2,
            rows_aligned=aligned2,
            key_lo=new_lo,
            key_hi=new_hi,
            scores=new_scores,
            ids_shape=(s * k,),
        )
        ctx = ShardedLookupContext(
            send_pos=send_pos,
            routed=routed,
            num_dropped=num_dropped,
            deduped=deduped,
            octx=octx,
            ids_shape=tuple(ids.shape),
        )
        return emb, ctx

    def _lookup_local_infer(self, st_l, ids):
        """Inference lookup, per device: missing -> static default, no
        state change, EXACT for any owner skew.

        Round-3 sized the exchange buffer worst-case (K = N) on every
        inference call — S/capacity_factor times the row traffic actually
        needed. Now the fast ``capacity_factor`` buffer runs first and the
        worst-case exchange only executes behind a cond when some device
        actually overflowed (psum'd, so all devices branch together)."""
        var, spec = self.var, self.spec
        s = self.num_shards
        d = var.dim
        flat = ids.reshape(-1)
        n = flat.shape[0]
        valid = flat != spec.empty_key
        default = initializers.default_value_of(
            var.initializer, d, var.value_dtype)

        def exchange(k: int):
            buf2, send_pos, routed, num_dropped = self._route(
                flat, k)
            recv = self._exchange_keys(buf2, k)
            slot, found = hashtable.find(spec, st_l, recv)
            owner_rows = hashtable.gather(spec, st_l, slot, found, default)
            back = jax.lax.all_to_all(
                owner_rows.reshape(s, k, d), self.axis, 0, 0
            ).reshape(s * k, d)
            taken = back[jnp.clip(send_pos, 0, s * k - 1)]
            rows = jnp.where(routed[:, None], taken, default[None, :])
            rows = jnp.where(valid[:, None], rows, 0)
            return rows, num_dropped

        k_fast = self._k_per_pair(n)
        rows, num_dropped = exchange(k_fast)
        if k_fast >= n:  # buffer already fits the whole block: exact
            return rows.reshape(ids.shape + (d,))
        total_dropped = jax.lax.psum(num_dropped, self.axis)
        rows = jax.lax.cond(
            total_dropped == 0,
            lambda _: rows,
            lambda _: exchange(n)[0],
            None,
        )
        return rows.reshape(ids.shape + (d,))

    # ------------------------------------------------------------------
    # public ops (call from inside your jitted step; shard_map inside)
    # ------------------------------------------------------------------

    def _smap(self, fn, in_specs, out_specs):
        return shard_map(
            fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )

    def embedding_lookup(
        self, state: hashtable.TableState, ids: jax.Array,
        *, step=None, epoch=None,
    ) -> Tuple[jax.Array, ShardedLookupContext]:
        """Trainable sharded lookup. ``ids`` is batch-sharded over the mesh
        axis (global view; any batch size — non-divisible batches are padded
        with EMPTY and the pad rows sliced back off); returns batch-sharded
        ``emb`` + routing ctx.

        ``step`` (and ``epoch`` for EPOCHLRU): as for
        ``Variable.embedding_lookup`` — pass the training step HERE for
        LRU-family strategies and each owner shard commits the batch's
        scores at lookup time, where the score scatter doubles as the
        duplicate probe; the sharded apply then issues ZERO element
        scatters in the steady state."""
        sp = self.state_pspec(state)
        ids = jnp.asarray(ids, self.var.key_dtype)
        ids, n0 = self._pad_axis0(ids, self.spec.empty_key)
        var = self.var

        score_const = var.lookup_score_const(step, epoch)
        scored = score_const is not None

        def fn(st, ids_blk, *sc):
            st_l = jax.tree.map(lambda x: x[0], st)
            emb, ctx = self._lookup_local_train(
                st_l, ids_blk, score_const=sc[0] if sc else None)
            # keep a leading axis on ctx leaves for the global view
            ctx = jax.tree.map(lambda x: x[None], ctx)
            return emb, ctx

        s = self.num_shards
        local_ids_shape = (ids.shape[0] // s,) + tuple(ids.shape[1:])
        n_local = int(np.prod(local_ids_shape))
        k = self._k_per_pair(n_local)
        ctx_spec = _ctx_spec(self.axis, local_ids_shape, s * k, scored)
        in_specs = (sp, P(self.axis)) + ((P(),) if scored else ())
        args = (state, ids) + ((score_const,) if scored else ())
        emb, ctx = self._smap(
            fn,
            in_specs=in_specs,
            out_specs=(P(self.axis), ctx_spec),
        )(*args)
        return emb[:n0], ctx

    def lookup(self, state: hashtable.TableState, ids: jax.Array):
        """Inference lookup (missing -> static default, no state change).
        Reference ``Variable.lookup`` across devices
        (dynamic_embedding_variable.py:933-986). Any batch size; exact for
        any owner skew (worst-case re-exchange behind a cond)."""
        sp = self.state_pspec(state)
        ids = jnp.asarray(ids, self.var.key_dtype)
        ids, n0 = self._pad_axis0(ids, self.spec.empty_key)

        def fn(st, ids_blk):
            st_l = jax.tree.map(lambda x: x[0], st)
            return self._lookup_local_infer(st_l, ids_blk)

        emb = self._smap(
            fn, in_specs=(sp, P(self.axis)), out_specs=P(self.axis)
        )(state, ids)
        return emb[:n0]

    def apply_gradients(
        self,
        state: hashtable.TableState,
        ctx: ShardedLookupContext,
        emb_grad: jax.Array,
        optimizer,
        step: jax.Array | int = 0,
        epoch: jax.Array | int = 0,
        return_evicted: bool = False,
    ) -> hashtable.TableState:
        """Route row-cotangents back to their owner shard and apply the
        sparse optimizer locally (the reference's half-sync sparse path made
        race-free: every row has exactly one owner — SURVEY.md §2.3).

        The owner-side plan (probe, dedup, write plan, packed row gather,
        committed key/score planes) rides in ``ctx.octx`` from the lookup —
        this step does NO table probing of its own: grads scatter into the
        recorded buffer positions, ride the all-to-all, segment-sum onto
        the owner's unique rows (skipped entirely for dup-free exchanges),
        and feed the same fused update-scatter kernel as the single-table
        apply. ``return_evicted``: also return rows displaced by bucket
        eviction ([S, ...] blocks; spill tiers flatten and absorb them)."""
        var = self.var
        opt = opt_lib.resolve_for(optimizer, var)
        s = self.num_shards
        # grads arrive w.r.t. the UNpadded emb; re-pad with zero rows so the
        # block layout matches the ctx captured at lookup time
        emb_grad, _ = self._pad_axis0(jnp.asarray(emb_grad), 0)
        # slot columns must exist BEFORE shard_map so in/out pytrees match
        state = self.create_slots(state, opt)
        sp = self.state_pspec(state)
        ctx_spec = jax.tree.map(lambda _: P(self.axis), ctx)

        def fn(st, ctx_blk, g_blk, step_arr, epoch_arr):
            ctx_l = jax.tree.map(lambda x: x[0], ctx_blk)
            st_l = jax.tree.map(lambda x: x[0], st)
            g = g_blk.reshape(-1, var.dim)
            out = self._apply_local(
                st_l, ctx_l, g, opt, step_arr, epoch_arr, return_evicted)
            if return_evicted:
                new_st, ev = out
                return (jax.tree.map(lambda x: x[None], new_st),
                        jax.tree.map(lambda x: x[None], ev))
            return jax.tree.map(lambda x: x[None], out)

        args = (
            state,
            ctx,
            emb_grad,
            jnp.asarray(step, jnp.int32),
            jnp.asarray(epoch, jnp.int32),
        )
        in_specs = (sp, ctx_spec, P(self.axis), P(), P())
        if return_evicted:
            ev_spec = {
                "keys": P(self.axis), "values": P(self.axis),
                "scores": P(self.axis),
                "slots": {n: P(self.axis) for n in state.slot_names},
                "dropped_keys": P(self.axis),
                "dropped_values": P(self.axis),
            }
            return self._smap(
                fn, in_specs=in_specs, out_specs=(sp, ev_spec)
            )(*args)
        return self._smap(fn, in_specs=in_specs, out_specs=sp)(*args)

    def _apply_local(self, st_l, ctx_l, g, opt, step_arr, epoch_arr,
                     return_evicted):
        """Per-device apply body (inside shard_map): route per-occurrence
        grads to their owners along the recorded positions, segment-sum
        cross-source duplicates, run the owner-side optimizer."""
        var = self.var
        s = self.num_shards
        d = var.dim
        octx = ctx_l.octx
        n_pairs = octx.unique_keys.shape[0]  # S*K
        k = n_pairs // s
        # per-occurrence grads route along the recorded positions. Fast
        # route: slots are distinct by construction, so instead of an
        # [N, D] row SCATTER (~5.6 ns/key, tools/ab_route.py) the route
        # inverts to scatter-iota + row GATHER (~0.8): one int32 element
        # scatter records which occurrence feeds each buffer slot, then
        # the rows move with a gather (the where fuses). Dedup-retry
        # route (ctx.deduped — hot-key overflow): occurrences share
        # their representative's slot, so grads must scatter-ADD (both
        # branches do real scatter work — no identity branch for XLA's
        # conditional simplifier to flatten). Dropped keys skip the step
        # either way.
        n_occ = g.shape[0]
        gpos = jnp.where(ctx_l.routed, ctx_l.send_pos, n_pairs)

        def fast_route(gg):
            src = jnp.full((n_pairs,), n_occ, jnp.int32).at[gpos].set(
                jnp.arange(n_occ, dtype=jnp.int32), mode="drop")
            taken = gg[jnp.minimum(src, n_occ - 1)]
            return jnp.where((src < n_occ)[:, None], taken, 0)

        def dedup_route(gg):
            return jnp.zeros((n_pairs, d), gg.dtype).at[gpos].add(
                gg, mode="drop")

        if n_pairs // s >= n_occ:
            gbuf = fast_route(g)  # k >= n: the dedup retry cannot engage
        else:
            gbuf = jax.lax.cond(ctx_l.deduped, dedup_route, fast_route, g)
        grecv = jax.lax.all_to_all(
            gbuf.reshape(s, k, d), self.axis, 0, 0
        ).reshape(n_pairs, d)
        # cross-source duplicates sum onto their representative row via
        # the MXU chunk combine (hashtable.segment_sum_rows — XLA's
        # scatter-add serializes on hot-key targets); dup-free exchanges
        # (the steady state) skip it entirely
        g2 = jax.lax.cond(
            octx.no_dups,
            lambda gr: gr,
            lambda gr: hashtable.segment_sum_rows(
                gr, octx.inverse, n_pairs),
            grecv,
        )
        return opt_lib.apply_gradients(
            var, st_l, octx, g2, opt, step=step_arr, epoch=epoch_arr,
            already_unique=True, return_evicted=return_evicted,
        )

    def train_step(
        self,
        state: hashtable.TableState,
        ids: jax.Array,
        emb_grad_fn,
        optimizer,
        *,
        step: jax.Array | int = 0,
        epoch: jax.Array | int = 0,
        aux_spec=None,
    ):
        """Fused routed lookup + gradient + apply in ONE ``shard_map``.

        For train steps whose embedding cotangent is computable per
        device — sparse-dominant production steps closing over
        REPLICATED dense parameters, the reference's half-sync regime
        (SURVEY.md §2.3; the role of ``HvdAllToAllEmbedding`` wrapping
        lookup+update in one layer, keras/layers/embedding.py:545-594).

        MEASURED NEUTRAL at the bench shape (tools/ab_sharded.py:
        sharded two-call 72.0 ns/key, fused 72.4 on a 1-device mesh):
        XLA fuses across shard_map boundaries within one jit, so the
        routing ctx never materializes in HBM either way. This exists as
        the convenient one-call form, not as a fast path; numerics are
        pinned identical to the two-call API
        (test_fused_train_step_matches_two_call_api).

        ``emb_grad_fn(emb_local) -> (g_emb_local, aux)`` runs on each
        device's batch shard (``emb_local`` is the local block of the
        padded batch, rows for EMPTY padding are zeros and their grads
        are ignored). ``aux`` is returned as-is per device: pass
        ``aux_spec`` (a PartitionSpec pytree matching aux, e.g.
        ``P(self.axis)`` for per-shard metrics with a leading axis) or
        leave None and return ``()``.

        ``step``: as for :meth:`embedding_lookup` — LRU-family scores
        commit at lookup time inside the same body.
        """
        var = self.var
        opt = opt_lib.resolve_for(optimizer, var)
        sp_ids = jnp.asarray(ids, var.key_dtype)
        sp_ids, n0 = self._pad_axis0(sp_ids, self.spec.empty_key)
        if n0 != sp_ids.shape[0]:
            raise ValueError(
                "train_step requires a mesh-divisible batch (grads for "
                "sliced-off padding rows cannot be recovered); pad ids "
                f"to a multiple of {self.num_shards} yourself: "
                f"{n0} vs {sp_ids.shape[0]}"
            )
        state = self.create_slots(state, opt)
        sp = self.state_pspec(state)

        score_const = var.lookup_score_const(step, epoch)
        scored = score_const is not None

        def fn(st, ids_blk, step_arr, epoch_arr, *sc):
            st_l = jax.tree.map(lambda x: x[0], st)
            emb, ctx_l = self._lookup_local_train(
                st_l, ids_blk, score_const=sc[0] if sc else None)
            g, aux = emb_grad_fn(emb)
            new_st = self._apply_local(
                st_l, ctx_l, g.reshape(-1, var.dim), opt, step_arr,
                epoch_arr, False)
            return jax.tree.map(lambda x: x[None], new_st), aux

        args = (state, sp_ids, jnp.asarray(step, jnp.int32),
                jnp.asarray(epoch, jnp.int32))
        in_specs = (sp, P(self.axis), P(), P())
        if scored:
            args = args + (score_const,)
            in_specs = in_specs + (P(),)
        out_specs = (sp, aux_spec if aux_spec is not None else P())
        new_state, aux = self._smap(
            fn, in_specs=in_specs, out_specs=out_specs)(*args)
        return new_state, aux

    # ------------------------------------------------------------------
    # table-wide ops
    # ------------------------------------------------------------------

    def size(self, state) -> jax.Array:
        spec = self.spec

        def fn(st):
            st_l = jax.tree.map(lambda x: x[0], st)
            return hashtable.size(spec, st_l)[None]

        per_shard = self._smap(
            fn, in_specs=(self.state_pspec(state),), out_specs=P(self.axis)
        )(state)
        return per_shard.sum()

    def _per_shard(self, state, fn):
        """Apply a local state->state op independently on every shard."""
        sp = self.state_pspec(state)

        def wrapped(st):
            st_l = jax.tree.map(lambda x: x[0], st)
            return jax.tree.map(lambda x: x[None], fn(st_l))

        return self._smap(wrapped, in_specs=(sp,), out_specs=sp)(state)

    def remove(self, state, keys) -> hashtable.TableState:
        """Delete keys wherever they live (each shard removes its subset —
        misses are no-ops, so no routing is needed). Reference
        ``Variable.remove`` across devices."""
        var = self.var
        keys = jnp.asarray(keys, var.key_dtype).reshape(-1)
        sp = self.state_pspec(state)

        def fn(st, k):
            st_l = jax.tree.map(lambda x: x[0], st)
            new = hashtable.remove(var.spec, st_l, k)
            return jax.tree.map(lambda x: x[None], new)

        # broadcast the full key list to every shard
        return self._smap(fn, in_specs=(sp, P()), out_specs=sp)(state, keys)

    def clear(self, state) -> hashtable.TableState:
        return self._per_shard(
            state, lambda st: hashtable.clear(self.var.spec, st)
        )

    def evict_lowest(self, state, num_evict_per_shard: int):
        """Per-shard min-score eviction (global top-k across shards would
        need a gather; per-shard quota matches the reference's per-shard
        restriction, restrict_policies.py:181-229)."""
        return self._per_shard(
            state,
            lambda st: hashtable.evict_lowest(
                self.var.spec, st, num_evict_per_shard
            ),
        )

    def apply_restriction(self, state, num_reserved: int,
                          trigger: Optional[int] = None):
        """Cap every shard to num_reserved/S live keys (policy from
        ``var.restrict_policy`` or timestamp by default)."""
        s = self.num_shards
        per_shard = max(num_reserved // s, 1)
        per_trigger = None if trigger is None else max(trigger // s, 1)
        var = self.var

        def fn(st):
            return var.restrict(st, per_shard, per_trigger)

        return self._per_shard(state, fn)

    def export(self, state):
        """Global dump: (keys [S, C], values [S, C, D], mask [S, C]) —
        host-side compaction as with the single-shard export."""
        return state.keys, state.values, hashtable.occupancy_mask(
            self.spec, state
        )

    def export_keys_and_scores(self, state):
        return state.keys, state.scores, hashtable.occupancy_mask(
            self.spec, state
        )

    def upsert(self, state, keys, values, step=0, epoch=0,
               return_evicted: bool = False):
        """Bulk insert routed by owner (warm-start / restore path).
        Any batch size; duplicate keys keep the last occurrence.
        ``return_evicted`` also returns rows displaced by bucket eviction
        (flattened across shards) so a spill tier can absorb them."""
        var = self.var
        s = self.num_shards
        sp = self.state_pspec(state)
        keys = jnp.asarray(keys, var.key_dtype).reshape(-1)
        values = jnp.asarray(values, var.value_dtype).reshape(-1, var.dim)
        keys, _ = self._pad_axis0(keys, self.spec.empty_key)
        values, _ = self._pad_axis0(values, 0)

        def fn(st, keys_blk, vals_blk):
            st_l = jax.tree.map(lambda x: x[0], st)
            flat = keys_blk.reshape(-1)
            uniq, (uvals,) = hashtable.dedup_last(
                flat, (vals_blk.reshape(-1, var.dim),)
            )
            k = self._k_per_pair(uniq.shape[0], worst_case=True)
            buf2, send_pos, routed, _ = self._route(uniq, k)
            vbuf = jnp.zeros((s * k, var.dim), var.value_dtype)
            vbuf = vbuf.at[
                jnp.where(routed, send_pos, s * k)
            ].set(uvals, mode="drop")
            rkeys = self._exchange_keys(buf2, k)
            rvals = jax.lax.all_to_all(
                vbuf.reshape(s, k, var.dim), self.axis, 0, 0
            ).reshape(s * k, var.dim)
            u2, (v2,) = hashtable.dedup_last(rkeys, (rvals,))
            scores, mode = var.scores_for(u2, step=step, epoch=epoch)
            out = hashtable.commit(
                var.spec, st_l, u2, values=v2, scores=scores,
                score_mode=mode, return_evicted=return_evicted,
            )
            if return_evicted:
                new, ev = out
                return (jax.tree.map(lambda x: x[None], new),
                        jax.tree.map(lambda x: x[None], ev))
            return jax.tree.map(lambda x: x[None], out)

        if return_evicted:
            ev_spec = {
                "keys": P(self.axis), "values": P(self.axis),
                "scores": P(self.axis),
                "slots": {n: P(self.axis) for n in state.slot_names},
                "dropped_keys": P(self.axis),
                "dropped_values": P(self.axis),
            }
            return self._smap(
                fn, in_specs=(sp, P(self.axis), P(self.axis)),
                out_specs=(sp, ev_spec),
            )(state, keys, values)
        return self._smap(
            fn, in_specs=(sp, P(self.axis), P(self.axis)), out_specs=sp
        )(state, keys, values)

    def accum(self, state, keys, old_values, new_values, exists=None,
              step=0, epoch=0):
        """bp_v2 delta write routed by owner (reference ``Variable.accum``
        across devices, dynamic_embedding_variable.py:806-855): existing
        rows receive (new - old); missing keys insert ``new``.

        Duplicate keys are deterministic: deltas SUM per key (the reference's
        sequential insert_or_accum, cuckoohash_map.hh:756-765); the inserted
        value for a missing key is the last occurrence's ``new``. When
        ``exists`` is given it is the consistency guard captured at lookup
        time: a key is only written if its current presence in the table
        still matches (stale writes are dropped, cuckoohash_map.hh:620-632).
        """
        var = self.var
        s = self.num_shards
        sp = self.state_pspec(state)
        keys = jnp.asarray(keys, var.key_dtype).reshape(-1)
        old_values = jnp.asarray(old_values, var.value_dtype).reshape(
            -1, var.dim)
        new_values = jnp.asarray(new_values, var.value_dtype).reshape(
            -1, var.dim)
        has_exists = exists is not None
        if has_exists:
            exists = jnp.asarray(exists).reshape(-1).astype(jnp.int32)
        else:
            exists = jnp.zeros(keys.shape, jnp.int32)
        keys, _ = self._pad_axis0(keys, self.spec.empty_key)
        old_values, _ = self._pad_axis0(old_values, 0)
        new_values, _ = self._pad_axis0(new_values, 0)
        exists, _ = self._pad_axis0(exists, 0)

        def fn(st, keys_blk, old_blk, new_blk, ex_blk, step_arr, epoch_arr):
            st_l = jax.tree.map(lambda x: x[0], st)
            flat = keys_blk.reshape(-1)
            d = var.dim
            deltas = (new_blk - old_blk).reshape(-1, d)
            uniq, (udelta,) = hashtable.dedup_sum(flat, (deltas,))
            _, (unew, uex) = hashtable.dedup_last(
                flat, (new_blk.reshape(-1, d), ex_blk.reshape(-1))
            )
            k = self._k_per_pair(uniq.shape[0], worst_case=True)
            buf2, send_pos, routed, _ = self._route(uniq, k)
            pos = jnp.where(routed, send_pos, s * k)

            def send(payload):
                shape = (s * k,) + payload.shape[1:]
                b = jnp.zeros(shape, payload.dtype).at[pos].set(
                    payload, mode="drop")
                return jax.lax.all_to_all(
                    b.reshape((s, k) + payload.shape[1:]), self.axis, 0, 0
                ).reshape(shape)

            rkeys = self._exchange_keys(buf2, k)
            rdelta = send(udelta)
            rnew = send(unew)
            rex = send(uex)
            u2, (d2,) = hashtable.dedup_sum(rkeys, (rdelta,))
            _, (n2, e2) = hashtable.dedup_last(rkeys, (rnew, rex))
            if has_exists:
                _, found2 = hashtable.find(var.spec, st_l, u2)
                u2 = jnp.where(
                    found2 == (e2 != 0), u2, var.spec.empty_key
                )
            scores, mode = var.scores_for(u2, step=step_arr,
                                          epoch=epoch_arr)
            new = hashtable.accum(
                var.spec, st_l, u2, deltas=d2, values_for_new=n2,
                scores=scores, score_mode=mode,
            )
            return jax.tree.map(lambda x: x[None], new)

        return self._smap(
            fn,
            in_specs=(sp, P(self.axis), P(self.axis), P(self.axis),
                      P(self.axis), P(), P()),
            out_specs=sp,
        )(state, keys, old_values, new_values, exists,
          jnp.asarray(step, jnp.int32), jnp.asarray(epoch, jnp.int32))

    def import_batch(self, state, keys, values, scores=None, slot_rows=None):
        """Bulk restore routed by owner, carrying scores and optimizer slot
        rows along the same all-to-all (the sharded checkpoint-load path;
        reference elastic re-shard load dynamic_embedding_variable.py:360-450).
        ``keys`` may contain EMPTY padding; duplicates keep the last value.
        All inputs are batch-sharded over the mesh axis."""
        var = self.var
        s = self.num_shards
        sp = self.state_pspec(state)
        slot_names = tuple(sorted((slot_rows or {}).keys()))
        sdt = var.spec.score_dtype

        def fn(st, keys_blk, vals_blk, scores_blk, *slot_blks):
            st_l = jax.tree.map(lambda x: x[0], st)
            flat = keys_blk.reshape(-1)
            d = var.dim
            uniq, picked = hashtable.dedup_last(
                flat,
                (vals_blk.reshape(-1, d), scores_blk.reshape(-1))
                + tuple(b.reshape(-1, d) for b in slot_blks),
            )
            u = uniq.shape[0]
            uvals, uscores = picked[0], picked[1]
            uslots = list(picked[2:])

            k = self._k_per_pair(u, worst_case=True)
            buf2, send_pos, routed, _ = self._route(uniq, k)
            pos = jnp.where(routed, send_pos, s * k)

            def send(payload, width=None):
                shape = (s * k,) if width is None else (s * k, width)
                b = jnp.zeros(shape, payload.dtype).at[pos].set(
                    payload, mode="drop"
                )
                blk = b.reshape((s, k) if width is None else (s, k, width))
                return jax.lax.all_to_all(blk, self.axis, 0, 0).reshape(shape)

            rkeys = self._exchange_keys(buf2, k)
            rvals = send(uvals, d)
            rscores = send(uscores)
            rslots = {
                name: send(col, d)
                for name, col in zip(slot_names, uslots)
            }
            u2, picked2 = hashtable.dedup_last(
                rkeys, (rvals, rscores) + tuple(rslots.values())
            )
            v2, s2 = picked2[0], picked2[1]
            sl2 = dict(zip(rslots.keys(), picked2[2:]))
            new = hashtable.commit(
                var.spec, st_l, u2, values=v2,
                slot_rows=sl2 or None, scores=s2, score_mode="assign",
            )
            return jax.tree.map(lambda x: x[None], new)

        keys = jnp.asarray(keys, var.key_dtype).reshape(-1)
        values = jnp.asarray(values, var.value_dtype).reshape(-1, var.dim)
        if scores is None:
            scores = jnp.ones((keys.shape[0],), sdt)
        scores = jnp.asarray(scores, sdt).reshape(-1)
        slot_args = [
            jnp.asarray(slot_rows[n], var.value_dtype).reshape(-1, var.dim)
            for n in slot_names
        ]
        keys, _ = self._pad_axis0(keys, self.spec.empty_key)
        values, _ = self._pad_axis0(values, 0)
        scores, _ = self._pad_axis0(scores, 0)
        slot_args = [self._pad_axis0(a, 0)[0] for a in slot_args]
        in_specs = (sp,) + (P(self.axis),) * (3 + len(slot_args))
        return self._smap(fn, in_specs=in_specs, out_specs=sp)(
            state, keys, values, scores, *slot_args
        )

    def contains(self, state, ids) -> jax.Array:
        """Residency mask: True where the key is in the HBM table (routed
        probe, exact for any owner skew — the spill tier uses it to decide
        promotions; reference find_with_exists across shards)."""
        var = self.var
        s = self.num_shards
        sp = self.state_pspec(state)
        ids = jnp.asarray(ids, var.key_dtype).reshape(-1)
        ids_p, n0 = self._pad_axis0(ids, self.spec.empty_key)

        def fn(st, ids_blk):
            st_l = jax.tree.map(lambda x: x[0], st)
            flat = ids_blk.reshape(-1)
            uniq, inverse = hashtable.unique_static(flat)
            k = self._k_per_pair(uniq.shape[0], worst_case=True)
            buf2, send_pos, routed, _ = self._route(uniq, k)
            recv = self._exchange_keys(buf2, k)
            _, found = hashtable.find(self.spec, st_l, recv)
            back = jax.lax.all_to_all(
                found.astype(jnp.int32).reshape(s, k), self.axis, 0, 0
            ).reshape(s * k)
            got = back[jnp.clip(send_pos, 0, s * k - 1)] != 0
            got = got & routed & (uniq != self.spec.empty_key)
            return got[inverse]

        out = self._smap(
            fn, in_specs=(sp, P(self.axis)), out_specs=P(self.axis)
        )(state, ids_p)
        return out[:n0]

    def import_host_arrays(self, state, keys, values, scores=None,
                           slot_rows=None,
                           buffer_size: int = 4 * 1024 * 1024,
                           return_evicted: bool = False):
        """Bulk restore from HOST numpy arrays: partition by owner with
        ``hashing.shard_of_np`` and commit shard-locally (``import_local``)
        in ``buffer_size``-bounded chunks. The exact-restore path used by
        the checkpoint loader and the spill tier's promote.
        ``return_evicted``: also return a LIST of evicted dicts (one per
        chunk) so spill tiers can absorb displaced/dropped rows."""
        var = self.var
        s = self.num_shards
        keys = np.asarray(keys).reshape(-1).astype(np.dtype(var.key_dtype))
        values = np.asarray(values).reshape(-1, var.dim)
        sdt = np.dtype(var.spec.score_dtype)
        scores = (np.asarray(scores).reshape(-1).astype(sdt)
                  if scores is not None
                  else np.ones((len(keys),), sdt))
        slots = {n: np.asarray(c).reshape(-1, var.dim)
                 for n, c in (slot_rows or {}).items()}
        if len(keys) == 0:
            return (state, []) if return_evicted else state
        owner = hashing.shard_of_np(keys, s)
        order = np.argsort(owner, kind="stable")
        keys, values, scores = keys[order], values[order], scores[order]
        slots = {n: c[order] for n, c in slots.items()}
        counts = np.bincount(owner, minlength=s)
        starts = np.zeros(s + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        max_per_shard = int(counts.max())
        empty = var.spec.empty_key
        evs = []
        m_chunk = max(1, min(buffer_size // s, max_per_shard))
        vdt = np.dtype(var.value_dtype)
        d = var.dim
        for off in range(0, max_per_shard, m_chunk):
            m = min(m_chunk, max_per_shard - off)
            k_blk = np.full((s, m), empty, keys.dtype)
            v_blk = np.zeros((s, m, d), vdt)
            s_blk = np.zeros((s, m), sdt)
            sl_blk = {n: np.zeros((s, m, d), vdt) for n in slots}
            for sh in range(s):
                lo = int(starts[sh]) + off
                hi = min(int(starts[sh + 1]), lo + m)
                if hi <= lo:
                    continue
                w = hi - lo
                k_blk[sh, :w] = keys[lo:hi]
                v_blk[sh, :w] = values[lo:hi]
                s_blk[sh, :w] = scores[lo:hi]
                for n, c in slots.items():
                    sl_blk[n][sh, :w] = c[lo:hi]
            out = self.import_local(
                state, k_blk, v_blk, scores=s_blk,
                slot_rows=sl_blk or None, return_evicted=return_evicted,
            )
            if return_evicted:
                state, ev = out
                evs.append(ev)
            else:
                state = out
        if return_evicted:
            return state, evs
        return state

    def import_local(self, state, keys, values, scores=None, slot_rows=None,
                     return_evicted: bool = False):
        """Bulk restore with NO routing: inputs are pre-partitioned by owner.

        ``keys`` is [S, M] (``values`` [S, M, D], etc.) where every non-EMPTY
        key in row ``s`` satisfies ``hashing.shard_of(key, S) == s`` — the
        checkpoint loader partitions host-side with ``hashing.shard_of_np``.
        Each shard commits its block directly, so no fixed-capacity exchange
        buffer exists to overflow (the restore-correctness path; reference
        per-shard direct load, dynamic_embedding_variable.py:360-450).
        Duplicate keys within a shard keep the last occurrence.
        ``return_evicted``: also return displaced-resident + dropped-input
        rows so spill tiers can keep them.
        """
        var = self.var
        s = self.num_shards
        sp = self.state_pspec(state)
        slot_names = tuple(sorted((slot_rows or {}).keys()))
        sdt = var.spec.score_dtype

        keys = jnp.asarray(keys, var.key_dtype).reshape(s, -1)
        m = keys.shape[1]
        values = jnp.asarray(values, var.value_dtype).reshape(s, m, var.dim)
        if scores is None:
            scores = jnp.ones((s, m), sdt)
        scores = jnp.asarray(scores, sdt).reshape(s, m)
        slot_args = [
            jnp.asarray(slot_rows[n], var.value_dtype).reshape(s, m, var.dim)
            for n in slot_names
        ]

        def fn(st, keys_blk, vals_blk, scores_blk, *slot_blks):
            st_l = jax.tree.map(lambda x: x[0], st)
            d = var.dim
            uniq, picked = hashtable.dedup_last(
                keys_blk.reshape(-1),
                (vals_blk.reshape(-1, d), scores_blk.reshape(-1))
                + tuple(b.reshape(-1, d) for b in slot_blks),
            )
            sl = dict(zip(slot_names, picked[2:]))
            out = hashtable.commit(
                var.spec, st_l, uniq, values=picked[0],
                slot_rows=sl or None, scores=picked[1], score_mode="assign",
                return_evicted=return_evicted,
            )
            if return_evicted:
                new, ev = out
                return (jax.tree.map(lambda x: x[None], new),
                        jax.tree.map(lambda x: x[None], ev))
            return jax.tree.map(lambda x: x[None], out)

        in_specs = (sp,) + (P(self.axis),) * (3 + len(slot_args))
        args = [self._owner_blocks_to_global(a)
                for a in (keys, values, scores, *slot_args)]
        if return_evicted:
            ev_spec = {
                "keys": P(self.axis), "values": P(self.axis),
                "scores": P(self.axis),
                "slots": {n: P(self.axis) for n in state.slot_names},
                "dropped_keys": P(self.axis),
                "dropped_values": P(self.axis),
            }
            return self._smap(
                fn, in_specs=in_specs, out_specs=(sp, ev_spec)
            )(state, *args)
        return self._smap(fn, in_specs=in_specs, out_specs=sp)(
            state, *args
        )

    def _owner_blocks_to_global(self, arr):
        """Place an owner-partitioned [S, ...] host array as a global array
        sharded over the mesh axis. Single-process: a plain device array
        (jit moves it); multi-process: each process contributes the rows of
        ITS devices via ``make_array_from_process_local_data`` (no process
        holds non-addressable shards)."""
        arr = jnp.asarray(arr) if jax.process_count() == 1 else arr
        if jax.process_count() == 1:
            return arr
        devs = list(self.mesh.devices.flat)
        pid = jax.process_index()
        local = [i for i, d in enumerate(devs) if d.process_index == pid]
        assert local == list(range(local[0], local[0] + len(local))), (
            "mesh axis must place each process's devices contiguously for "
            "host-partitioned import"
        )
        sharding = NamedSharding(self.mesh, P(self.axis))
        local_rows = np.asarray(arr)[local[0]: local[0] + len(local)]
        return jax.make_array_from_process_local_data(
            sharding, local_rows, arr.shape
        )


def _ctx_spec(axis, ids_shape: tuple, n_pairs: int,
              scored: bool) -> "ShardedLookupContext":
    p = P(axis)
    octx = LookupContext(
        unique_keys=p,
        slot=p,
        found=p,
        rows=p,
        inverse=p,
        packed=p,
        inserted=p,
        dropped=p,
        no_dups=p,
        rows_aligned=p,
        key_lo=p,
        key_hi=p,
        scores=p if scored else None,
        ids_shape=(n_pairs,),
    )
    return ShardedLookupContext(
        send_pos=p,
        routed=p,
        num_dropped=p,
        deduped=p,
        octx=octx,
        ids_shape=tuple(ids_shape),
    )
