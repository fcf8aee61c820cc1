"""`de.Variable` — the user-facing dynamic-embedding table.

Functional re-design of the reference's sharded ``de.Variable``
(python/ops/dynamic_embedding_variable.py:478-1261). The reference object owns
N mutable table resources placed on devices and routes keys with
dynamic_partition/stitch; here a ``Variable`` is a *static spec* (hashable,
safe to close over in jit) and all storage lives in an explicit
``TableState`` pytree the caller threads through its step functions.
Multi-shard placement is a sharding annotation on the state's leading axis
(see parallel/sharded.py), not a device loop.

Training integration (the role of TrainableWrapper/ShadowVariable,
embedding_weights.py:123-541, shadow_embedding_ops.py:61-236) collapses to:

    emb, ctx = var.embedding_lookup(state, ids)         # rows w/ grads
    ... loss = f(emb) ...; row_grads = d loss / d emb rows
    state = var.apply_gradients(state, ctx, row_grads, opt, step)

No shadow buffers, no re-lookup-on-read, no monkey patches.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import threading
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable, initializers

TableSpec = hashtable.TableSpec
TableState = hashtable.TableState


class EvictStrategy(enum.Enum):
    """Parity with ``de.HkvEvictStrategy``
    (reference dynamic_embedding_creator.py:140-146)."""

    LRU = 0
    LFU = 1
    EPOCHLRU = 2
    EPOCHLFU = 3
    CUSTOMIZED = 4


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("unique_keys", "slot", "found", "rows", "inverse",
                 "packed", "inserted", "dropped", "no_dups",
                 "rows_aligned", "key_lo", "key_hi", "scores"),
    meta_fields=("ids_shape", "deferred"),
)
@dataclasses.dataclass
class LookupContext:
    """Residuals of a training lookup, consumed by ``apply_gradients``.

    Replaces the reference's TrainableWrapper `(params, ids)` recording
    (embedding_weights.py:434-476)."""

    unique_keys: jax.Array  # [U] deduplicated ids (EMPTY padded)
    slot: jax.Array  # [U] int32 physical slot at lookup time
    found: jax.Array  # [U] bool
    rows: jax.Array  # [U, D] values as seen (init rows for misses)
    inverse: jax.Array  # ids.shape -> index into unique
    # [U, W] packed (value|slots) rows as stored at lookup time (zeros for
    # misses) — lets the optimizer reuse the lookup's row-DMA instead of
    # re-gathering slot state; None when unavailable (e.g. sharded owner
    # path re-gathers)
    packed: Optional[jax.Array] = None
    # write plan computed at lookup time (insert/eviction slot choices) so
    # the writeback skips re-planning; None -> writeback re-plans
    inserted: Optional[jax.Array] = None
    dropped: Optional[jax.Array] = None
    # scalar bool: True when uniq IS the batch and inverse IS the iota
    # (all-hit, dup-free) — lets reduce_gradient skip its segment-sum
    # without re-deriving the fact from [N] compares; None -> unknown
    no_dups: Optional[jax.Array] = None
    # scalar bool: True when ``rows[i]`` is already occurrence ``i``'s own
    # value row (the all-hit paths gather PER OCCURRENCE — duplicates each
    # DMA their shared row, same descriptor count) so ``emb`` needs no
    # [N, D] expansion gather even for dup-heavy batches; False only out
    # of the miss branch with duplicates, where non-representative
    # positions hold unspecified data. None -> fall back to no_dups
    rows_aligned: Optional[jax.Array] = None
    # [C] key planes with this batch's inserts already committed (written
    # by plan_lookup_train's miss branch at lookup time, so the all-hit
    # apply path carries NO key-plane scatters); None -> the apply commits
    # keys itself
    key_lo: Optional[jax.Array] = None
    key_hi: Optional[jax.Array] = None
    # [C] score plane with this batch's LRU/EPOCHLRU scores already
    # committed (the lookup's score scatter doubles as the duplicate
    # probe — plan_lookup_train ``score_const``); None -> the apply
    # commits scores itself
    scores: Optional[jax.Array] = None
    ids_shape: tuple = ()  # static original ids shape
    # static bool: True when the lookup DEFERRED duplicate handling to the
    # apply (``found`` marks every occurrence, duplicates included, and no
    # representative/inverse machinery was built — apply_gradients runs
    # ``reduce_gradient_deferred`` which re-derives representatives from
    # one slot sort and overrides ``found``). Only the scored
    # (assign-mode) hit path sets this; see hashtable.plan_lookup_train.
    deferred: bool = False


class ModelMode:
    """Parity with reference ModelMode (embedding_weights.py:98-120)."""

    CURRENT_SETTING = "train"
    TRAIN = "train"
    INFERENCE = "inference"


def enable_train_mode():
    ModelMode.CURRENT_SETTING = ModelMode.TRAIN


def enable_inference_mode():
    ModelMode.CURRENT_SETTING = ModelMode.INFERENCE


def get_model_mode() -> str:
    return ModelMode.CURRENT_SETTING


def _stable_seed(name: str) -> int:
    import zlib

    return zlib.crc32(name.encode("utf-8"))


@dataclasses.dataclass(frozen=True, eq=False)
class Variable:
    """Static description of one dynamic-embedding table.

    Constructor parity with the reference ``de.Variable``
    (dynamic_embedding_variable.py:484-693): unsupported TF-isms (devices
    list, kv_creator) are accepted and mapped onto the TPU design (devices ->
    num_shards; kv_creator -> capacity/eviction config).
    """

    name: str = "DynamicEmbedding"
    key_dtype: Any = jnp.int64
    value_dtype: Any = jnp.float32
    dim: int = 1
    # None -> utils.config.env_config().default_init_size (reference
    # TF_HASHTABLE_INIT_SIZE, cuckoo_hashtable_op.cc:198-206)
    init_capacity: Optional[int] = None
    max_capacity: Optional[int] = None
    bucket_size: int = 64
    initializer: initializers.InitializerT = None
    trainable: bool = True
    bp_v2: bool = False
    evict_strategy: EvictStrategy = EvictStrategy.LRU
    gen_scores_fn: Optional[Callable] = None  # CUSTOMIZED strategy
    num_shards: int = 1  # reference: len(devices)
    seed: Optional[int] = None
    restrict_policy: Any = None  # class, bound lazily (see restrict.py)
    # eviction-score dtype. None -> int32 for LRU/LFU/CUSTOMIZED (cheap
    # scatters), int64 for EPOCH* strategies, whose packed (epoch | step)
    # scores SATURATE int32 at 2^20-1 steps/epoch and 2^11-1 epochs
    # (scores_for clamps — recency ties at the bound, never inverts).
    # Force jnp.int32 to trade that bound for scatter speed.
    score_dtype: Any = None
    # reference-signature compat (dynamic_embedding_variable.py:484-562):
    # ``devices`` maps to num_shards; ``kv_creator`` contributes backend
    # config (capacity / evict strategy) via KVCreator.get_variable_kwargs
    devices: Any = None
    kv_creator: Any = None
    # duplicate handling for scored (assign-mode) training lookups:
    # True -> the lookup keeps the occurrence contract and the apply
    # combines duplicates via one slot sort (hashtable.
    # sorted_combine_batch — 9.9 vs 23.2 ns/key ISOLATED on zipf
    # batches, tools/ab_dup_contract.py, but measured NEUTRAL end to
    # end with the batch-position scatter-back compromise,
    # tools/ab_defer_e2e.py — the full win needs the apply to consume
    # sorted order); False -> the eager probe-scatter dedup branch.
    # None -> the TFRA_TPU_DEFER_DEDUP env knob (default off).
    defer_dedup: Optional[bool] = None

    # dtype whitelist (reference dynamic_embedding_variable.py:613-651;
    # string keys are fingerprinted at the boundary — hashing.hash_strings)
    _KEY_DTYPES = ("int32", "int64")
    _VALUE_DTYPES = ("float32", "bfloat16", "float16", "float64",
                     "int8", "int32", "int64", "bool")

    def __post_init__(self):
        if self.init_capacity is None:
            from recommenders_addons_tpu.utils.config import env_config

            object.__setattr__(
                self, "init_capacity", env_config().default_init_size
            )
        kdt = np.dtype(self.key_dtype).name
        vdt = np.dtype(self.value_dtype).name
        if kdt not in self._KEY_DTYPES:
            raise TypeError(
                f"key dtype {kdt} not supported (one of {self._KEY_DTYPES};"
                " hash string keys with de.hash_strings)"
            )
        if vdt not in self._VALUE_DTYPES:
            raise TypeError(
                f"value dtype {vdt} not supported "
                f"(one of {self._VALUE_DTYPES})"
            )
        if self.devices:
            object.__setattr__(self, "num_shards", len(self.devices))
        kc = self.kv_creator
        if kc is not None and hasattr(kc, "get_variable_kwargs"):
            for k, v in kc.get_variable_kwargs(
                dim=self.dim, value_dtype=self.value_dtype
            ).items():
                object.__setattr__(self, k, v)

    @property
    def spec(self) -> TableSpec:
        cap = self.max_capacity or self.init_capacity
        sdt = self.score_dtype
        if sdt is None:
            sdt = (
                jnp.int64
                if self.evict_strategy in (EvictStrategy.EPOCHLRU,
                                           EvictStrategy.EPOCHLFU)
                else jnp.int32
            )
        return TableSpec(
            dim=self.dim,
            capacity=max(cap // max(self.num_shards, 1), self.bucket_size),
            key_dtype=self.key_dtype,
            value_dtype=self.value_dtype,
            score_dtype=sdt,
            bucket_size=self.bucket_size,
        )

    @property
    def shard_capacity(self) -> int:
        return self.spec.capacity

    @property
    def total_capacity(self) -> int:
        return self.spec.capacity * self.num_shards

    @property
    def empty_key(self):
        return self.spec.empty_key

    def _rng(self) -> jax.Array:
        seed = self.seed if self.seed is not None else _stable_seed(self.name)
        return jax.random.PRNGKey(seed)

    # -- state ------------------------------------------------------------

    def init(self, rng: Optional[jax.Array] = None) -> TableState:
        """Create empty state for ONE shard (for the sharded [S, ...] layout
        see parallel/sharded.py)."""
        del rng  # tables start empty; rows are initialized on first touch
        return hashtable.create(self.spec)

    # -- score policy ------------------------------------------------------

    def scores_for(
        self,
        keys: jax.Array,
        counts: Optional[jax.Array] = None,
        step: jax.Array | int = 0,
        epoch: jax.Array | int = 0,
    ):
        """(scores [N], score_mode) per the evict strategy — the TPU analog of
        HKV's per-strategy score generation (hkv_hashtable_ops.py:209-216)."""
        n = keys.shape[0]
        sdt = self.spec.score_dtype
        step = jnp.asarray(step, sdt)
        epoch = jnp.asarray(epoch, sdt)
        ones = jnp.ones((n,), sdt)
        # epoch-scoped packing: int64 scores (the default for EPOCH*
        # strategies) use (epoch<<32 | step); a user-forced int32 packs
        # (epoch<<20 | step) — int32 because int64 element scatters are
        # ~40x slower on TPU (hashtable.split_key). Steps/epochs past the
        # field width SATURATE rather than wrap: a wrapped step would alias
        # to 0 and read as the OLDEST row in its epoch (inverting eviction
        # order); a clamped one ties at the epoch's max recency, which only
        # coarsens ordering among post-clamp touches (tested at the 2^20
        # boundary, test_evict_strategies.py).
        eshift = 32 if np.dtype(sdt) == np.int64 else 20
        emask = (1 << eshift) - 1
        ebits = (63 if np.dtype(sdt) == np.int64 else 31) - eshift
        emax = (1 << ebits) - 1
        if self.evict_strategy == EvictStrategy.LRU:
            return jnp.broadcast_to(step, (n,)), "assign"
        if self.evict_strategy == EvictStrategy.LFU:
            c = ones if counts is None else counts.astype(sdt)
            return c, "add"
        if self.evict_strategy == EvictStrategy.EPOCHLRU:
            s = (jnp.minimum(epoch, emax) << eshift) | jnp.minimum(
                step, emask)
            return jnp.broadcast_to(s, (n,)), "assign"
        if self.evict_strategy == EvictStrategy.EPOCHLFU:
            c = ones if counts is None else counts.astype(sdt)
            # new epoch resets the frequency baseline to the epoch floor
            return (jnp.minimum(epoch, emax) << eshift) + c, "add"
        if self.evict_strategy == EvictStrategy.CUSTOMIZED:
            if self.gen_scores_fn is None:
                raise ValueError(
                    "CUSTOMIZED evict strategy needs gen_scores_fn "
                    "(parity: HkvHashTableConfig.gen_scores_fn)"
                )
            return self.gen_scores_fn(keys).astype(sdt), "assign"
        raise ValueError(self.evict_strategy)

    # -- inference path ----------------------------------------------------

    def lookup(
        self,
        state: TableState,
        ids: jax.Array,
        *,
        return_exists: bool = False,
        use_init_for_missing: bool = False,
    ):
        """Pure lookup; missing ids -> static default value (or per-key init
        rows if requested). Reference ``Variable.lookup``
        (dynamic_embedding_variable.py:933-986)."""
        flat = ids.reshape(-1)
        slot, found = hashtable.find(self.spec, state, flat)
        if use_init_for_missing:
            default = initializers.materialize_rows(
                self.initializer, self._rng(), flat, self.dim, self.value_dtype
            )
        else:
            default = initializers.default_value_of(
                self.initializer, self.dim, self.value_dtype
            )
        vals = hashtable.gather(self.spec, state, slot, found, default)
        vals = vals.reshape(ids.shape + (self.dim,))
        if return_exists:
            return vals, found.reshape(ids.shape)
        return vals

    # -- training path -----------------------------------------------------

    def lookup_score_const(self, step, epoch):
        """Scalar score for a lookup-time commit, or None to defer scoring
        to apply time.

        Only assign-mode strategies with a batch-constant score qualify:
        LRU always; EPOCHLRU only when the caller passed ``epoch``
        explicitly — silently assuming ``epoch=0`` would stamp
        ``(0 << shift | step)`` over a row's stored ``(epoch << shift |
        step)`` score, making freshly-touched rows look OLDER than
        untouched rows from later epochs and inverting eviction order
        (ADVICE r4: sharded.py:429)."""
        if step is None:
            return None
        if self.evict_strategy == EvictStrategy.EPOCHLRU and epoch is None:
            return None
        if self.evict_strategy not in (EvictStrategy.LRU,
                                       EvictStrategy.EPOCHLRU):
            return None
        sc_vec, mode = self.scores_for(
            jnp.zeros((1,), self.key_dtype), step=step,
            epoch=0 if epoch is None else epoch)
        if mode != "assign":
            return None
        return sc_vec[0]

    @property
    def defer_dedup_on(self) -> bool:
        if self.defer_dedup is not None:
            return bool(self.defer_dedup)
        import os

        return os.environ.get("TFRA_TPU_DEFER_DEDUP", "0") == "1"

    def embedding_lookup(self, state: TableState, ids: jax.Array,
                         *, step=None, epoch=None):
        """Trainable lookup with built-in dedup (the reference's
        ``embedding_lookup_unique`` + ShadowVariable prefetch path,
        shadow_embedding_ops.py:239-328).

        Returns ``(emb [ids.shape + (dim,)], LookupContext)``; differentiate
        the loss w.r.t. ``emb`` (or the ctx rows) and pass the cotangent to
        :meth:`apply_gradients`.

        ``step`` (and ``epoch`` for EPOCHLRU): pass the training step HERE
        for LRU-family strategies and the batch's scores are committed at
        lookup time, where the score scatter doubles as the duplicate
        probe — the steady-state apply then issues ZERO element scatters
        (plan_lookup_train ``score_const``). The fused apply then ignores
        its own ``step`` for scoring (the unfused path re-stamps with the
        apply's step — identical when the caller passes the same step to
        both, the normal pattern). The fast path stays exact as long as
        steps increase monotonically (a reused step value only falls back
        to the slower dedup branch, never to wrong results). EPOCHLRU
        commits at lookup only when ``epoch`` is ALSO passed — with only
        ``step`` the commit falls back to apply time rather than silently
        stamping epoch 0 (see :meth:`lookup_score_const`).
        """
        flat = ids.reshape(-1)
        score_const = self.lookup_score_const(step, epoch)
        defer = self.defer_dedup_on and score_const is not None
        # fused dedup + probe + write plan + gather + row blend, with the
        # whole pipeline branched on the all-hit case: steady-state batches
        # skip the sort, insert planning, AND the per-key initializer
        # (hashtable.plan_lookup_train)
        out = hashtable.plan_lookup_train(
            self.spec, state, flat,
            lambda u: initializers.materialize_rows(
                self.initializer, self._rng(), u, self.dim,
                self.value_dtype,
            ),
            score_const=score_const,
            defer_dedup=defer,
        )
        if score_const is not None:
            (uniq, inverse, (slot, found, inserted, dropped), packed,
             no_dups, rows_aligned, new_lo, new_hi, new_scores) = out
        else:
            (uniq, inverse, (slot, found, inserted, dropped), packed,
             no_dups, rows_aligned, new_lo, new_hi) = out
            new_scores = None
        # the blended value rows live IN packed's value columns
        # (plan_lookup_train invariant): ``rows`` is a lazy slice (format-
        # aware — packed may be the physical [N*ch, 128] container), not a
        # second cond output materialized next to packed
        rows = hashtable.packed_value_rows(state, flat.shape[0], packed)
        ctx = LookupContext(
            unique_keys=uniq,
            slot=slot,
            found=found,
            rows=rows,
            inverse=inverse,
            packed=packed,
            inserted=inserted,
            dropped=dropped,
            no_dups=no_dups,
            rows_aligned=rows_aligned,
            key_lo=new_lo,
            key_hi=new_hi,
            scores=new_scores,
            ids_shape=tuple(ids.shape),
            deferred=defer,
        )
        # occurrence-aligned rows (every hit path, dup-heavy included —
        # the all-hit gather is per occurrence) skip the [N, D] expansion
        # gather; only a miss batch WITH duplicates pays it
        emb = jax.lax.cond(
            rows_aligned, lambda r: r, lambda r: r[inverse], rows
        ).reshape(ids.shape + (self.dim,))
        return emb, ctx

    def reduce_gradient(self, ctx: LookupContext, emb_grad: jax.Array):
        """Cotangent w.r.t. the full ``emb`` output -> per-unique-row grads
        (segment-sum over duplicate ids — what IndexedSlices aggregation does
        in the reference optimizer, dynamic_embedding_optimizer.py:184)."""
        if ctx.deferred:
            raise ValueError(
                "this LookupContext deferred duplicate handling to the "
                "apply (ctx.found marks every occurrence): use "
                "reduce_gradient_deferred (or apply_gradients, which "
                "calls it) so duplicates are combined AND the write mask "
                "is narrowed to one representative per row"
            )
        u = ctx.unique_keys.shape[0]
        g = emb_grad.reshape(-1, self.dim)
        inv = ctx.inverse.reshape(-1)
        if g.shape[0] != u:
            return hashtable.segment_sum_rows(g, inv, u)
        # dup-free batches (the all-hit plan leaves each representative at
        # its own position, so ``inverse`` is the identity) skip the random
        # scatter-add entirely. The plan already knows dup-freedom
        # (ctx.no_dups); deriving it from [N] compares is the fallback for
        # hand-built contexts. The dup branch combines on the MXU
        # (hashtable.segment_sum_rows: 18.0 -> 8.6 ns/key on zipf
        # batches — XLA's scatter-add serializes on hot-key targets).
        pred = ctx.no_dups
        if pred is None:
            pred = jnp.all(inv == jnp.arange(u, dtype=inv.dtype))
        return jax.lax.cond(
            pred,
            lambda _: g,
            lambda _: hashtable.segment_sum_rows(g, inv, u),
            None,
        )

    def reduce_gradient_deferred(self, ctx: LookupContext,
                                 emb_grad: jax.Array):
        """Grad combine for a DEFERRED-dedup context (``ctx.deferred``).

        Returns ``(grads [N, D], found [N])``: duplicate occurrences'
        grads are summed onto one representative each and ``found`` is
        narrowed to those representatives, so the downstream write plan
        touches every row exactly once (the invariant the eager dedup
        branch used to establish at lookup time with a probe scatter +
        ``take_elem`` read-back). Three cases, selected by the plan's own
        scalars: dup-free batches pass through untouched; all-hit batches
        with duplicates take the sorted MXU combine
        (hashtable.sorted_combine_batch — the measured win,
        tools/ab_dup_contract.py); a miss batch with duplicates came out
        of ``plan_lookup`` with the rep/inverse contract already built,
        so it keeps the inverse-based combine."""
        n = ctx.found.shape[0]
        g = emb_grad.reshape(-1, self.dim)
        inv = ctx.inverse.reshape(-1)

        def passthrough(_):
            return g, ctx.found

        def hit_dups(_):
            return hashtable.sorted_combine_batch(g, ctx.slot, ctx.found)

        def miss_dups(_):
            return hashtable.segment_sum_rows(g, inv, n), ctx.found

        return jax.lax.cond(
            ctx.no_dups,
            passthrough,
            lambda _: jax.lax.cond(
                ctx.rows_aligned, hit_dups, miss_dups, None),
            None,
        )

    def writeback(
        self,
        state: TableState,
        ctx: LookupContext,
        new_rows: jax.Array,
        slot_rows: Optional[Dict[str, jax.Array]] = None,
        step: jax.Array | int = 0,
        epoch: jax.Array | int = 0,
        return_evicted: bool = False,
    ) -> TableState:
        """Write trained rows (and optimizer slot rows) back — the role of
        ``TrainableWrapper.update_op`` (embedding_weights.py:434-444).
        Honors ``bp_v2``: delta-accumulate instead of overwrite
        (dynamic_embedding_variable.py:546-552). ``return_evicted`` also
        returns rows displaced by bucket eviction so a spill tier can
        absorb them (training never silently loses a row).

        Deferred contexts (``ctx.deferred``): ``found`` marks every
        occurrence, so duplicate keys would scatter-race here — run
        ``reduce_gradient_deferred`` first and write back with
        ``dataclasses.replace(ctx, found=rep_mask)`` (what
        ``apply_gradients`` does), or write identical rows per
        duplicate."""
        scores, mode = self.scores_for(
            ctx.unique_keys, step=step, epoch=epoch
        )
        if ctx.inserted is not None:
            commit = functools.partial(
                hashtable.commit_planned,
                plan=(ctx.slot, ctx.found, ctx.inserted, ctx.dropped),
            )
        else:
            commit = hashtable.commit
        if self.bp_v2:
            return commit(
                self.spec,
                state,
                ctx.unique_keys,
                values=new_rows,
                deltas=new_rows - ctx.rows,
                slot_rows=slot_rows,
                scores=scores,
                score_mode=mode,
                return_evicted=return_evicted,
            )
        return commit(
            self.spec,
            state,
            ctx.unique_keys,
            values=new_rows,
            slot_rows=slot_rows,
            scores=scores,
            score_mode=mode,
            return_evicted=return_evicted,
        )

    def apply_gradients(
        self,
        state: TableState,
        ctx: LookupContext,
        grads: jax.Array,
        optimizer,
        step: jax.Array | int = 0,
        epoch: jax.Array | int = 0,
        return_evicted: bool = False,
    ) -> TableState:
        """Sparse optimizer step on the touched rows (see
        ops/optimizer.py). ``grads`` may be w.r.t. ``emb`` (any shape ending
        in [dim]; reduced over duplicates) or already per-unique-row [U, D].
        ``return_evicted``: also return rows displaced by bucket eviction
        (for spill-tier absorption)."""
        from recommenders_addons_tpu.ops import optimizer as opt_lib

        return opt_lib.apply_gradients(
            self, state, ctx, grads, optimizer, step=step, epoch=epoch,
            return_evicted=return_evicted,
        )

    # -- direct KV ops (parity: upsert/accum/remove/clear/size/export) -----

    def _flat_kv(self, keys, values=None):
        keys = jnp.asarray(keys, self.key_dtype).reshape(-1)
        if values is None:
            return keys
        values = jnp.asarray(values, self.value_dtype).reshape(-1, self.dim)
        return keys, values

    def upsert(self, state, keys, values, step=0, epoch=0,
               return_evicted: bool = False):
        keys, values = self._flat_kv(keys, values)
        # deterministic last-write-wins per duplicate key (XLA duplicate-
        # index scatters don't guarantee order)
        uniq, (uvals,) = hashtable.dedup_last(keys, (values,))
        scores, mode = self.scores_for(uniq, step=step, epoch=epoch)
        return hashtable.commit(
            self.spec, state, uniq, values=uvals, scores=scores,
            score_mode=mode, return_evicted=return_evicted,
        )

    def accum(self, state, keys, old_values, new_values, exists=None,
              step=0, epoch=0) -> TableState:
        """Reference signature (dynamic_embedding_variable.py:806-855):
        writes (new - old) deltas for existing keys, new values for misses.

        Duplicate keys are handled deterministically — deltas SUM per key
        (matching the reference's sequential insert_or_accum,
        cuckoohash_map.hh:756-765); a missing key inserts its last
        occurrence's ``new`` value. ``exists`` (when given) is the
        consistency guard captured at lookup time: a key is written only if
        its presence in the table still matches — a key evicted (or newly
        inserted by another writer) between lookup and accum is skipped,
        never corrupted (reference accumrase_fn, cuckoohash_map.hh:620-632).
        """
        keys = jnp.asarray(keys, self.key_dtype).reshape(-1)
        old_values = jnp.asarray(old_values, self.value_dtype).reshape(
            -1, self.dim
        )
        new_values = jnp.asarray(new_values, self.value_dtype).reshape(
            -1, self.dim
        )
        uniq, (udelta,) = hashtable.dedup_sum(
            keys, (new_values - old_values,)
        )
        if exists is not None:
            ex = jnp.asarray(exists).reshape(-1).astype(jnp.int32)
            _, (unew, uex) = hashtable.dedup_last(keys, (new_values, ex))
            _, found = hashtable.find(self.spec, state, uniq)
            uniq = jnp.where(found == (uex != 0), uniq, self.empty_key)
        else:
            _, (unew,) = hashtable.dedup_last(keys, (new_values,))
        scores, mode = self.scores_for(uniq, step=step, epoch=epoch)
        return hashtable.accum(
            self.spec,
            state,
            uniq,
            deltas=udelta,
            values_for_new=unew,
            scores=scores,
            score_mode=mode,
        )

    def import_batch(
        self,
        state: TableState,
        keys,
        values,
        scores=None,
        slot_rows: Optional[Dict[str, jax.Array]] = None,
        return_evicted: bool = False,
    ) -> TableState:
        """Bulk restore of (key, value, score, slot-row) tuples — the
        checkpoint-load path (reference ``table.import`` clear+insert,
        cuckoo_hashtable_op.cc:288-291, and HKV's score-aware load,
        lookup_table_op_hkv.h:602-660). Duplicate keys keep the last
        occurrence (deterministically)."""
        keys = jnp.asarray(keys, self.key_dtype).reshape(-1)
        values = jnp.asarray(values, self.value_dtype).reshape(-1, self.dim)
        if scores is None:
            scores = jnp.ones(keys.shape, self.spec.score_dtype)
        scores = jnp.asarray(scores, self.spec.score_dtype).reshape(-1)
        slot_names = tuple(sorted((slot_rows or {}).keys()))
        slot_cols = tuple(
            jnp.asarray(slot_rows[n], self.value_dtype).reshape(-1, self.dim)
            for n in slot_names
        )
        uniq, picked = hashtable.dedup_last(
            keys, (values, scores) + slot_cols
        )
        return hashtable.commit(
            self.spec,
            state,
            uniq,
            values=picked[0],
            slot_rows=dict(zip(slot_names, picked[2:])) or None,
            scores=picked[1],
            score_mode="assign",
            return_evicted=return_evicted,
        )

    def grow(self, state: TableState, new_capacity: int,
             chunk_size: int = 1 << 16):
        """Rebuild into a larger-capacity table, preserving every live
        row's value, optimizer slots, and score.

        The explicit XLA-static analog of libcuckoo's automatic resize
        (the reference's CPU ``CuckooHashTable`` grows on insert,
        cuckoohash_map.hh; HKV instead evicts at capacity — this design
        follows HKV under ``jit`` but offers growth as a host-driven
        step, since XLA shapes are static). Streams the old table in
        ``chunk_size``-slot slices through ONE compiled import step
        (offsets are traced, so there is a single executable).

        Returns ``(new_var, new_state)`` — the returned ``Variable`` has
        the new capacity; use it for all subsequent ops. Sharded tables
        grow through the checkpoint path instead (save + elastic restore
        re-buckets across any shard count — train/checkpoint.py).
        """
        if new_capacity < state.capacity:
            raise ValueError(
                f"grow target {new_capacity} < current {state.capacity}"
            )
        new_var = dataclasses.replace(
            self, init_capacity=int(new_capacity), max_capacity=None
        )
        new_state = hashtable.create(new_var.spec)
        for name in state.slot_names:
            new_state = hashtable.with_slot(
                new_state, name, state.slot_init(name)
            )
        d = self.dim
        ch = state.chunks
        w = state.width
        names = tuple(state.slot_names)
        n_chunks = -(-state.capacity // chunk_size)

        @functools.partial(jax.jit, donate_argnums=0)
        def import_chunk(new_st, st, off):
            k = hashtable.join_key(
                jax.lax.dynamic_slice_in_dim(st.key_lo, off, chunk_size),
                jax.lax.dynamic_slice_in_dim(st.key_hi, off, chunk_size),
            ).astype(jnp.asarray(self.empty_key).dtype)
            phys = jax.lax.dynamic_slice_in_dim(
                st.rows, off * ch, chunk_size * ch
            )
            logical = hashtable._to_logical_rows(
                phys, st.value_dtype, chunk_size, w
            )
            scores = jax.lax.dynamic_slice_in_dim(
                st.scores, off, chunk_size
            )
            slot_rows = {
                nm: logical[:, st.slot_offset(nm): st.slot_offset(nm) + d]
                for nm in names
            } or None
            return new_var.import_batch(
                new_st, k, logical[:, :d], scores=scores,
                slot_rows=slot_rows,
            )

        # pad the old state so a fixed chunk_size slices cleanly
        pad = n_chunks * chunk_size - state.capacity
        st = state
        if pad:
            e_lo, e_hi = hashtable.split_key(
                jnp.asarray(self.empty_key, jnp.int64))
            st = state.replace(
                key_lo=jnp.concatenate(
                    [state.key_lo, jnp.full((pad,), e_lo, jnp.int32)]),
                key_hi=jnp.concatenate(
                    [state.key_hi, jnp.full((pad,), e_hi, jnp.int32)]),
                rows=jnp.concatenate(
                    [state.rows,
                     jnp.zeros((pad * ch, state.rows.shape[-1]),
                               state.rows.dtype)]),
                scores=jnp.concatenate(
                    [state.scores,
                     jnp.zeros((pad,), state.scores.dtype)]),
            )
        for c in range(n_chunks):
            new_state = import_chunk(
                new_state, st, jnp.asarray(c * chunk_size, jnp.int32)
            )
        return new_var, new_state

    def remove(self, state, keys) -> TableState:
        return hashtable.remove(self.spec, state, self._flat_kv(keys))

    def clear(self, state) -> TableState:
        return hashtable.clear(self.spec, state)

    def size(self, state) -> jax.Array:
        return hashtable.size(self.spec, state)

    def export(self, state):
        return hashtable.export(self.spec, state)

    def export_keys_and_scores(self, state):
        k, _, s, m = hashtable.export_with_scores(self.spec, state)
        return k, s, m

    def export_chunked(self, state: TableState, split_size: int):
        """Stream live ``(keys, values, scores)`` host-side in chunks of at
        most ``split_size`` table slots — bounds device->host transfer and
        host memory for terabyte-scale tables (the reference's
        ``export_keys_and_scores(split_size)`` streaming contract,
        hkv_hashtable_ops.py:420-434; chunked dump loop
        cuckoo_hashtable_op.cc:310-391).

        Yields compacted numpy ``(keys [n], values [n, D], scores [n])``
        per chunk (empty chunks are skipped).
        """
        if not (isinstance(split_size, int) and split_size > 0):
            raise ValueError("split_size must be a positive integer")
        spec = self.spec
        cap = state.capacity
        ch = state.chunks
        for off in range(0, cap, split_size):
            n = min(split_size, cap - off)
            k = jax.device_get(hashtable.join_key(
                state.key_lo[off:off + n], state.key_hi[off:off + n]))
            keys = np.asarray(k)
            mask = keys != spec.empty_key
            if not mask.any():
                continue
            phys = state.rows[off * ch:(off + n) * ch]
            vals = np.asarray(jax.device_get(
                hashtable._to_logical_rows(
                    phys, state.value_dtype, n, state.width)
            ))[:, : self.dim]
            scores = np.asarray(jax.device_get(
                state.scores[off:off + n]))
            yield (keys[mask].astype(np.dtype(self.key_dtype)),
                   vals[mask], scores[mask])

    # -- restrict policy hookup (reference Variable(restrict_policy=...)
    #    dynamic_embedding_variable.py:604-611) ---------------------------

    @property
    def policy(self):
        """Instantiate the configured restrict policy (class) lazily."""
        if self.restrict_policy is None:
            return None
        return self.restrict_policy(self)

    def restrict(self, state, num_reserved: int, trigger=None) -> TableState:
        """Cap the live-key count via the configured policy (reference
        ``Variable.restrict``, dynamic_embedding_variable.py:857-875)."""
        p = self.policy
        if p is None:
            from recommenders_addons_tpu.ops.restrict import (
                TimestampRestrictPolicy,
            )

            p = TimestampRestrictPolicy(self)
        return p.apply_restriction(state, num_reserved, trigger)


# ---------------------------------------------------------------------------
# get_variable scope store (reference dynamic_embedding_variable.py:1264-1359)
# ---------------------------------------------------------------------------

_STORE: Dict[str, Variable] = {}
_STORE_LOCK = threading.Lock()


def _same_initializer(a, b) -> bool:
    """Best-effort initializer equality for the get_variable conflict check
    (initializers may be None, scalars, arrays, or callables)."""
    if a is b:
        return True
    if a is None or b is None:
        return False
    if callable(a) or callable(b):
        return a is b
    try:
        return bool(np.array_equal(np.asarray(a), np.asarray(b)))
    except Exception:
        return False


def get_variable(name: str = "DynamicEmbedding", **kwargs) -> Variable:
    """Create-or-reuse a ``Variable`` by name (the reference's scope-store
    dedup). Passing conflicting kwargs for an existing name raises —
    including a conflicting ``initializer`` (two call sites must not
    silently believe they configured different inits)."""
    with _STORE_LOCK:
        if name in _STORE:
            existing = _STORE[name]
            for k, v in kwargs.items():
                if k == "initializer":
                    if not _same_initializer(existing.initializer, v):
                        raise ValueError(
                            f"get_variable('{name}') exists with a "
                            "different initializer"
                        )
                elif getattr(existing, k, None) != v:
                    raise ValueError(
                        f"get_variable('{name}') exists with different {k}"
                    )
            return existing
        var = Variable(name=name, **kwargs)
        _STORE[name] = var
        return var


def clear_variable_store():
    with _STORE_LOCK:
        _STORE.clear()


class GraphKeys:
    """Deprecated parity alias (reference exports it; GraphKeys are a TF1
    concept with no JAX analog)."""

    DYNAMIC_EMBEDDING_VARIABLES = "dynamic_embedding_variables"
    TRAINABLE_DYNAMIC_EMBEDDING_VARIABLES = (
        "trainable_dynamic_embedding_variables"
    )
