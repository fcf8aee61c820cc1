"""Restrict policies — size-capping feature eviction.

Re-design of the reference's commensal-status-table policies
(python/ops/restrict_policies.py:36-358). The reference keeps a second
`de.Variable` mapping key -> timestamp / frequency and, when the table
exceeds a trigger, exports everything, finds the top-k stalest keys
host-side, and removes them from the variable plus every optimizer-slot
table.

The TPU design already stores an eviction score per slot *inside* the table
(`TableState.scores` — the HKV design), so a policy here is just:

  * `apply_update(...)`: nothing to do on lookup/writeback paths — scores are
    maintained by `Variable.scores_for` on every commit (LRU: score=step,
    LFU: score+=count). Provided for API parity; it can also bump scores for
    an explicit id set outside a training step.
  * `apply_restriction(num_reserved, trigger)`: if `size > trigger`, evict
    the `size - num_reserved` lowest-score live keys in one fused top-k +
    scatter (hashtable.evict_lowest). Slot columns live in the same state, so
    "cleanup of optimizer slots" (restrict_policies.py:181-229) is free: an
    evicted row's slots are reset on the next insert into that slot.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from recommenders_addons_tpu.ops import hashtable
from recommenders_addons_tpu.ops.variable import EvictStrategy, Variable


class RestrictPolicy:
    """Base policy (reference restrict_policies.py:36-115)."""

    def __init__(self, var: Variable):
        self.var = var

    def apply_update(self, state: hashtable.TableState, ids,
                     step=0, epoch=0) -> hashtable.TableState:
        """Bump the status (score) of ``ids`` — the reference upserts into
        the status table on every train step (restrict_policies.py:159-179).
        Scores are already bumped by every lookup-writeback; use this to
        refresh ids outside a training step."""
        var = self.var
        ids = jnp.asarray(ids, var.key_dtype).reshape(-1)
        uniq, _ = hashtable.unique_static(ids)
        slot, found = hashtable.find(var.spec, state, uniq)
        scores, mode = var.scores_for(uniq, step=step, epoch=epoch)
        return hashtable.scatter_rows(
            var.spec, state, slot, found, scores=scores, score_mode=mode
        )

    def apply_restriction(self, state: hashtable.TableState,
                          num_reserved: int,
                          trigger: Optional[int] = None
                          ) -> hashtable.TableState:
        """Cap the table to ``num_reserved`` live keys when it exceeds
        ``trigger`` (reference restrict_policies.py:181-229). Static-shape:
        the eviction count is bounded by capacity - num_reserved; keys above
        the threshold are spared via score masking."""
        var = self.var
        trigger = trigger if trigger is not None else num_reserved
        cap = state.capacity
        num_evict = max(cap - int(num_reserved), 0)
        if num_evict == 0:
            return state
        live = hashtable.size(var.spec, state)

        def do_evict(st):
            # evict (live - num_reserved) lowest-score keys; evict_lowest
            # takes a static k, so mask: only the first (live - reserved)
            # victims in score order are actually removed.
            return _evict_to_target(var.spec, st, int(num_reserved),
                                    num_evict)

        return jax.lax.cond(
            live > jnp.asarray(trigger, live.dtype),
            do_evict,
            lambda st: st,
            state,
        )

    # reference ctor creates the status table lazily; here state is shared
    def create_status(self, state):  # parity no-op
        return state


# the radix-select machinery lives in hashtable.py so every eviction path
# (evict_lowest, spill demotes, restrict) shares ONE implementation
_radix_select_threshold = hashtable.radix_select_threshold
_to_unsigned_order = hashtable.to_unsigned_order


def _evict_to_target(spec, state, num_reserved: int, k_static: int = 0):
    """Remove the lowest-score live keys until only ``num_reserved`` remain.

    Victim selection is a score THRESHOLD from an exact radix select plus a
    tie-rank cumsum — one boolean mask over [C], applied elementwise (no
    scatter, no top_k). ``k_static`` is unused (kept for call compat).
    """
    del k_static
    mask = hashtable.occupancy_mask(spec, state)
    live = jnp.sum(mask).astype(jnp.int32)
    n_victim = jnp.maximum(live - jnp.int32(num_reserved), 0)
    u = _to_unsigned_order(state.scores)
    u = jnp.where(mask, u, jnp.asarray(0, u.dtype) - 1)  # max for dead
    t, below = _radix_select_threshold(u, mask, n_victim)
    strict = mask & (u < t)
    eq = mask & (u == t)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))  # inclusive, slot order
    need_eq = n_victim - below
    victims = strict | (eq & (eq_rank <= need_eq))
    victims = victims & (n_victim > 0)
    e_lo, e_hi = hashtable.split_key(jnp.asarray(spec.empty_key, jnp.int64))
    new_lo = jnp.where(victims, e_lo, state.key_lo)
    new_hi = jnp.where(victims, e_hi, state.key_hi)
    new_scores = jnp.where(victims, 0, state.scores)
    return state.replace(key_lo=new_lo, key_hi=new_hi, scores=new_scores)


class TimestampRestrictPolicy(RestrictPolicy):
    """Evict least-recently-seen keys (reference
    restrict_policies.py:118-233). Requires the variable's evict strategy to
    be time-ordered (LRU / EPOCHLRU) so scores ARE timestamps."""

    def __init__(self, var: Variable):
        if var.evict_strategy not in (
            EvictStrategy.LRU, EvictStrategy.EPOCHLRU,
            EvictStrategy.CUSTOMIZED,
        ):
            var = dataclasses.replace(var, evict_strategy=EvictStrategy.LRU)
        super().__init__(var)


class FrequencyRestrictPolicy(RestrictPolicy):
    """Evict least-frequently-seen keys (reference
    restrict_policies.py:236-358): scores are occurrence counters."""

    def __init__(self, var: Variable):
        if var.evict_strategy not in (
            EvictStrategy.LFU, EvictStrategy.EPOCHLFU,
        ):
            var = dataclasses.replace(var, evict_strategy=EvictStrategy.LFU)
        super().__init__(var)
