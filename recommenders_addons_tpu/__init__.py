"""recommenders_addons_tpu — a TPU-native dynamic-embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``tensorflow/recommenders-addons`` (TFRA): trainable key-value hashtable
embeddings with unbounded vocabularies, score-based eviction, KV-native
checkpointing, and mesh-sharded (all-to-all over ICI) distributed lookup.

Design principles (vs. the reference, see SURVEY.md):
  * Pure-functional table state (a pytree) threaded through ``jax.jit`` with
    buffer donation — no mutable resource ops, no monkey patches.
  * HKV-style set-associative bucket hashtable (capacity-bounded, min-score
    eviction on full buckets) implemented with vectorized XLA gathers/scatters
    and Pallas kernels for the hot paths.
  * Sharding via ``jax.sharding.Mesh`` + ``shard_map``: keys are routed to
    their owner shard with ``all_to_all`` over ICI; values return the same way.
  * Sparse optimizers keep their slot rows (Adam m/v, ...) in extra columns of
    the same table shard, so updates never cross the interconnect.

Usage::

    import recommenders_addons_tpu as tfra
    from recommenders_addons_tpu import dynamic_embedding as de

    var = de.Variable(name="user_emb", dim=32)
    state = var.init(jax.random.PRNGKey(0))
    emb, ctx = de.embedding_lookup_trainable(var, state, ids)
"""

from __future__ import annotations

import os

# The dynamic-embedding key space is 2^64 (reference README.md:245-257 supports
# int64 keys); JAX disables 64-bit dtypes by default, so we enable them here.
# All internal compute specifies dtypes explicitly; user float code is
# unaffected as long as it also uses explicit dtypes (standard JAX practice).
if os.environ.get("TFRA_TPU_DISABLE_X64", "0") != "1":
    import jax

    jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS even when a sitecustomize-preloaded PJRT plugin (the
# axon TPU tunnel in this environment) has already imported jax and pinned
# the platform list: re-assert the env var on the live config so
# ``JAX_PLATFORMS=cpu python examples/...`` actually runs on CPU instead of
# hanging on a wedged TPU backend init.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

__version__ = "0.2.0"

from recommenders_addons_tpu import dynamic_embedding  # noqa: E402,F401


def register_all(**_kwargs):
    """Parity shim for ``tfra.register_all`` (reference register.py:10-111).

    The reference loads custom-op shared objects for SavedModel serving; a
    JAX-native framework has no op registry, so this is a no-op that exists so
    user code ports cleanly.
    """
    return None
