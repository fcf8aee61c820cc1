"""Per-key deterministic row initializers.

The reference regenerates ``dynamic_default_values`` from the initializer on
every lookup so missing keys are initialized on first touch
(dynamic_embedding_variable.py:919-931, :962-966). The TPU-native design
improves on this: each key's initial row is a pure function of
``(seed, key)`` via ``jax.random.fold_in``, so it is

  * identical no matter which shard/host first touches the key,
  * stable across repeated lookups before the first writeback,
  * reproducible across restores.

Any ``jax.nn.initializers``-style callable ``f(rng, shape, dtype)`` works.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax
import jax.numpy as jnp
import numpy as np

InitializerT = Union[None, float, int, jax.Array, np.ndarray, Callable]


def per_key_rngs(base_rng: jax.Array, keys: jax.Array) -> jax.Array:
    """Fold each (possibly 64-bit) key into the base rng -> [N] keys array."""
    if keys.dtype in (jnp.int64, jnp.uint64):
        u = keys.astype(jnp.uint64)
        lo = (u & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (u >> np.uint64(32)).astype(jnp.uint32)
        return jax.vmap(
            lambda l, h: jax.random.fold_in(jax.random.fold_in(base_rng, l), h)
        )(lo, hi)
    return jax.vmap(lambda k: jax.random.fold_in(base_rng, k.astype(jnp.uint32)))(
        keys
    )


def materialize_rows(
    initializer: InitializerT,
    base_rng: jax.Array,
    keys: jax.Array,
    dim: int,
    dtype: Any,
) -> jax.Array:
    """[N, dim] initial rows for ``keys``."""
    n = keys.shape[0]
    if initializer is None:
        return jnp.zeros((n, dim), dtype)
    if callable(initializer):
        rngs = per_key_rngs(base_rng, keys)
        return jax.vmap(lambda r: initializer(r, (dim,), dtype))(rngs)
    arr = jnp.asarray(initializer, dtype)
    return jnp.broadcast_to(arr, (n, dim)).astype(dtype)


def default_value_of(initializer: InitializerT, dim: int, dtype: Any):
    """The static default row used for INFERENCE-mode misses (reference
    ``Variable.__init__`` turns the initializer into a static default tensor,
    dynamic_embedding_variable.py:719-766)."""
    if initializer is None or callable(initializer):
        return jnp.zeros((dim,), dtype)
    return jnp.broadcast_to(jnp.asarray(initializer, dtype), (dim,))
