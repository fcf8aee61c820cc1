"""Minimal dense-MLP utilities for the model zoo (bf16-friendly matmuls).

The reference's demo towers are small Keras Dense stacks; here they are
explicit param pytrees so the whole train state stays functional. MXU notes:
activations/matmuls run in the params' dtype with fp32 accumulation
(``preferred_element_type``), which is the TPU-optimal layout.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def init_mlp(
    rng: jax.Array,
    sizes: Sequence[int],
    dtype=jnp.float32,
):
    """sizes = [in, h1, ..., out]; returns list of {w, b} dicts."""
    params = []
    for i in range(len(sizes) - 1):
        rng, k = jax.random.split(rng)
        fan_in = sizes[i]
        w = jax.random.normal(k, (sizes[i], sizes[i + 1]), dtype) * jnp.sqrt(
            2.0 / fan_in
        ).astype(dtype)
        params.append({"w": w, "b": jnp.zeros((sizes[i + 1],), dtype)})
    return params


def apply_mlp(params, x, activation=jax.nn.relu, final_activation=None):
    for i, layer in enumerate(params):
        x = (
            jnp.dot(x, layer["w"], preferred_element_type=jnp.float32).astype(
                x.dtype
            )
            + layer["b"]
        )
        if i < len(params) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x
