"""Inference serving: frozen, compressed lookup tables.

Reference parity: the fp16-compressed export demo
(demo/dynamic_embedding/movielens-100k-estimator-with-fp16-compress) and
`ModelMode.INFERENCE` serving (embedding_weights.py:98-120) — at serving
time tables are read-only, optimizer slots are dead weight, and values
tolerate half precision.

`freeze()` strips the slot columns and casts values (bf16 by default —
TPU-native half type), shrinking a trained Adam table ~6x; lookups hit the
same probe path. `export_compressed` / `load_compressed` round-trip the
frozen table through sidecar files for serving fleets (the reference's
Redis-distributed-inference role is covered by SpillTier.lookup_through).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable
from recommenders_addons_tpu.ops.variable import Variable


@dataclasses.dataclass(frozen=True, eq=False)
class FrozenTable:
    """Immutable serving view of a trained table: probe + value gather only.

    ``spec.value_dtype`` reflects the compressed dtype; lookups return
    ``out_dtype`` (float32 by default) after upcasting.
    """

    spec: hashtable.TableSpec
    state: hashtable.TableState
    out_dtype: Any = jnp.float32
    default_value: float = 0.0

    def lookup(self, ids: jax.Array, return_exists: bool = False):
        flat = jnp.asarray(ids, self.spec.key_dtype).reshape(-1)
        vals, found = hashtable.lookup(
            self.spec, self.state, flat, self.default_value
        )
        vals = vals.astype(self.out_dtype).reshape(
            tuple(ids.shape) + (self.spec.dim,)
        )
        if return_exists:
            return vals, found.reshape(ids.shape)
        return vals

    def size(self) -> int:
        return int(hashtable.size(self.spec, self.state))


def freeze(var: Variable, state: hashtable.TableState,
           dtype=jnp.bfloat16, out_dtype=jnp.float32,
           default_value: float = 0.0) -> FrozenTable:
    """Strip optimizer slots, cast values to ``dtype`` (bf16/f16/f32)."""
    spec = dataclasses.replace(
        var.spec, value_dtype=dtype
    )
    w = state.dim
    values = state.values.astype(dtype)
    pad_w = hashtable._packed_width(w, 0, dtype)
    if values.shape[-1] < pad_w:
        values = jnp.concatenate(
            [values,
             jnp.zeros(values.shape[:-1] + (pad_w - w,), dtype)], axis=-1
        )
    # physical container layout (f32-bitcast for 16-bit values so the
    # Pallas DMA path serves compressed serving tables too)
    container = hashtable._container_dtype(dtype)
    lanes_rows = state.capacity * (
        pad_w // (hashtable._LANES * hashtable._pack_factor(dtype))
    )
    phys = hashtable._to_physical_rows(values, container, lanes_rows,
                                       trash_row=True)
    frozen_state = hashtable.TableState(
        key_lo=state.key_lo,
        key_hi=state.key_hi,
        rows=phys,
        scores=state.scores,
        dim=w,
        slot_names=(),
        slot_inits=(),
        key_dtype_name=state.key_dtype_name,
        value_dtype_name=np.dtype(dtype).name,
    )
    return FrozenTable(spec=spec, state=frozen_state, out_dtype=out_dtype,
                       default_value=default_value)


def export_compressed(var: Variable, state: hashtable.TableState,
                      directory: str, dtype=np.float16) -> str:
    """Write live (key, compressed-value) pairs — the reference's
    fp16-compress export. Layout matches train/checkpoint.py sidecars with
    a serving meta file."""
    os.makedirs(directory, exist_ok=True)
    k, v, m = jax.device_get(hashtable.export(var.spec, state))
    k, v, m = np.asarray(k), np.asarray(v), np.asarray(m)
    live_k, live_v = k[m], v[m].astype(dtype)
    prefix = os.path.join(directory, f"{var.name}_serving")
    live_k.tofile(prefix + "-keys")
    live_v.tofile(prefix + "-values")
    with open(prefix + "-meta.json", "w") as f:
        json.dump({
            "name": var.name,
            "dim": var.dim,
            "count": int(m.sum()),
            "key_dtype": np.dtype(var.key_dtype).name,
            "value_dtype": np.dtype(dtype).name,
        }, f)
    return prefix


def load_compressed(prefix: str, capacity: Optional[int] = None,
                    out_dtype=jnp.float32) -> FrozenTable:
    """Build a FrozenTable from an export_compressed prefix."""
    with open(prefix + "-meta.json") as f:
        meta = json.load(f)
    keys = np.fromfile(prefix + "-keys", dtype=np.dtype(meta["key_dtype"]))
    vals = np.fromfile(
        prefix + "-values", dtype=np.dtype(meta["value_dtype"])
    ).reshape(-1, meta["dim"])
    cap = capacity or max(2 * len(keys), 8)
    var = Variable(
        name=meta["name"], dim=meta["dim"], init_capacity=cap,
        key_dtype=jnp.dtype(meta["key_dtype"]),
        value_dtype=jnp.dtype(meta["value_dtype"]),
    )
    state = var.init()
    # bulk insert in chunks (values kept in the compressed dtype)
    chunk = 1 << 20
    for off in range(0, len(keys), chunk):
        state = var.upsert(
            state, jnp.asarray(keys[off:off + chunk]),
            jnp.asarray(vals[off:off + chunk]),
        )
    return FrozenTable(spec=var.spec, state=state, out_dtype=out_dtype)
