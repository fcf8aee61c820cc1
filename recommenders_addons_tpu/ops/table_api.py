"""Object-style table wrappers + backend creators (reference L2:
python/ops/{cuckoo_hashtable_ops,hkv_hashtable_ops,redis_table_ops,
dynamic_embedding_creator}.py).

The reference exposes three lookup-table classes over three native engines
(libcuckoo CPU / HKV GPU / Redis). On TPU there is ONE engine — the
set-associative score-evicting table in HBM (ops/hashtable.py) — so all
three names are honest views of it:

  * ``CuckooHashTable``: unbounded-feel config (large capacity, no score
    semantics requested) — reference cuckoo_hashtable_ops.py:147-182.
  * ``HkvHashTable``: capacity-bounded + evict-strategy scores —
    reference hkv_hashtable_ops.py:209-434.
  * ``RedisTable``: the spill-tier view — rows evicted from HBM land in the
    host-DRAM tier (ops/spill.py), the role Redis plays for the reference
    (core/kernels/redis_table_op.cc). Config fields are accepted and mapped.

These wrappers hold their ``TableState`` internally (device arrays) and
expose the reference's mutate-in-place method surface for scripting and
tests; jit-heavy code should use the functional layer directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops.variable import EvictStrategy, Variable


class BaseHashTable:
    """Stateful facade over the functional table (reference
    ``LookupInterface`` method surface: insert/find/accum/remove/clear/size/
    export/save/load)."""

    def __init__(
        self,
        key_dtype=jnp.int64,
        value_dtype=jnp.float32,
        default_value=0.0,
        dim: Optional[int] = None,
        name: str = "hashtable",
        init_size: int = 1 << 20,
        capacity: Optional[int] = None,
        evict_strategy: EvictStrategy = EvictStrategy.LRU,
        gen_scores_fn: Optional[Callable] = None,
        checkpoint: bool = True,
        **_compat,
    ):
        default_value = jnp.asarray(default_value, value_dtype)
        if dim is None:
            dim = int(default_value.size) if default_value.ndim else 1
        self.var = Variable(
            name=name,
            key_dtype=key_dtype,
            value_dtype=value_dtype,
            dim=dim,
            init_capacity=capacity or init_size,
            initializer=np.asarray(
                jnp.broadcast_to(default_value.reshape(-1), (dim,))
            ),
            evict_strategy=evict_strategy,
            gen_scores_fn=gen_scores_fn,
        )
        self.checkpoint = checkpoint
        self.state = self.var.init()
        self._step = 0

    # -- reference LookupInterface surface --------------------------------

    @property
    def key_dtype(self):
        return self.var.key_dtype

    @property
    def value_dtype(self):
        return self.var.value_dtype

    @property
    def name(self):
        return self.var.name

    @property
    def dim(self):
        return self.var.dim

    def size(self) -> int:
        return int(self.var.size(self.state))

    def insert(self, keys, values) -> None:
        """insert_or_assign (reference HashTableInsertOp)."""
        self.state = self.var.upsert(
            self.state, keys, values, step=self._bump()
        )

    upsert = insert

    def accum(self, keys, old_values, new_values, exists=None) -> None:
        self.state = self.var.accum(
            self.state, keys, old_values, new_values, exists,
            step=self._bump(),
        )

    def lookup(self, keys, dynamic_default_values=None, return_exists=False):
        """find / find_with_exists (reference HashTableFindOp)."""
        keys = jnp.asarray(keys, self.var.key_dtype)
        vals, found = self.var.lookup(
            self.state, keys, return_exists=True,
            use_init_for_missing=False,
        )
        if dynamic_default_values is not None:
            dv = jnp.asarray(
                dynamic_default_values, self.var.value_dtype
            ).reshape(keys.shape + (self.var.dim,))
            vals = jnp.where(found[..., None], vals, dv)
        if return_exists:
            return vals, found
        return vals

    def remove(self, keys) -> None:
        self.state = self.var.remove(self.state, keys)

    def clear(self) -> None:
        self.state = self.var.clear(self.state)

    def export(self):
        """Returns live (keys, values) host arrays (compacted)."""
        k, v, m = jax.device_get(self.var.export(self.state))
        m = np.asarray(m)
        return np.asarray(k)[m], np.asarray(v)[m]

    def export_keys_and_scores(self, split_size: int = 0):
        """Live (keys, scores). ``split_size > 0`` streams device->host in
        chunks of that many slots (reference hkv_hashtable_ops.py:420-434)
        instead of materializing the whole table host-side."""
        if split_size and split_size > 0:
            parts = list(self.var.export_chunked(self.state, split_size))
            if not parts:
                kdt = np.dtype(self.var.key_dtype)
                sdt = np.dtype(self.var.spec.score_dtype)
                return np.empty((0,), kdt), np.empty((0,), sdt)
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[2] for p in parts]))
        k, s, m = jax.device_get(
            self.var.export_keys_and_scores(self.state)
        )
        m = np.asarray(m)
        return np.asarray(k)[m], np.asarray(s)[m]

    def save_to_file_system(self, dirpath: str, proc_size=1, proc_rank=0,
                            buffer_size=4 * 1024 * 1024, **_):
        from recommenders_addons_tpu.train import checkpoint as ckpt

        return ckpt.save_dynamic_embedding(
            self.var, self.state, dirpath,
            proc_size=proc_size, proc_rank=proc_rank,
            buffer_size=buffer_size,
        )

    def load_from_file_system(self, dirpath: str, buffer_size=4 * 1024 * 1024,
                              **_):
        from recommenders_addons_tpu.train import checkpoint as ckpt

        self.state = ckpt.load_dynamic_embedding(
            self.var, self.state, dirpath, buffer_size=buffer_size
        )

    def grow(self, new_capacity: int, chunk_size: int = 1 << 16) -> None:
        """Rebuild into a larger table preserving rows/slots/scores
        (Variable.grow; the explicit analog of libcuckoo's resize)."""
        self.var, self.state = self.var.grow(
            self.state, new_capacity, chunk_size=chunk_size
        )

    def _bump(self) -> int:
        self._step += 1
        return self._step


class CuckooHashTable(BaseHashTable):
    """Reference ``de.CuckooHashTable`` (cuckoo_hashtable_ops.py:64-572).

    The reference's CPU cuckoo table grows on insert and never evicts
    (libcuckoo resize); this view mirrors that with ``auto_grow`` —
    when the load factor crosses ``grow_threshold`` after an insert, the
    table doubles (a host-driven rebuild; see ``Variable.grow``). Pass
    ``auto_grow=False`` for the bounded HKV-style behavior.
    """

    def __init__(self, *args, auto_grow: bool = True,
                 grow_threshold: float = 0.85, **kw):
        super().__init__(*args, **kw)
        self.auto_grow = auto_grow
        self.grow_threshold = float(grow_threshold)
        self._since_check = 0

    def insert(self, keys, values) -> None:
        if not self.auto_grow:
            return super().insert(keys, values)
        # capture rows displaced by bucket eviction AND inputs dropped by a
        # full bucket: with auto_grow the table must never lose a key, the
        # libcuckoo guarantee (cuckoohash_map.hh resize-on-insert)
        self.state, ev = self.var.upsert(
            self.state, keys, values, step=self._bump(),
            return_evicted=True,
        )
        empty = int(self.var.empty_key)
        evk = np.asarray(jax.device_get(ev["keys"]))
        drk = np.asarray(jax.device_get(ev["dropped_keys"]))
        lost = bool((evk != empty).any() or (drk != empty).any())

        # proactive doubling at high load factor (amortized size() checks)
        self._since_check += int(np.size(np.asarray(keys)))
        cap = self.var.spec.capacity
        if lost or self._since_check >= max(cap // 16, 1):
            self._since_check = 0
            if lost or self.size() >= self.grow_threshold * cap:
                self.grow(max(cap * 2, 2 * self.var.bucket_size))

        if lost:
            m = evk != empty
            if m.any():  # displaced rows keep their values/slots/scores
                ev_h = jax.device_get(ev)
                self.state = self.var.import_batch(
                    self.state, evk[m], np.asarray(ev_h["values"])[m],
                    scores=np.asarray(ev_h["scores"])[m],
                    slot_rows={
                        n: np.asarray(c)[m]
                        for n, c in ev_h["slots"].items()
                    } or None,
                )
            dm = drk != empty
            if dm.any():  # dropped inputs re-insert into the grown table
                self.state = self.var.upsert(
                    self.state, drk[dm],
                    np.asarray(jax.device_get(ev["dropped_values"]))[dm],
                    step=self._step,
                )

    upsert = insert


class HkvHashTable(BaseHashTable):
    """Reference ``de.HkvHashTable`` (hkv_hashtable_ops.py): capacity-bounded
    with score eviction; accepts the HkvHashTableConfig knobs."""

    def __init__(self, *args, init_capacity=1 << 20, max_capacity=None,
                 **kwargs):
        kwargs.setdefault("capacity", max_capacity or init_capacity)
        super().__init__(*args, **kwargs)


class RedisTable(BaseHashTable):
    """Reference ``de.RedisTable`` (redis_table_ops.py:589): network KV for
    shared serving. TPU-native role: the host-DRAM spill tier (SURVEY.md
    §2.1) — a capacity-bounded HBM table whose evictions overflow to host
    memory via ops/spill.py."""

    def __init__(self, *args, config=None, **kwargs):
        if config is not None:
            kwargs.setdefault("name", getattr(config, "model_tag", "redis"))
        super().__init__(*args, **kwargs)


# ---------------------------------------------------------------------------
# configs + creators (reference dynamic_embedding_creator.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CuckooHashTableConfig:
    """Reference creator.py:80-86 (empty marker config)."""


@dataclasses.dataclass
class HkvHashTableConfig:
    """Reference creator.py:149-169."""

    init_capacity: int = 1024 * 1024
    max_capacity: int = 1024 * 1024
    max_hbm_for_values: int = 1024 * 1024 * 1024
    evict_strategy: EvictStrategy = EvictStrategy.LRU
    step_per_epoch: int = 0
    gen_scores_fn: Optional[Callable] = None
    reserved_key_start_bit: int = 0


@dataclasses.dataclass
class RedisTableConfig:
    """Reference creator.py:185-243 (JSON config params accepted,
    redis_connection_params subsumed by the spill tier)."""

    redis_config_abs_dir: Optional[str] = None
    redis_config_abs_dir_env: Optional[str] = None
    model_tag: str = "test"


class KVCreator:
    """Backend factory (reference creator.py:36-77): carries a config +
    saver and builds the table/variable kwargs."""

    table_cls = CuckooHashTable

    def __init__(self, config=None, saver=None):
        self.config = config
        self.saver = saver

    @staticmethod
    def _hbm_capacity_bound(cfg, dim, value_dtype) -> Optional[int]:
        """``max_hbm_for_values`` -> a key-capacity bound (the reference
        caps HKV's HBM value bytes and overflows the rest to host memory,
        lookup_table_op_hkv.h:428-513; here the cap bounds the HBM table
        and the spill tier holds the overflow)."""
        if not isinstance(cfg, HkvHashTableConfig) or not dim:
            return None
        if not cfg.max_hbm_for_values:
            return None
        row_bytes = int(dim) * np.dtype(value_dtype).itemsize
        return max(int(cfg.max_hbm_for_values) // row_bytes, 1)

    def create(self, key_dtype=jnp.int64, value_dtype=jnp.float32,
               default_value=0.0, name="table", dim=None, **kwargs):
        cfg = self.config
        if isinstance(cfg, HkvHashTableConfig):
            cap = cfg.max_capacity
            bound = self._hbm_capacity_bound(cfg, dim, value_dtype)
            if bound is not None:
                cap = min(cap, bound)
            kwargs.setdefault("capacity", cap)
            kwargs.setdefault("evict_strategy", cfg.evict_strategy)
            if cfg.gen_scores_fn is not None:
                kwargs.setdefault("gen_scores_fn", cfg.gen_scores_fn)
                kwargs.setdefault(
                    "evict_strategy", EvictStrategy.CUSTOMIZED
                )
        return self.table_cls(
            key_dtype=key_dtype, value_dtype=value_dtype,
            default_value=default_value, name=name, dim=dim, **kwargs,
        )

    def get_variable_kwargs(self, dim=None,
                            value_dtype=jnp.float32) -> Dict[str, Any]:
        """Map the backend config onto de.Variable kwargs (used by
        Variable(kv_creator=...) call sites)."""
        cfg = self.config
        out: Dict[str, Any] = {}
        if isinstance(cfg, HkvHashTableConfig):
            out["init_capacity"] = cfg.init_capacity
            out["max_capacity"] = cfg.max_capacity
            bound = self._hbm_capacity_bound(cfg, dim, value_dtype)
            if bound is not None:
                out["max_capacity"] = min(cfg.max_capacity, bound)
                out["init_capacity"] = min(cfg.init_capacity, bound)
            out["evict_strategy"] = cfg.evict_strategy
            if cfg.gen_scores_fn is not None:
                out["gen_scores_fn"] = cfg.gen_scores_fn
        return out


class CuckooHashTableCreator(KVCreator):
    table_cls = CuckooHashTable


class HkvHashTableCreator(KVCreator):
    table_cls = HkvHashTable


class RedisTableCreator(KVCreator):
    table_cls = RedisTable


@dataclasses.dataclass
class FileSystemSaver:
    """Reference creator.py:365-516: diverts table payloads to sidecar KV
    files. In this design that IS the checkpoint path
    (train/checkpoint.py); the class records the multi-process layout."""

    proc_size: int = 1
    proc_rank: int = 0
    save_path: Optional[str] = None
    buffer_size: int = 4 * 1024 * 1024

    def save(self, var_or_sharded, state, directory=None, global_step=None):
        from recommenders_addons_tpu.train import checkpoint as ckpt

        return ckpt.save_dynamic_embedding(
            var_or_sharded, state, directory or self.save_path,
            global_step=global_step,
            proc_size=self.proc_size, proc_rank=self.proc_rank,
            buffer_size=self.buffer_size,
        )

    def load(self, var_or_sharded, state, directory=None, global_step=None):
        from recommenders_addons_tpu.train import checkpoint as ckpt

        return ckpt.load_dynamic_embedding(
            var_or_sharded, state, directory or self.save_path,
            global_step=global_step, buffer_size=self.buffer_size,
        )


class DynamicEmbeddingSaver(FileSystemSaver):
    """Alias (reference creator.py:365)."""
