"""KV-native checkpointing for dynamic-embedding tables.

Re-design of the reference's richest subsystem (SURVEY.md §5): sidecar KV
files next to the checkpoint, streamed per shard, with elastic re-sharding on
load. Reference paths: FileSystemSaver (dynamic_embedding_creator.py:365-516),
the streaming dump/load C++ ops (cuckoo_hashtable_op.cc:310-391, 408+),
elastic re-partitioned restore (dynamic_embedding_variable.py:232-450),
`DECheckpoint` multi-process choreography (train/checkpoint.py:117-406).

Layout (naming contract mirrors the reference's
``<var>_mht_<i+1>of<n>_rank<r>_size<s>`` so operators can eyeball shards):

    <directory>/TFRADynamicEmbedding[-<global_step>]/
        <var_name>/
            meta.json
            <var_name>_mht_<i+1>of<n>_rank<r>_size<s>-keys     raw LE binary
            ..._-values, -scores, -slots.<slot_name>

Save = device->host DMA of the shard's arrays, host-side compaction of live
rows, buffered writes, tmp-file + atomic rename (same crash-safety discipline
as cuckoo_hashtable_op.cc:310-391). Load = read ALL shard files found (any
<n>, any rank layout) and bulk-insert through the owner-routing
``import_batch`` — re-sharding to the current topology is automatic because
routing is a function of the key, not of the file layout.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable
from recommenders_addons_tpu.ops.variable import Variable
from recommenders_addons_tpu.parallel.sharded import ShardedVariable

DE_DIR_NAME = "TFRADynamicEmbedding"
DEFAULT_BUFFER_KEYS = 4 * 1024 * 1024  # reference buffer default
                                       # (dynamic_embedding_variable.py:1016)


def _resolve_buffer(buffer_size: Optional[int]) -> int:
    """None -> TFRA_TPU_CKPT_BUFFER_KEYS env (utils.config)."""
    if buffer_size is not None:
        return buffer_size
    from recommenders_addons_tpu.utils.config import env_config

    return env_config().checkpoint_buffer_keys


def _resolve_dir(directory: Optional[str]) -> str:
    """None -> TFRA_SAVED_KV env override (reference
    cuckoo_hashtable_ops.py:440)."""
    if directory is not None:
        return directory
    from recommenders_addons_tpu.utils.config import env_config

    d = env_config().saved_kv_dir
    if d is None:
        raise ValueError(
            "no checkpoint directory given and TFRA_SAVED_KV is unset"
        )
    return d

_SHARD_RE = re.compile(
    r"_mht_(\d+)of(\d+)_rank(\d+)_size(\d+)-keys$"
)


def _de_dir(directory: str, global_step: Optional[int]) -> str:
    name = DE_DIR_NAME if global_step is None else (
        f"{DE_DIR_NAME}-{int(global_step)}"
    )
    return os.path.join(directory, name)


def _atomic_write(path: str, write_fn):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_fn(f)
    os.replace(tmp, path)


def _native_dump(path: str, arr: np.ndarray, sel: np.ndarray,
                 buffer_rows: int) -> bool:
    """Buffered gathered row dump through the C++ writer (role of the
    reference's streaming SaveToFileSystem op,
    cuckoo_hashtable_op.cc:310-391). Returns False to use the numpy path."""
    try:
        from recommenders_addons_tpu.native import get_lib
    except ImportError:
        return False
    lib = get_lib()
    if lib is None:
        return False
    import ctypes

    arr = np.ascontiguousarray(arr)
    sel = np.ascontiguousarray(sel, np.int64)
    row_bytes = arr.dtype.itemsize * int(np.prod(arr.shape[1:] or (1,)))
    tmp = path + ".tmp"
    n = lib.hkv_write_gathered(
        tmp.encode(), arr.ctypes.data_as(ctypes.c_void_p), row_bytes,
        sel.ctypes.data_as(ctypes.c_void_p), len(sel),
        max(int(buffer_rows), 1),
    )
    if n != len(sel):
        if os.path.exists(tmp):
            os.remove(tmp)
        return False
    os.replace(tmp, path)
    return True


def _var_of(v):
    return v.var if isinstance(v, ShardedVariable) else v


def _dump_rows(path: str, arr: np.ndarray, sel: np.ndarray,
               buffer_size: int):
    """Buffered gathered-row dump: native writer when built, numpy else."""
    if _native_dump(path, arr, sel, buffer_size):
        return

    def w(f):
        for off in range(0, len(sel), buffer_size):
            f.write(np.ascontiguousarray(
                arr[sel[off:off + buffer_size]]).tobytes())

    _atomic_write(path, w)


def _tier_store(tier_or_store):
    """Accept a SpillTier/ShardedSpillTier/HybridTable or a raw store."""
    if hasattr(tier_or_store, "export_all"):
        return tier_or_store
    if hasattr(tier_or_store, "tier"):  # HybridTable
        return tier_or_store.tier.store
    return tier_or_store.store  # SpillTier / ShardedSpillTier


def save_tier(
    tier,
    var: Variable,
    vdir: str,
    proc_size: int = 1,
    proc_rank: int = 0,
    buffer_size: Optional[int] = None,
) -> int:
    """Dump a spill tier's rows as sidecar files under ``<vdir>/tier/``.

    The missing half of the terabyte-table checkpoint: rows demoted to the
    host store (or the sharded network tier) persist alongside the HBM
    shards, with scores and optimizer slots, so a cold restore serves
    every key. Reference anchors: HKV's score-aware dump_to_file
    (lookup_table_op_hkv.h:602-660) and Redis RDB persistence
    (redis_connection_util.hpp:330-480). Returns the number of rows saved.
    """
    buffer_size = _resolve_buffer(buffer_size)
    store = _tier_store(tier)
    if proc_rank != 0 and getattr(store, "is_shared", False):
        # one network store serves ALL processes and export_all returns
        # the full union: rank 0 dumps it exactly once (otherwise the
        # checkpoint holds proc_size duplicate copies — ADVICE r4)
        return 0
    keys, values, scores, slots = store.export_all()
    keys = np.asarray(keys, np.dtype(var.key_dtype)).reshape(-1)
    tdir = os.path.join(vdir, "tier")
    os.makedirs(tdir, exist_ok=True)
    prefix = os.path.join(
        tdir, f"{var.name}_mht_tier_rank{proc_rank}_size{proc_size}")
    sel = np.arange(len(keys))
    _dump_rows(prefix + "-keys", keys, sel, buffer_size)
    _dump_rows(prefix + "-values",
               np.asarray(values, np.dtype(var.value_dtype)).reshape(
                   -1, var.dim), sel, buffer_size)
    _dump_rows(prefix + "-scores",
               np.asarray(scores).astype(np.dtype(var.spec.score_dtype)),
               sel, buffer_size)
    for name in sorted(slots):
        _dump_rows(prefix + f"-slots.{name}",
                   np.asarray(slots[name],
                              np.dtype(var.value_dtype)).reshape(
                       -1, var.dim), sel, buffer_size)
    return len(keys)


def load_tier(
    tier,
    var: Variable,
    vdir: str,
    proc_size: Optional[int] = None,
    proc_rank: Optional[int] = None,
    num_shards: Optional[int] = None,
    buffer_size: Optional[int] = None,
) -> int:
    """Restore tier sidecar files (any saved rank layout) into a store.

    Elastic partitioning over the CURRENT processes:

    * shared network stores — rows split by ``shard_of_np(key,
      proc_size)`` so the union arrives exactly once, loaded in parallel;
    * per-process LOCAL stores — rows must land on the process whose
      DEVICE SHARDS own them at runtime (demote places a row in the store
      of the process owning ``shard_of(key, num_shards)``; a plain
      ``shard_of_np(key, proc_size)`` split does NOT match that placement
      and would strand rows where promote never finds them — ADVICE r4).
      Pass ``num_shards`` (the sharded table's shard count; mesh axes
      place each process's devices contiguously, which
      ``sharded._owner_blocks_to_global`` asserts).

    Returns the number of rows this process loaded.
    """
    from recommenders_addons_tpu.ops import hashing

    tdir = os.path.join(vdir, "tier")
    if not os.path.isdir(tdir):
        return 0
    if proc_size is None:
        proc_size = jax.process_count()
    if proc_rank is None:
        proc_rank = jax.process_index()
    store = _tier_store(tier)
    shared = getattr(store, "is_shared", False)
    buffer_size = _resolve_buffer(buffer_size)
    loaded = 0
    # streamed: host memory stays ~buffer_size rows (VERDICT r4 missing
    # #1 — the previous np.fromfile-everything read materialized the
    # whole tier in every process's RAM)
    for keys, values, scores, slots in _iter_shard_chunks(
            tdir, var, buffer_size):
        if proc_size > 1:
            if not shared and num_shards and num_shards % proc_size == 0:
                spp = num_shards // proc_size  # device shards per process
                mine = (hashing.shard_of_np(
                    keys.astype(np.int64), num_shards) // spp) == proc_rank
            else:
                mine = hashing.shard_of_np(
                    keys.astype(np.int64), proc_size) == proc_rank
            keys, values, scores = keys[mine], values[mine], scores[mine]
            slots = {n: c[mine] for n, c in slots.items()}
        store.put(keys, values, scores, slots or None)
        loaded += len(keys)
    return loaded


def _host_shards(var_or_sharded, state):
    """Yield (shard_idx, num_shards, host TableState-of-numpy) per shard.

    Multi-host safe: only this process's addressable shards are pulled
    (each process saves its own shards — the reference's per-rank save,
    dynamic_embedding_variable.py:1009-1052)."""
    if not isinstance(var_or_sharded, ShardedVariable):
        yield 0, 1, jax.device_get(state)
        return
    n = var_or_sharded.num_shards
    leaves, treedef = jax.tree_util.tree_flatten(state)
    if not hasattr(leaves[0], "addressable_shards") or (
        len(leaves[0].addressable_shards) == 0
    ):
        host = jax.device_get(state)
        for i in range(n):
            yield i, n, jax.tree.map(lambda x: x[i], host)
        return
    per_leaf = []
    shard_ids = None
    for leaf in leaves:
        by_id = {}
        for s in leaf.addressable_shards:
            idx0 = s.index[0]
            start = idx0.start if isinstance(idx0, slice) else int(idx0)
            sid = int(start or 0)
            by_id[sid] = np.asarray(s.data)[0]  # drop the leading axis
        per_leaf.append(by_id)
        ids = set(by_id)
        shard_ids = ids if shard_ids is None else (shard_ids & ids)
    for sid in sorted(shard_ids):
        yield sid, n, jax.tree_util.tree_unflatten(
            treedef, [bl[sid] for bl in per_leaf]
        )


def save_dynamic_embedding(
    var_or_sharded,
    state: hashtable.TableState,
    directory: Optional[str] = None,
    global_step: Optional[int] = None,
    proc_size: int = 1,
    proc_rank: int = 0,
    buffer_size: Optional[int] = None,
    tier=None,
) -> str:
    """Write one variable's KV (+scores, +optimizer slots) sidecar files.

    Multi-host contract (reference Variable.save_to_file_system,
    dynamic_embedding_variable.py:1009-1052): each process saves only ITS
    shards, tagged with rank/size; the directory is shared.
    ``directory=None`` falls back to the ``TFRA_SAVED_KV`` env override;
    ``buffer_size=None`` to ``TFRA_TPU_CKPT_BUFFER_KEYS``.
    ``tier``: a SpillTier/ShardedSpillTier/HybridTable or raw host store —
    its demoted rows are dumped alongside the HBM shards (see
    :func:`save_tier`), so a hybrid-table checkpoint loses nothing.
    Returns the variable's directory.
    """
    directory = _resolve_dir(directory)
    buffer_size = _resolve_buffer(buffer_size)
    var = _var_of(var_or_sharded)
    vdir = os.path.join(_de_dir(directory, global_step), var.name)
    os.makedirs(vdir, exist_ok=True)

    slot_names = sorted(state.slot_names)
    total_live = 0
    shard_files = []
    for i, n, st in _host_shards(var_or_sharded, state):
        mask = np.asarray(st.keys) != var.spec.empty_key
        live = int(mask.sum())
        total_live += live
        prefix = os.path.join(
            vdir,
            f"{var.name}_mht_{i + 1}of{n}_rank{proc_rank}_size{proc_size}",
        )
        idx = np.nonzero(mask)[0]

        _dump_rows(prefix + "-keys", np.asarray(st.keys), idx, buffer_size)
        _dump_rows(prefix + "-values", np.asarray(st.values), idx,
                   buffer_size)
        _dump_rows(prefix + "-scores", np.asarray(st.scores), idx,
                   buffer_size)
        for s in slot_names:
            _dump_rows(prefix + f"-slots.{s}", np.asarray(st.slots[s]),
                       idx, buffer_size)
        shard_files.append(os.path.basename(prefix))

    tier_rows = 0
    if tier is not None:
        tier_rows = save_tier(tier, var, vdir, proc_size=proc_size,
                              proc_rank=proc_rank, buffer_size=buffer_size)

    meta = {
        "name": var.name,
        "dim": var.dim,
        "key_dtype": np.dtype(var.key_dtype).name,
        "value_dtype": np.dtype(var.value_dtype).name,
        "score_dtype": np.dtype(var.spec.score_dtype).name,
        "slot_names": slot_names,
        "slot_inits": dict(state.slot_inits),
        "num_shards": (
            var_or_sharded.num_shards
            if isinstance(var_or_sharded, ShardedVariable) else 1
        ),
        "live_keys_this_rank": total_live,
        "tier_keys_this_rank": tier_rows,
        "proc_rank": proc_rank,
        "proc_size": proc_size,
    }
    _atomic_write(
        os.path.join(vdir, f"meta_rank{proc_rank}.json"),
        lambda f: f.write(json.dumps(meta, indent=1).encode()),
    )
    return vdir


def _scan_shard_files(vdir: str, var: Variable):
    """Inventory the shard file sets without reading row data.

    Returns ``(prefixes, slot_names, rows_per_prefix)``. ``slot_names``
    is the slot set present for EVERY prefix (partial coverage means the
    optimizer restarts cold for that slot, as before).
    """
    key_files = sorted(glob.glob(os.path.join(vdir, "*-keys")))
    if not key_files:
        raise FileNotFoundError(f"no KV shard files under {vdir}")
    kdt = np.dtype(var.key_dtype)
    prefixes = [kf[: -len("-keys")] for kf in key_files]
    rows = [os.path.getsize(kf) // kdt.itemsize for kf in key_files]
    slot_sets = [
        {sf.rsplit("-slots.", 1)[1] for sf in glob.glob(p + "-slots.*")}
        for p in prefixes
    ]
    common = set.intersection(*slot_sets) if slot_sets else set()
    return prefixes, sorted(common), rows


class _ShardReader:
    """Lockstep chunked reader over one shard prefix's component files
    (keys/values/scores/slots read ``m`` rows at a time — the restore
    path's memory stays bounded by the chunk size, matching the
    reference's 4Mi-key buffered restore loop,
    dynamic_embedding_variable.py:232-357)."""

    def __init__(self, prefix: str, var: Variable, slot_names):
        self.var = var
        self.kdt = np.dtype(var.key_dtype)
        self.vdt = np.dtype(var.value_dtype)
        self.sdt = np.dtype(var.spec.score_dtype)
        self.remaining = os.path.getsize(prefix + "-keys") // (
            self.kdt.itemsize)
        self._kf = open(prefix + "-keys", "rb")
        self._vf = open(prefix + "-values", "rb")
        sc_path = prefix + "-scores"
        self._sf = open(sc_path, "rb") if os.path.exists(sc_path) else None
        self._slfs = {
            nm: open(prefix + f"-slots.{nm}", "rb") for nm in slot_names
        }

    def read(self, m: int):
        """Next ``min(m, remaining)`` rows -> (keys, values, scores,
        slots); empty arrays once exhausted."""
        d = self.var.dim
        m = min(m, self.remaining)
        self.remaining -= m
        k = np.fromfile(self._kf, dtype=self.kdt, count=m)
        v = np.fromfile(self._vf, dtype=self.vdt, count=m * d
                        ).reshape(m, d)
        sc = (np.fromfile(self._sf, dtype=self.sdt, count=m)
              if self._sf is not None else np.ones((m,), self.sdt))
        sl = {
            nm: np.fromfile(f, dtype=self.vdt, count=m * d).reshape(m, d)
            for nm, f in self._slfs.items()
        }
        return k, v, sc, sl

    def close(self):
        for f in ([self._kf, self._vf]
                  + ([self._sf] if self._sf else [])
                  + list(self._slfs.values())):
            f.close()


def _iter_shard_chunks(vdir: str, var: Variable, chunk_rows: int):
    """Yield (keys [m], values [m, D], scores [m], slots {name: [m, D]})
    across every shard file set, at most ``chunk_rows`` rows per chunk."""
    prefixes, slot_names, _ = _scan_shard_files(vdir, var)
    for p in prefixes:
        r = _ShardReader(p, var, slot_names)
        try:
            while r.remaining:
                yield r.read(chunk_rows)
        finally:
            r.close()


def _read_shard_files(vdir: str, var: Variable):
    """Read every shard file set fully into host arrays (any topology).

    Returns (keys [N], values [N, D], scores [N], slots {name: [N, D]}).
    Used only by the small no-tier merge fallback; the restore paths
    stream through :func:`_iter_shard_chunks` instead.
    """
    keys, values, scores = [], [], []
    slots: Dict[str, list] = {}
    for k, v, sc, sl in _iter_shard_chunks(vdir, var, 1 << 22):
        keys.append(k)
        values.append(v)
        scores.append(sc)
        for nm, c in sl.items():
            slots.setdefault(nm, []).append(c)
    return (
        np.concatenate(keys),
        np.concatenate(values, axis=0),
        np.concatenate(scores),
        {nm: np.concatenate(cs, axis=0) for nm, cs in slots.items()},
    )


def _direct_shard_layout(prefixes, num_shards: int):
    """Shard-index -> prefix map when the saved layout EXACTLY matches the
    current topology (one file set per shard, same shard count) — the
    re-partitioning pass can then be skipped and each shard's rows load
    straight into it (reference direct per-shard load,
    dynamic_embedding_variable.py:360-450). None when any file deviates."""
    by_idx = {}
    for p in prefixes:
        m = _SHARD_RE.search(p + "-keys")
        if not m:
            return None
        i, n = int(m.group(1)) - 1, int(m.group(2))
        if n != num_shards or i in by_idx:
            return None
        by_idx[i] = p
    if set(by_idx) != set(range(num_shards)):
        return None
    return by_idx


# test/diagnostic pin: did the last load_dynamic_embedding take the
# direct (topology-matched, no re-partitioning) per-shard path?
LAST_RESTORE_USED_DIRECT = False


def _ensure_restore_slots(var_or_sharded, state, vdir, slot_names):
    """Add the checkpoint's slot columns (fills from the saved meta)."""
    if not slot_names:
        return state
    slot_inits: Dict[str, float] = {}
    for mf in glob.glob(os.path.join(vdir, "meta_rank*.json")):
        with open(mf) as f:
            slot_inits.update(json.load(f).get("slot_inits", {}))
    specs = {n: float(slot_inits.get(n, 0.0)) for n in slot_names}
    if isinstance(var_or_sharded, ShardedVariable):
        return var_or_sharded.ensure_slot_columns(state, specs)
    for n, fill in specs.items():
        state = hashtable.with_slot(state, n, fill)
    return state


def _import_streamed(var_or_sharded, state, vdir, buffer_size):
    """Chunked elastic import of every shard file set under ``vdir``."""
    var = _var_of(var_or_sharded)
    sharded = isinstance(var_or_sharded, ShardedVariable)
    for keys, values, scores, slots in _iter_shard_chunks(
            vdir, var, buffer_size):
        if sharded:
            state = var_or_sharded.import_host_arrays(
                state, keys, values, scores=scores,
                slot_rows=slots or None, buffer_size=buffer_size,
            )
        else:
            state = var_or_sharded.import_batch(
                state, keys, values, scores=scores,
                slot_rows=slots or None,
            )
    return state


def _import_direct_sharded(sv: ShardedVariable, state, by_idx, slot_names,
                           chunk_rows: int):
    """Topology-matched restore: stream each saved shard file straight
    into ITS shard (owner-partitioned blocks, no host-side re-sort, no
    routing) — the reference's direct per-shard load
    (dynamic_embedding_variable.py:360-450). Valid because shard files
    are written from the shard's own rows (save_dynamic_embedding), so
    every key in file ``i`` already satisfies ``shard_of(key, S) == i``."""
    var = sv.var
    s = sv.num_shards
    d = var.dim
    kdt = np.dtype(var.key_dtype)
    vdt = np.dtype(var.value_dtype)
    sdt = np.dtype(var.spec.score_dtype)
    empty = var.spec.empty_key
    readers = {i: _ShardReader(p, var, slot_names)
               for i, p in by_idx.items()}
    m_chunk = max(1, chunk_rows // s)  # total staging ~chunk_rows rows
    try:
        while any(r.remaining for r in readers.values()):
            m = min(m_chunk,
                    max(r.remaining for r in readers.values()))
            k_blk = np.full((s, m), empty, kdt)
            v_blk = np.zeros((s, m, d), vdt)
            s_blk = np.zeros((s, m), sdt)
            sl_blk = {nm: np.zeros((s, m, d), vdt) for nm in slot_names}
            for i, r in readers.items():
                k, v, sc, sl = r.read(m)
                w = len(k)
                if not w:
                    continue
                k_blk[i, :w] = k
                v_blk[i, :w] = v
                s_blk[i, :w] = sc
                for nm, c in sl.items():
                    sl_blk[nm][i, :w] = c
            state = sv.import_local(
                state, k_blk, v_blk, scores=s_blk,
                slot_rows=sl_blk or None,
            )
    finally:
        for r in readers.values():
            r.close()
    return state


def load_dynamic_embedding(
    var_or_sharded,
    state: hashtable.TableState,
    directory: Optional[str] = None,
    global_step: Optional[int] = None,
    buffer_size: Optional[int] = None,
    tier=None,
) -> hashtable.TableState:
    """Restore a variable's rows from sidecar files into ``state``.

    Elastic: the saved shard count / rank layout is irrelevant — every
    (key, value, score, slots) tuple is re-routed to its current owner
    (reference re-partitioned load, dynamic_embedding_variable.py:360-450).
    STREAMED: files are read in ``buffer_size``-row chunks (keys, values,
    scores, and slot files in lockstep), so host memory stays bounded by
    the buffer regardless of table size (the reference's 4Mi-key buffered
    insert loop, dynamic_embedding_variable.py:232-357); when the saved
    topology exactly matches the current shard count, each shard file
    streams DIRECTLY into its shard with no re-partitioning
    (:func:`_direct_shard_layout`).

    ``tier``: restores the checkpoint's demoted-row dump (if present) into
    that store (see :func:`load_tier`). With ``tier=None`` and tier files
    present, the tier rows are merged into the HBM import instead — rows
    beyond the HBM capacity are dropped with a warning (pass a tier to
    keep everything).
    """
    global LAST_RESTORE_USED_DIRECT
    directory = _resolve_dir(directory)
    buffer_size = _resolve_buffer(buffer_size)
    var = _var_of(var_or_sharded)
    vdir = os.path.join(_de_dir(directory, global_step), var.name)
    prefixes, slot_names, rows_per = _scan_shard_files(vdir, var)

    merge_tier = False
    tdir = os.path.join(vdir, "tier")
    if tier is not None:
        load_tier(
            tier, var, vdir,
            num_shards=(var_or_sharded.num_shards
                        if isinstance(var_or_sharded, ShardedVariable)
                        else 1),
            buffer_size=buffer_size,
        )
    elif os.path.isdir(tdir):
        _, t_slots, t_rows_per = _scan_shard_files(tdir, var)
        if sum(t_rows_per):
            import warnings

            warnings.warn(
                f"checkpoint for '{var.name}' carries {sum(t_rows_per)} "
                "spill-tier rows but no tier was passed to "
                "load_dynamic_embedding; merging them into the HBM table "
                "— rows beyond its capacity will be dropped")
            merge_tier = True
            slot_names = sorted(set(slot_names) | set(t_slots))

    state = _ensure_restore_slots(var_or_sharded, state, vdir, slot_names)
    LAST_RESTORE_USED_DIRECT = False
    if sum(rows_per) > 0:
        by_idx = None
        if isinstance(var_or_sharded, ShardedVariable):
            by_idx = _direct_shard_layout(
                prefixes, var_or_sharded.num_shards)
        if by_idx is not None:
            state = _import_direct_sharded(
                var_or_sharded, state, by_idx, slot_names, buffer_size)
            LAST_RESTORE_USED_DIRECT = True
        else:
            state = _import_streamed(
                var_or_sharded, state, vdir, buffer_size)
    if merge_tier:
        state = _import_streamed(var_or_sharded, state, tdir, buffer_size)
    return state


def latest_checkpoint(directory: str) -> Optional[int]:
    """Largest global_step among TFRADynamicEmbedding-<step> dirs (None if
    only the unstepped dir exists; raises if nothing is there)."""
    steps = []
    bare = False
    for d in glob.glob(os.path.join(directory, DE_DIR_NAME + "*")):
        base = os.path.basename(d)
        if base == DE_DIR_NAME:
            bare = True
        else:
            m = re.match(re.escape(DE_DIR_NAME) + r"-(\d+)$", base)
            if m:
                steps.append(int(m.group(1)))
    if steps:
        return max(steps)
    if bare:
        return None
    raise FileNotFoundError(f"no {DE_DIR_NAME}* under {directory}")


class DECheckpoint:
    """Object-based checkpoint for a mixed train state: dense pytrees go to
    an .npz, dynamic-embedding tables to KV sidecar dirs (the reference's
    ``de.train.DECheckpoint``, train/checkpoint.py:117-406, minus the
    Horovod choreography — multi-host JAX writes per-process shards to a
    shared filesystem with rank-tagged names, no broadcast needed).

    Usage::

        ckpt = DECheckpoint(dense=params, user=(user_var, None))
        ckpt.save(dir, state={'user': user_state, 'dense': params}, step=100)
        restored = ckpt.restore(dir, state={...})   # same keys
    """

    def __init__(self, **objects):
        # values: de.Variable / ShardedVariable (table entries), a
        # (Variable/ShardedVariable, tier) tuple (hybrid table: the tier's
        # demoted rows checkpoint alongside the HBM shards), or anything
        # else (dense pytree entries)
        self._objects = objects

    @staticmethod
    def _split_entry(v):
        """-> (table_or_None, tier_or_None) for a checkpoint entry."""
        if isinstance(v, (Variable, ShardedVariable)):
            return v, None
        if (isinstance(v, tuple) and len(v) == 2
                and isinstance(v[0], (Variable, ShardedVariable))):
            return v[0], v[1]
        return None, None

    def _is_table(self, v) -> bool:
        return self._split_entry(v)[0] is not None

    def save(self, directory: str, state: Dict[str, Any],
             step: Optional[int] = None,
             proc_size: int = 1, proc_rank: int = 0,
             keep: Optional[int] = None) -> str:
        os.makedirs(directory, exist_ok=True)
        dense = {}
        for name, obj in self._objects.items():
            if self._is_table(obj):
                table, tier = self._split_entry(obj)
                save_dynamic_embedding(
                    table, state[name], directory, global_step=step,
                    proc_size=proc_size, proc_rank=proc_rank, tier=tier,
                )
            else:
                leaves, treedef = jax.tree_util.tree_flatten(
                    jax.device_get(state[name])
                )
                dense[name] = {
                    "treedef": str(treedef),
                    "leaves": [np.asarray(l) for l in leaves],
                }
        if proc_rank == 0 and dense:
            suffix = "" if step is None else f"-{int(step)}"
            flat = {}
            for name, rec in dense.items():
                flat[f"{name}::treedef"] = np.asarray(rec["treedef"])
                for i, leaf in enumerate(rec["leaves"]):
                    flat[f"{name}::{i}"] = leaf
            path = os.path.join(directory, f"dense{suffix}.npz")
            tmp = path + ".tmp.npz"
            np.savez(tmp, **flat)
            os.replace(tmp, path)
        if keep is not None and proc_rank == 0:
            self._sweep(directory, keep)
        return directory

    def restore(self, directory: str, state: Dict[str, Any],
                step: Optional[int] = "latest") -> Dict[str, Any]:
        if step == "latest":
            step = latest_checkpoint(directory)
        out = dict(state)
        suffix = "" if step is None else f"-{int(step)}"
        dense_path = os.path.join(directory, f"dense{suffix}.npz")
        dense = np.load(dense_path) if os.path.exists(dense_path) else None
        for name, obj in self._objects.items():
            if self._is_table(obj):
                table, tier = self._split_entry(obj)
                out[name] = load_dynamic_embedding(
                    table, state[name], directory, global_step=step,
                    tier=tier,
                )
            elif dense is not None:
                leaves, treedef = jax.tree_util.tree_flatten(state[name])
                # structure guard: a changed model must not silently
                # unflatten the saved leaves into the wrong positions
                td_key = f"{name}::treedef"
                if td_key in dense.files:
                    saved_td = str(dense[td_key])
                    if saved_td != str(treedef):
                        raise ValueError(
                            f"DECheckpoint.restore: dense entry '{name}' "
                            f"tree structure changed since save.\n"
                            f"  saved:   {saved_td}\n"
                            f"  current: {treedef}"
                        )
                n_saved = sum(
                    1 for k in dense.files
                    if k.startswith(f"{name}::") and k != td_key
                )
                if n_saved and n_saved != len(leaves):
                    raise ValueError(
                        f"DECheckpoint.restore: dense entry '{name}' has "
                        f"{len(leaves)} leaves but the checkpoint saved "
                        f"{n_saved}"
                    )
                new_leaves = []
                for i, leaf in enumerate(leaves):
                    key = f"{name}::{i}"
                    new_leaves.append(
                        jnp.asarray(dense[key])
                        if key in dense.files else leaf
                    )
                out[name] = jax.tree_util.tree_unflatten(
                    treedef, new_leaves
                )
        return out

    def _sweep(self, directory: str, keep: int):
        """Delete stale TFRADynamicEmbedding-<step> dirs + dense-<step>.npz,
        keeping the newest ``keep`` (reference _delete_redundant_de_dir,
        train/checkpoint.py:335-350)."""
        import shutil

        steps = sorted(
            int(m.group(1))
            for d in glob.glob(os.path.join(directory, DE_DIR_NAME + "-*"))
            if (m := re.match(
                re.escape(DE_DIR_NAME) + r"-(\d+)$", os.path.basename(d)
            ))
        )
        for s in steps[:-keep] if keep else steps:
            shutil.rmtree(
                os.path.join(directory, f"{DE_DIR_NAME}-{s}"),
                ignore_errors=True,
            )
            for f in glob.glob(os.path.join(directory, f"dense-{s}.npz")):
                os.remove(f)
