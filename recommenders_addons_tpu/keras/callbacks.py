"""Training-loop callbacks (reference python/keras/callbacks.py:38-196).

The reference needs two Horovod callbacks:

  * ``DEHvdBroadcastGlobalVariablesCallback`` — broadcast dense state from
    rank 0 at step 0 (sparse tables stay worker-local). Under SPMD/pjit the
    dense state is replicated by construction, so the broadcast is only
    needed for multi-process setups that initialized independently; here it
    re-materializes dense leaves with a replicated sharding.
  * ``DEHvdModelCheckpoint`` — periodic checkpoint where every process
    writes its own KV shards. Maps onto DECheckpoint directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from recommenders_addons_tpu.train.checkpoint import DECheckpoint


class DEHvdBroadcastGlobalVariablesCallback:
    """Reference keras/callbacks.py:38-106. Call once after building state.

    ``__call__(state, mesh)`` accepts the FULL training state pytree —
    dense parameters, optimizer state, AND dynamic-embedding
    ``TableState`` subtrees mixed together — and returns it with every
    broadcastable leaf placed under a fully-replicated sharding over
    ``mesh`` (the SPMD equivalent of broadcasting rank-0 values: all
    processes pass the same per-process value in multi-host JAX;
    replication makes it globally consistent). The filtering contract is
    the reference's ``filter_lambda`` (callbacks.py:73-76): dynamic-
    embedding tables are excluded AUTOMATICALLY (``TableState`` subtrees
    pass through untouched — they are sharded worker-local state, the
    role of excluding ``TrainableWrapper``/``DEResourceVariable``), and
    user-registered local variables are excluded by pytree path
    (:meth:`register_local_var`, the ``local_variables=`` ctor arg)."""

    def __init__(self, root_rank: int = 0, device: str = "",
                 local_variables=None):
        self.root_rank = root_rank
        self.broadcast_done = False
        self._local_paths: set = set()
        if local_variables:
            if isinstance(local_variables, str):
                local_variables = [local_variables]
            for p in local_variables:
                self.register_local_var(p)

    def register_local_var(self, path_substr: str):
        """Exclude leaves whose pytree key-path contains ``path_substr``
        (reference ``register_local_var``, callbacks.py:52-62 — worker-
        local variables the broadcast must not touch)."""
        if not isinstance(path_substr, str):
            raise ValueError(
                "register_local_var takes a pytree key-path substring "
                "(e.g. \"['worker_stats']\"); got "
                f"{type(path_substr).__name__}")
        self._local_paths.add(path_substr)

    def __call__(self, state, mesh=None):
        import jax.tree_util as jtu
        from jax.sharding import NamedSharding, PartitionSpec as P

        from recommenders_addons_tpu.ops.hashtable import TableState

        if mesh is None:
            self.broadcast_done = True
            return state
        repl = NamedSharding(mesh, P())

        def place(path, leaf):
            if isinstance(leaf, TableState):
                return leaf  # DE tables are worker-local by design
            ks = jtu.keystr(path)
            if any(p in ks for p in self._local_paths):
                return leaf
            return jax.device_put(leaf, repl)

        out = jtu.tree_map_with_path(
            place, state, is_leaf=lambda x: isinstance(x, TableState))
        self.broadcast_done = True
        return out


class DEHvdModelCheckpoint:
    """Reference keras/callbacks.py:109-196: every N steps/epochs, rank 0
    writes the dense state, all ranks write their KV shards.

    Usage::

        cb = DEHvdModelCheckpoint(directory, table=var)   # DE entries
        cb.on_step_end(step, {'table': state, ...})
    """

    def __init__(self, filepath: str, save_freq: int = 1000,
                 proc_size: int = 1, proc_rank: int = 0,
                 keep: Optional[int] = None, **objects):
        self.filepath = filepath
        self.save_freq = max(int(save_freq), 1)
        self.proc_size = proc_size
        self.proc_rank = proc_rank
        self.keep = keep
        self._ckpt = DECheckpoint(**objects)

    def on_step_end(self, step: int, state: Dict[str, Any]):
        if step % self.save_freq == 0 and step > 0:
            self._ckpt.save(
                self.filepath, state, step=step,
                proc_size=self.proc_size, proc_rank=self.proc_rank,
                keep=self.keep,
            )

    on_epoch_end = on_step_end
