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

    ``__call__(dense_state, mesh)`` returns the dense pytree placed with a
    fully-replicated sharding over ``mesh`` — the SPMD equivalent of
    broadcasting rank-0 values (all processes pass the same per-process
    value in multi-host JAX; replication makes it globally consistent).
    Dynamic-embedding states must NOT be passed (they are sharded;
    the reference likewise excludes TrainableWrappers)."""

    def __init__(self, root_rank: int = 0, device: str = ""):
        self.root_rank = root_rank
        self.broadcast_done = False

    def __call__(self, dense_state, mesh=None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            self.broadcast_done = True
            return dense_state
        repl = NamedSharding(mesh, P())
        out = jax.tree.map(lambda x: jax.device_put(x, repl), dense_state)
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
