"""`DEHvdSaver` — TF1-Saver-flavored checkpointing parity
(reference python/train/saver.py:33-128).

In the TPU-native design there is no graph-mode Saver; this class is a thin
facade over :class:`~recommenders_addons_tpu.train.checkpoint.DECheckpoint`
kept for API parity. The reference's Horovod rank-0-plus-join choreography
is unnecessary: every process writes rank-tagged shard files to the shared
directory and reads them back independently.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from recommenders_addons_tpu.train.checkpoint import DECheckpoint


class DEHvdSaver:
    def __init__(self, rank: int = 0, size: int = 1, **objects):
        self.rank = rank
        self.size = size
        self._ckpt = DECheckpoint(**objects)

    def save(self, directory: str, state: Dict[str, Any],
             global_step: Optional[int] = None, keep: Optional[int] = None):
        return self._ckpt.save(
            directory, state, step=global_step,
            proc_size=self.size, proc_rank=self.rank, keep=keep,
        )

    def restore(self, directory: str, state: Dict[str, Any],
                global_step="latest"):
        return self._ckpt.restore(directory, state, step=global_step)
