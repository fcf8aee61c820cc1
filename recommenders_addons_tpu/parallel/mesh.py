"""Device-mesh helpers.

The reference's entire distribution menu (Horovod all-to-all, tf.distribute
strategies, parameter servers — SURVEY.md §2.3) collapses on TPU to ONE
concept: a named mesh axis. Embedding tables row-shard over it, batches
data-shard over it, and lookups ride ICI all-to-all inside ``shard_map``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DEFAULT_AXIS = "ep"  # embedding-parallel == data-parallel axis


def create_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = DEFAULT_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over all (or the first ``num_devices``) devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))
