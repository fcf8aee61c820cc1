"""Environment-variable configuration (reference parity, SURVEY.md §5:
`TF_HASHTABLE_INIT_SIZE` cuckoo_hashtable_op.cc:199, `TFRA_SAVED_KV`
cuckoo_hashtable_ops.py:440, `TFRA_NUM_WORKER_THREADS_...`
cuckoo_hashtable_op.cc:133 — plus this framework's own knobs)."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _int_env(name: str, default: int) -> int:
    v = os.environ.get(name)
    try:
        return int(v) if v else default
    except ValueError:
        return default


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    # default table capacity when none given (reference
    # TF_HASHTABLE_INIT_SIZE default 8192; ours defaults bigger since
    # capacity == max under eviction)
    default_init_size: int = 1024 * 1024
    # checkpoint IO buffer in keys (reference buffer_size default 4Mi)
    checkpoint_buffer_keys: int = 4 * 1024 * 1024
    # host-store worker threads for batched gets (reference
    # TFRA_NUM_WORKER_THREADS_FOR_LOOKUP_TABLE_INSERT)
    host_store_threads: int = 8
    # checkpoint sidecar dir override (reference TFRA_SAVED_KV)
    saved_kv_dir: Optional[str] = None
    # disable the native C++ host store / the Pallas kernels (debugging)
    disable_native: bool = False
    disable_pallas: bool = False


def env_config() -> EnvConfig:
    return EnvConfig(
        default_init_size=_int_env(
            "TF_HASHTABLE_INIT_SIZE",
            _int_env("TFRA_TPU_INIT_SIZE", 1024 * 1024),
        ),
        checkpoint_buffer_keys=_int_env(
            "TFRA_TPU_CKPT_BUFFER_KEYS", 4 * 1024 * 1024
        ),
        host_store_threads=_int_env(
            "TFRA_NUM_WORKER_THREADS_FOR_LOOKUP_TABLE_INSERT", 8
        ),
        saved_kv_dir=os.environ.get("TFRA_SAVED_KV"),
        disable_native=os.environ.get("TFRA_TPU_DISABLE_NATIVE") == "1",
        disable_pallas=os.environ.get("TFRA_TPU_DISABLE_PALLAS") == "1",
    )
