"""Worker for the 2-process `jax.distributed` test (NOT a pytest file).

Launched twice by tests/test_multiprocess.py with a shared coordinator
port; builds the global 8-device mesh across both processes (4 virtual CPU
devices each), trains a sharded dynamic-embedding table, saves per-rank
checkpoint shards, restores them in the same topology, and prints one JSON
result line for the parent to compare across ranks and against a
single-process reference run.

Reference parity: the Horovod CI runs `mpirun -np 2 pytest
horovod_sync_train_test.py` (tools/testing/build_and_run_tests.sh:63) and
pins 2-process numerics (horovod_sync_train_test.py:138-190).
"""

import json
import os
import sys

port, rank, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=rank,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from recommenders_addons_tpu import dynamic_embedding as de  # noqa: E402
from recommenders_addons_tpu.parallel import multihost  # noqa: E402
from recommenders_addons_tpu.parallel.sharded import (  # noqa: E402
    ShardedVariable,
)
from recommenders_addons_tpu.train import (  # noqa: E402
    load_dynamic_embedding,
    save_dynamic_embedding,
)

mesh = multihost.global_mesh("ep")
var = de.Variable(name="mp_table", dim=4, init_capacity=1 << 12)
svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
opt = de.Adam(0.1)
state = svar.create_slots(svar.init(), opt)

# global batch = keys 1..64; each process feeds ITS half (standard JAX
# multi-host data loading through make_array_from_process_local_data)
keys_global = np.arange(1, 65, dtype=np.int64)
local = keys_global[rank * 32: (rank + 1) * 32]

for step in range(3):
    ids = multihost.shard_batch(mesh, local)
    emb, ctx = svar.embedding_lookup(state, ids)
    grads = jnp.ones_like(emb) * 0.1
    state = svar.apply_gradients(state, ctx, grads, opt, step=step)

size = int(svar.size(state))
ids = multihost.shard_batch(mesh, local)
emb_final = svar.lookup(state, ids)
checksum = float(jax.jit(jnp.sum)(emb_final))

save_dynamic_embedding(
    svar, state, out_dir, proc_size=2, proc_rank=rank)
multihost_utils.sync_global_devices("tfra_mp_saved")

# same-topology 2-process restore
fresh = svar.create_slots(svar.init(), opt)
restored = load_dynamic_embedding(svar, fresh, out_dir)
r_size = int(svar.size(restored))
r_emb = svar.lookup(restored, multihost.shard_batch(mesh, local))
r_checksum = float(jax.jit(jnp.sum)(r_emb))
slot_sum = float(jax.jit(lambda s: jnp.sum(jnp.abs(s.slots["m"])))(restored))

print(json.dumps({
    "rank": rank,
    "size": size,
    "checksum": checksum,
    "restored_size": r_size,
    "restored_checksum": r_checksum,
    "restored_slot_m_abs": slot_sum,
}))
multihost_utils.sync_global_devices("tfra_mp_done")
