"""Real 2-process `jax.distributed` execution (VERDICT round-1 item #1).

Spawns two worker processes that form one 8-device global mesh (4 virtual
CPU devices each), train a sharded table, checkpoint per-rank, and restore
— the first honest exercise of the multi-host code paths
(parallel/multihost.py, _host_shards, rank-tagged sidecar files).

The parent then restores the 2-process checkpoint into a single-process
8-device table and checks the numerics match a single-process run of the
identical training trajectory (the reference pins 2-process numerics the
same way, horovod_sync_train_test.py:138-190).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.parallel.sharded import ShardedVariable
from recommenders_addons_tpu.train import load_dynamic_embedding

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "two_process_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference(out):
    """Re-run the identical trajectory single-process and compare."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("ep",))
    var = de.Variable(name="mp_table_ref", dim=4, init_capacity=1 << 12)
    svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
    opt = de.Adam(0.1)
    state = svar.create_slots(svar.init(), opt)
    keys = jnp.arange(1, 65, dtype=jnp.int64)
    for step in range(3):
        emb, ctx = svar.embedding_lookup(state, keys)
        state = svar.apply_gradients(
            state, ctx, jnp.ones_like(emb) * 0.1, opt, step=step)
    assert int(svar.size(state)) == out["size"]
    checksum = float(jnp.sum(svar.lookup(state, keys)))
    np.testing.assert_allclose(checksum, out["checksum"], rtol=1e-5)
    return var, svar, opt, state


def test_two_process_train_checkpoint_restore(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(r), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=_REPO, text=True,
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n--- stdout:\n{stdout}"
            f"\n--- stderr:\n{stderr[-4000:]}"
        )
        line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    # both ranks observed identical global results
    assert outs[0]["size"] == outs[1]["size"] == 64
    np.testing.assert_allclose(
        outs[0]["checksum"], outs[1]["checksum"], rtol=1e-6)
    # same-topology 2-process restore was exact on both ranks
    for o in outs:
        assert o["restored_size"] == 64
        np.testing.assert_allclose(
            o["restored_checksum"], o["checksum"], rtol=1e-5)
        assert o["restored_slot_m_abs"] > 0  # optimizer state survived

    # single-process numerics match the 2-process run
    ref_var, ref_svar, opt, ref_state = _single_process_reference(outs[0])

    # elastic: restore the 2-process checkpoint single-process (8 devices,
    # 1 process) and compare rows exactly (variable name must match the
    # saved sidecar dir)
    mesh = Mesh(np.array(jax.devices()[:8]), ("ep",))
    var = de.Variable(name="mp_table", dim=4, init_capacity=1 << 12)
    svar = ShardedVariable(var=var, mesh=mesh, axis="ep")
    fresh = svar.create_slots(svar.init(), opt)
    restored = load_dynamic_embedding(svar, fresh, str(tmp_path))
    assert int(svar.size(restored)) == 64
    keys = jnp.arange(1, 65, dtype=jnp.int64)
    got = np.asarray(svar.lookup(restored, keys))
    want = np.asarray(ref_svar.lookup(ref_state, keys))
    np.testing.assert_allclose(got, want, rtol=1e-5)
