"""Quick on-chip smoke for the round-4 sharded fast path: 1-device mesh,
small table — compile + numerics vs the single-table path."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from recommenders_addons_tpu import dynamic_embedding as de
from recommenders_addons_tpu.parallel.sharded import ShardedVariable

DIM = 64
CAP = 1 << 16

var_s = de.Variable(name="smoke_single", dim=DIM, init_capacity=CAP,
                    initializer=jax.nn.initializers.normal(0.05))
var_m = de.Variable(name="smoke_single", dim=DIM, init_capacity=CAP,
                    initializer=jax.nn.initializers.normal(0.05))
opt = de.Adam(0.01)
mesh = Mesh(np.asarray(jax.devices()[:1]), ("ep",))
sv = ShardedVariable(var=var_m, mesh=mesh)

st_s = de.create_slots(var_s, var_s.init(), opt)
st_m = sv.create_slots(sv.init(), opt)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.choice(np.arange(1, CAP, dtype=np.int64), size=1024,
                             replace=False))
dup_ids = jnp.asarray(rng.integers(1, 500, size=1024, dtype=np.int64))


@jax.jit
def step_single(st, ids, i):
    emb, ctx = var_s.embedding_lookup(st, ids, step=i + 2)
    return var_s.apply_gradients(st, ctx, emb * 0.01, opt, step=i), emb


@jax.jit
def step_sharded(st, ids, i):
    emb, ctx = sv.embedding_lookup(st, ids, step=i + 2)
    return sv.apply_gradients(st, ctx, emb * 0.01, opt, step=i), emb


for i in range(3):
    st_s, emb_s = step_single(st_s, ids, jnp.int32(i))
    st_m, emb_m = step_sharded(st_m, ids, jnp.int32(i))
    np.testing.assert_allclose(np.asarray(emb_s), np.asarray(emb_m),
                               rtol=1e-5, atol=1e-6)

# dup-heavy batch
for i in range(3, 6):
    st_s, emb_s = step_single(st_s, dup_ids, jnp.int32(i))
    st_m, emb_m = step_sharded(st_m, dup_ids, jnp.int32(i))
    np.testing.assert_allclose(np.asarray(emb_s), np.asarray(emb_m),
                               rtol=1e-5, atol=1e-6)

out_s = var_s.lookup(st_s, ids)
out_m = sv.lookup(st_m, ids)
np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m),
                           rtol=1e-5, atol=1e-6)
assert int(var_s.size(st_s)) == int(sv.size(st_m))
print("OK: sharded(1-dev TPU) == single-table over",
      int(var_s.size(st_s)), "keys")
