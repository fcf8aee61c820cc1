"""Compile the bench train step for TPU and print an op-cost census.

No step execution — lowers + compiles only. Finds XLA-level surprises
(full-table copies from failed aliasing, serialized scatters, unexpected
transposes) that per-variant timing can't attribute.

    python tools/dump_hlo.py [scan|step] [hit|miss]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu import dynamic_embedding as de

DIM = 64
CAP = 1 << 21
N = 1 << 16
STEPS = 10


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scan"
    path = sys.argv[2] if len(sys.argv) > 2 else "hit"
    var = de.Variable(
        name="hlo_table", dim=DIM, init_capacity=CAP,
        initializer=jax.nn.initializers.normal(0.05),
    )
    opt = de.Adam(0.001)
    state = de.create_slots(var, var.init(), opt)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, CAP * 2, N, dtype=np.int64))

    fresh = path == "miss"

    def one_step(st, sub, i):
        emb, ctx = var.embedding_lookup(st, sub)
        return var.apply_gradients(st, ctx, emb * 0.01, opt, step=i)

    if mode == "scan":
        def fn(state, ids):
            def step(st, i):
                sub = ids ^ (i + 1).astype(ids.dtype) if fresh else ids
                return one_step(st, sub, i), ()
            out, _ = jax.lax.scan(step, state,
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return out
    else:
        def fn(state, ids):
            return one_step(state, ids, jnp.int32(3))

    jf = jax.jit(fn, donate_argnums=0)
    txt = jf.lower(state, ids).compile().as_text()
    print(f"[{mode} {path}] HLO size: {len(txt.splitlines())} lines")

    # census: top-level ops of the entry + while body, with byte sizes
    big = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?[%\w.-]+ = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        op_m = re.search(r"= \w+\[[\d,]*\][^ ]* (\w+)\(", line)
        if not op_m:
            continue
        op = op_m.group(1)
        dims = [int(d) for d in m.group(2).split(",") if d]
        n_elem = int(np.prod(dims)) if dims else 1
        big.append((n_elem, op, line.strip()[:140]))
    big.sort(reverse=True)
    print("\n-- 40 largest op outputs --")
    for n_elem, op, line in big[:40]:
        print(f"{n_elem:>12}  {op:<18} {line}")

    from collections import Counter
    ops = Counter(op for _, op, _ in big)
    print("\n-- op histogram (count) --")
    for op, c in ops.most_common(30):
        print(f"{c:>5}  {op}")

    # copies of huge buffers = failed aliasing
    print("\n-- copies > 1M elements --")
    for n_elem, op, line in big:
        if op == "copy" and n_elem > (1 << 20):
            print(f"{n_elem:>12}  {line}")


if __name__ == "__main__":
    main()
