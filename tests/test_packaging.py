"""Packaging smoke: build the wheel, install it into a clean target dir,
import it in a fresh interpreter, run one table roundtrip.

Parity: the reference's build_and_run_tests.sh smoke
(tools/testing/build_and_run_tests.sh) — build the artifact, then prove a
user can import and use it without the source tree on sys.path.
"""
import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_wheel_builds_and_roundtrips(tmp_path):
    dist = tmp_path / "dist"
    subprocess.run(
        [sys.executable, "-m", "build", "--wheel", "--no-isolation",
         "--outdir", str(dist)],
        cwd=REPO, check=True, capture_output=True, text=True)
    wheels = list(dist.glob("recommenders_addons_tpu-*.whl"))
    assert len(wheels) == 1, list(dist.iterdir())

    target = tmp_path / "site"
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--no-index",
         "--quiet", "--target", str(target), str(wheels[0])],
        check=True, capture_output=True, text=True)
    # the bundled C++ source must ship so the lazy native build works
    assert (target / "recommenders_addons_tpu" / "native" /
            "host_kv.cc").exists()

    env = dict(os.environ, PYTHONPATH=str(target), JAX_PLATFORMS="cpu")
    env.pop("PYTHONSTARTUP", None)
    proc = subprocess.run(
        [sys.executable, "-c", """
import jax
jax.config.update("jax_platforms", "cpu")
import recommenders_addons_tpu
assert not recommenders_addons_tpu.__file__.startswith(%r)
from recommenders_addons_tpu import dynamic_embedding as de
import jax.numpy as jnp
spec = de.TableSpec(dim=8, capacity=1 << 10)
ht = de.raw_table
state = ht.create(spec)
keys = jnp.arange(1, 65, dtype=jnp.int64)
state = ht.upsert(spec, state, keys, jnp.ones((64, 8)))
got, found = ht.lookup(spec, state, keys)
assert bool(found.all()) and float(got.sum()) == 64 * 8
print("WHEEL-OK")
""" % REPO],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "WHEEL-OK" in proc.stdout
