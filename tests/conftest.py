"""Test config: run on a virtual 8-device CPU mesh (SURVEY.md §4; the
reference's analogous trick splits one GPU into two logical devices,
utils/test_utils.py:63-78).

Note: this environment preloads an `axon` TPU PJRT plugin via sitecustomize
(jax is already imported before conftest runs), so setting the env var alone
is not enough — we must also flip the live jax config to cpu.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has ONE CPU core and the suite is
# compile-bound (~30-60 s/test first time); cached executables make repeat
# runs of unchanged tests near-instant. Harmless on cache miss.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TFRA_TEST_CACHE_DIR", "/root/.cache/jax_tfra_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
