"""Test harness: force an 8-device virtual CPU mesh before jax is imported.

Multi-chip sharding paths (parallel/) are exercised on host CPU devices —
the supported way to test pjit/shard_map layouts without real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize imports jax before this conftest runs, so the
# env vars above may be too late — force the config at runtime too (backends
# are still uninitialized at collection time).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU conv graphs take minutes to compile the
# first time; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream regardless of which
    # other tests ran (golden fixtures depend on this)
    return np.random.default_rng(0)
