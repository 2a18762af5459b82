"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Tests exercise TPU-shaped code paths (sharding, pjit, shard_map) on a virtual
CPU mesh so they run anywhere; the driver benches on the one real TPU chip.
"""

import os

# Force CPU even if the ambient environment points JAX at a TPU platform
# (the driver environment exports JAX_PLATFORMS=axon).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU-tunnel sitecustomize hooks jax import and PREPENDS its platform
# to jax_platforms, overriding the env var — force it back after import
# (backends are created lazily, so this is safe as long as it runs before
# any jax computation, which conftest import order guarantees).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite spends most of its wall time
# re-compiling identical XLA programs across pytest processes on this
# 1-core machine; cached programs cut a full run several-fold.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mcslam_jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# One long pytest process accumulates every compiled executable of every
# module; past ~100 tests this has segfaulted inside the compilation-cache
# read path (reproducibly at the same depth across full-suite runs, while
# each module alone is fine). Dropping the in-process jit caches at module
# boundaries bounds the accumulation; the persistent disk cache keeps the
# re-jits cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
