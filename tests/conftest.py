"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on an
8-device host-platform mesh instead. Env vars must be set before jax import.
"""

import os

# The shell presets JAX_PLATFORMS=axon (single-chip TPU tunnel) and a
# sitecustomize imports jax before pytest loads this file, so the env var is
# already baked in -- override via jax.config instead (backends initialize
# lazily, so this still takes effect). The suite targets an 8-device
# virtual CPU mesh; set CORNELIS_TEST_PLATFORM to opt out (real-TPU runs).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update(
    "jax_platforms", os.environ.get("CORNELIS_TEST_PLATFORM", "cpu")
)
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the suite is dominated by XLA compiles of
# tiny eager ops; cache them across runs.
_platform = os.environ.get("CORNELIS_TEST_PLATFORM", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache", _platform),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
