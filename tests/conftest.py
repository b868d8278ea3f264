"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (SURVEY.md §4 'chip-count-invariance' plan).

Note: this machine's ambient environment pins JAX_PLATFORMS=axon (the TPU
tunnel plugin) and ignores the env-var override, so the platform must be
selected through jax.config before any backend initialization."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the test box has a single CPU core, so XLA
# compiles dominate wall time; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
