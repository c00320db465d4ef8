"""Test harness: force an 8-device virtual CPU platform before JAX backends init.

This environment registers a TPU PJRT plugin via sitecustomize in every python
process; tests must NOT grab the (single, shared) TPU - they run on a virtual
8-device CPU mesh for the multi-chip sharding coverage.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# config-level override beats the sitecustomize plugin registration
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: big win across test runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
