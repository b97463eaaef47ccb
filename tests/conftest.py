"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (same SPMD partitioner).
Must run before `import jax`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeated test runs skip XLA recompiles.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# The axon TPU plugin can override JAX_PLATFORMS from the environment;
# force CPU programmatically so the virtual 8-device mesh is real.
jax.config.update("jax_platforms", "cpu")
