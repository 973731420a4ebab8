"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The unit/integration suite runs entirely on CPU (fast, deterministic, and it
leaves the single tunneled TPU chip free for benchmarks).  Multi-chip sharding
tests use the 8 virtual host devices.  Must run before any JAX backend
initialization, hence top-level in conftest.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
