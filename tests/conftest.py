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


# ---------------------------------------------------------------------------
# Tiered suite: `pytest tests/` runs the <5-min default subset; the
# shard_map/distributed/e2e tests (several minutes of XLA compiles each) are
# marked `slow` and run with `pytest tests/ --runslow` (see README).
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
