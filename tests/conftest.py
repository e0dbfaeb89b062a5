"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh (the TPU
analog of a fake collective backend) so the suite is runnable anywhere.
Must set env vars before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
