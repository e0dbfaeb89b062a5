"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh (the TPU
analog of a fake collective backend) so the suite is runnable anywhere.

Note: the ambient environment may export JAX_PLATFORMS=axon (a tunneled TPU
backend) and pre-import jax via sitecustomize — so we must *overwrite* the env
var (not setdefault) and set the device count through jax.config before any
backend initializes (backends init lazily at first device use).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# sitecustomize may have imported jax already, freezing env-derived config;
# update through jax.config so it applies regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (trained-checkpoint parity etc.)"
    )
