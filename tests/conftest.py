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

# Persistent XLA:CPU compile cache, fingerprinted by host CPU features.
# args.enable_compilation_cache deliberately skips CPU because reusing AOT
# results across host-feature mismatches risks SIGILL; keying the cache dir
# on the feature flags removes that risk while letting repeat fast-tier runs
# skip their dominant cost (jit compiles of the model/render programs — the
# tier's wall time is mostly XLA compilation, measured 195s cold).
def _enable_cpu_compile_cache():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith(("flags", "Features"))]
        if not flags:
            return
        fp = hashlib.sha1(flags[0].encode()).hexdigest()[:12]
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "pixelnerf_tpu",
            f"xla-cpu-{fp}",
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        # CPU test programs compile in ~0.1-10s each; cache them all
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
    except Exception:
        pass  # cache is an optimization only


_enable_cpu_compile_cache()


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (trained-checkpoint parity etc.)"
    )
