"""Test configuration: force CPU backend with a virtual 8-device mesh.

Sharding/multi-chip tests run against 8 virtual CPU devices (the driver
separately dry-runs the multi-chip path); engine tests are backend-agnostic.
Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_keisei_tpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon environment's sitecustomize imports jax at interpreter startup
# and pins jax_platforms to "axon,cpu" (remote TPU first). Env vars are
# therefore too late here — force the config back to CPU and drop any
# already-initialized backends so tests run on 8 local virtual devices.
import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends as _clear_backends  # noqa: E402

    _clear_backends()  # public variant: also clears the get_backend cache

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
