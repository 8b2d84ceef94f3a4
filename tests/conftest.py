"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh. Real-TPU execution is exercised by bench.py and the graft
entry instead.

Note: the environment may pre-import jax (sitecustomize registering a
tunnelled TPU backend), so env vars are not enough — we set the platform via
jax.config, which works as long as no backend has been initialised yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
