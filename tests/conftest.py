"""Test env: force the CPU backend with 8 virtual devices — the
TPU-world "fake backend" (SURVEY §4): multi-chip sharding tests run on
any host, and unit tests are hermetic.

Note: this environment pre-imports jax at interpreter startup (site
hook), so setting JAX_PLATFORMS in os.environ here is too late.
Backends initialize lazily though, so jax.config.update still works as
long as no jax.devices() call has happened yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
