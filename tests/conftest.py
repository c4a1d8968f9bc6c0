"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test session so
that multi-chip sharding tests exercise a real (virtual) Mesh. Mirrors how
the driver validates ``dryrun_multichip``.
"""

import os

# Tests run on an 8-device virtual CPU mesh: no contention for the one
# real chip, and multi-chip sharding is exercised for real. The axon TPU
# plugin self-registers from sitecustomize at interpreter startup (before
# this conftest) and force-sets jax_platforms="axon,cpu" — override it
# back to cpu before any backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
