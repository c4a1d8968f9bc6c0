"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test session so
that multi-chip sharding tests exercise a real (virtual) Mesh. Mirrors how
the driver validates ``dryrun_multichip``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
