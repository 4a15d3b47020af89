"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip logic (shard_map + ppermute halo exchange) is tested without TPU hardware by
forcing the host platform and splitting it into 8 fake devices, per SURVEY.md §4.
This must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
