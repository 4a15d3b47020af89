"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip logic (shard_map + ppermute halo exchange) is tested without TPU hardware by
forcing the host platform and splitting it into 8 fake devices, per SURVEY.md §4.

NOTE: a site plugin may register an accelerator backend at interpreter startup and
override ``jax_platforms`` before this file runs, so setting the ``JAX_PLATFORMS`` env
var is NOT enough — we must win the fight post-import with ``jax.config.update``.
``XLA_FLAGS`` still works because backends initialize lazily (no ``jax.devices()`` call
can have happened before conftest import).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
