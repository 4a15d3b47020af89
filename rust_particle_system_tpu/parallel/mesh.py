"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np


def make_band_mesh(n_devices: int | None = None, axis: str = "bands") -> jax.sharding.Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default).

    On a real slice the devices enumerate in ICI ring order, so band neighbors are ICI
    neighbors and the ppermute halo/migration traffic stays off DCN.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (axis,))
