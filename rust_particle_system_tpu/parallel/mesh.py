"""Mesh construction helpers — single-slice (ICI) and multi-slice (ICI + DCN).

The band-sharded step only ever talks to ring NEIGHBORS (ppermute halos +
migration), so the communication cost is entirely determined by how bands map onto
devices: adjacent bands on the same slice ride ICI; a band pair straddling a slice
boundary rides DCN.  Multi-slice deployments (SURVEY.md §2.3/§5) therefore need no
new collectives — only a device ORDER that keeps each slice's bands contiguous, so
exactly one band boundary per slice pair crosses DCN (the minimum possible for a
spatially-decomposed domain).
"""

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


def make_multislice_band_mesh(axis: str = "bands") -> jax.sharding.Mesh:
    """1-D band mesh over ALL devices of a multi-slice deployment, ordered so each
    slice's devices are contiguous in band order.

    Under ``jax.distributed`` across slices, ``jax.devices()`` carries each
    device's slice via ``slice_index`` (absent on single-slice/CPU backends, where
    this degenerates to :func:`make_band_mesh`).  Sorting by (slice_index,
    intra-slice id) makes all but one halo/migration hop per slice pair stay on
    ICI; the single boundary row between consecutive slices is the only traffic
    that crosses DCN per frame (2 ppermute messages of one cell-row + one
    migration buffer each way).  The step itself is unchanged — XLA routes the
    same ppermute over ICI or DCN per edge.
    """
    devices = jax.devices()
    devices = sorted(
        devices, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id)
    )
    return jax.sharding.Mesh(np.asarray(devices), (axis,))


def dcn_boundary_bands(mesh: jax.sharding.Mesh) -> list[int]:
    """Band indices whose UPPER neighbor lives on a different slice (these bands'
    halo/migration exchanges ride DCN).  Empty on single-slice meshes."""
    devs = list(mesh.devices.ravel())
    out = []
    for i in range(len(devs) - 1):
        a = getattr(devs[i], "slice_index", 0) or 0
        b = getattr(devs[i + 1], "slice_index", 0) or 0
        if a != b:
            out.append(i)
    return out
