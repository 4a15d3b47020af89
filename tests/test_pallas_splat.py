"""Parity tests: Pallas patch-splat rasterizer vs the scatter-add reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_particle_system_tpu.render import RenderSpec, splat
from rust_particle_system_tpu.render.splat_pallas import splat_pallas

BOUNDS = jnp.asarray([-96.0, 96.0, -54.0, 54.0], jnp.float32)
SPEC = RenderSpec(width=192, height=108, max_radius_px=4)


def _both(pos, color, size=3.0):
    pos = jnp.asarray(pos, jnp.float32)
    color = jnp.asarray(color, jnp.float32)
    want = np.asarray(splat(pos, color, jnp.float32(size), BOUNDS, SPEC))
    got = np.asarray(
        splat_pallas(pos, color, jnp.float32(size), BOUNDS, SPEC, capacity=16)
    )
    return got, want


def test_single_particle_matches_reference():
    got, want = _both([[0.0, 0.0]], [[1.0, 0.2, 0.1, 1.0]])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_random_cloud_matches_reference(rng):
    n = 500
    pos = np.stack(
        [rng.uniform(-96, 96, n), rng.uniform(-54, 54, n)], axis=-1
    ).astype(np.float32)
    color = rng.random((n, 4)).astype(np.float32)
    color[:, 3] = 1.0
    got, want = _both(pos, color)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edge_and_offscreen_particles(rng):
    pos = np.asarray(
        [[-96.0, -54.0], [96.0, 54.0], [1e4, 0.0], [-96.0, 54.0]], np.float32
    )
    color = np.ones((4, 4), np.float32)
    got, want = _both(pos, color)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_patch_boundary_straddling(rng):
    # particles exactly on 8px render-cell boundaries exercise the shifted-add
    xs = np.linspace(-96, 96, 25)[:-1]  # hits many cell edges
    pos = np.stack([xs, np.zeros_like(xs)], axis=-1).astype(np.float32)
    color = np.tile(np.asarray([[0.3, 0.8, 0.5, 1.0]], np.float32), (len(xs), 1))
    got, want = _both(pos, color)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
