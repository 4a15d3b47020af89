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


# ------------------------------------------------------------------------------------
# splat_from_planes (the row-strip plane rasterizer) vs the scatter-add oracle.
# Round-3 regression: the round-2 XLA patch assembly silently dropped sprite mass in
# the leftmost (stride - margin) image columns at the sim-grid geometry — a gap this
# direct oracle-parity test would have caught (it only existed for splat_pallas).
# ------------------------------------------------------------------------------------

def _plane_case(margin, rng, h=45, w=90):
    from rust_particle_system_tpu.ops.grid import GridSpec
    from rust_particle_system_tpu.render.splat_jax import splat_accumulate
    from rust_particle_system_tpu.render.splat_planes import splat_from_planes

    bounds = (0.0, float(w), 0.0, float(h))
    spec = GridSpec.from_bounds(bounds, 9.0, capacity=8)
    rs = RenderSpec(width=w, height=h, max_radius_px=2)
    n = 300
    pos = np.stack(
        [rng.uniform(0, w, n), rng.uniform(0, h, n)], axis=-1
    ).astype(np.float32)
    # force coverage of all four image edges, incl. the left margin columns
    pos[:8] = [[0.4, 0.4], [0.4, h - 0.4], [w - 0.4, 0.4], [w - 0.4, h - 0.4],
               [1.5, h / 2], [w / 2, 1.5], [0.1, 7.0], [6.9, 0.1]]

    # bin by hand into planes (same convention as plane_state_from_particles)
    C = spec.capacity
    ppx = np.full((spec.gh, spec.gw, C), 1.0e6, np.float32)
    ppy = np.full_like(ppx, 1.0e6)
    occ = np.zeros((spec.gh, spec.gw), np.int32)
    for x, y in pos:
        cx = min(int((x - spec.x_min) / spec.cell_width), spec.gw - 1)
        cy = min(int((y - spec.y_min) / spec.cell_size), spec.gh - 1)
        k = occ[cy, cx]
        if k < C:
            ppx[cy, cx, k], ppy[cy, cx, k] = x, y
            occ[cy, cx] = k + 1
    live = jnp.asarray(ppx < 0.5e6)
    col = jnp.where(live, 0.6, 0.0)

    rgb_got, a_got = splat_from_planes(
        jnp.asarray(ppx), jnp.asarray(ppy), jnp.zeros_like(live, jnp.float32),
        jnp.zeros_like(live, jnp.float32), live, 2.0, 300.0,
        bounds_static=bounds, grid_spec=spec, render_spec=rs,
        margin=margin, resolve=False, colors=(col, col, col))

    kept = np.asarray(ppx).reshape(-1) < 0.5e6
    posk = np.stack([np.asarray(ppx).reshape(-1)[kept],
                     np.asarray(ppy).reshape(-1)[kept]], axis=-1)
    colk = np.broadcast_to(
        np.asarray([0.6, 0.6, 0.6, 1.0], np.float32), (len(posk), 4))
    rgb_want, a_want = splat_accumulate(
        jnp.asarray(posk), jnp.asarray(colk), jnp.float32(2.0),
        jnp.asarray(bounds), rs)
    np.testing.assert_allclose(np.asarray(a_got), np.asarray(a_want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb_got), np.asarray(rgb_want),
                               rtol=1e-4, atol=1e-4)


def test_planes_rasterizer_oracle_parity_fast_layout(rng):
    # margin 2 at 9px stride: 13px patches, 16-lane rows (the fast path)
    _plane_case(2, rng)


def test_planes_rasterizer_oracle_parity_wide_layout(rng):
    # margin 4 at 9px stride: 17px patches, 32-lane rows (the fallback path)
    _plane_case(4, rng)


def _sum_rule_case(rng, color_sum_val, margin=2, h=45, w=90):
    """3-channel sum-rule kernel vs the 4-channel kernel, same inputs."""
    from rust_particle_system_tpu.ops.grid import GridSpec
    from rust_particle_system_tpu.render.splat_planes import splat_from_planes

    bounds = (0.0, float(w), 0.0, float(h))
    spec = GridSpec.from_bounds(bounds, 9.0, capacity=8)
    rs = RenderSpec(width=w, height=h, max_radius_px=2)
    n = 400
    pos = np.stack(
        [rng.uniform(0, w, n), rng.uniform(0, h, n)], axis=-1
    ).astype(np.float32)
    C = spec.capacity
    ppx = np.full((spec.gh, spec.gw, C), 1.0e6, np.float32)
    ppy = np.full_like(ppx, 1.0e6)
    occ = np.zeros((spec.gh, spec.gw), np.int32)
    for x, y in pos:
        cx = min(int((x - spec.x_min) / spec.cell_width), spec.gw - 1)
        cy = min(int((y - spec.y_min) / spec.cell_size), spec.gh - 1)
        k = occ[cy, cx]
        if k < C:
            ppx[cy, cx, k], ppy[cy, cx, k] = x, y
            occ[cy, cx] = k + 1
    live = jnp.asarray(ppx < 0.5e6)
    # per-slot colors with a FIXED channel sum (the sum-rule contract):
    # r uniform in [0, sum], g uniform in the rest, b the remainder.
    r = np.asarray(rng.uniform(0, color_sum_val, ppx.shape), np.float32)
    g = np.asarray(rng.uniform(0, 1.0, ppx.shape), np.float32) * (
        color_sum_val - r)
    b = color_sum_val - r - g
    colf = lambda a: jnp.where(live, jnp.asarray(a), 0.0)
    kwargs = dict(bounds_static=bounds, grid_spec=spec, render_spec=rs,
                  margin=margin, resolve=False,
                  colors=(colf(r), colf(g), colf(b)))
    z = jnp.zeros_like(live, jnp.float32)
    rgb4, a4 = splat_from_planes(jnp.asarray(ppx), jnp.asarray(ppy), z, z,
                                 live, 2.0, 300.0, **kwargs)
    rgb3, a3 = splat_from_planes(jnp.asarray(ppx), jnp.asarray(ppy), z, z,
                                 live, 2.0, 300.0,
                                 color_sum=jnp.float32(color_sum_val),
                                 **kwargs)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a4),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb3), np.asarray(rgb4),
                               rtol=1e-4, atol=2e-5)


def test_sum_rule_matches_four_channel_ramp(rng):
    # color_sum = 1: the energy_color ramp contract (both segments sum to 1)
    _sum_rule_case(rng, 1.0)


def test_sum_rule_matches_four_channel_white(rng):
    # color_sum = 3: warm-up white frames
    _sum_rule_case(rng, 3.0)


def test_clamp_drift_preserves_sprite_mass():
    """A sprite drifted beyond margin - radius renders DISPLACED (full mass)
    with clamp_drift=True, where the unclamped kernel clips it."""
    from rust_particle_system_tpu.ops.grid import GridSpec
    from rust_particle_system_tpu.render.splat_planes import splat_from_planes

    h, w = 45, 90
    bounds = (0.0, float(w), 0.0, float(h))
    spec = GridSpec.from_bounds(bounds, 9.0, capacity=8)
    rs = RenderSpec(width=w, height=h, max_radius_px=2)
    C = spec.capacity
    ppx = np.full((spec.gh, spec.gw, C), 1.0e6, np.float32)
    ppy = np.full_like(ppx, 1.0e6)
    # binned into cell (2, 4) (x in [36, 45)) but drifted 5 px left of the cell
    # edge — far outside the margin-3 patch's 1 px slack.  The clamp puts its
    # center at patch x = radius (2), i.e. absolute pixel x = 36 - 3 + 2 = 35.
    ppx[2, 4, 0], ppy[2, 4, 0] = 31.0, 22.5
    # reference: an interior sprite at the CLAMPED position (same sub-pixel
    # phase — sprite mass varies with pixel alignment), binned normally.
    ppx_ref = np.full_like(ppx, 1.0e6)
    ppy_ref = np.full_like(ppy, 1.0e6)
    ppx_ref[2, 3, 0], ppy_ref[2, 3, 0] = 35.0, 22.5
    live = jnp.asarray(ppx < 0.5e6)
    col = jnp.where(live, 1.0, 0.0)
    z = jnp.zeros_like(live, jnp.float32)

    def mass(px, py, clamp):
        _, a = splat_from_planes(
            jnp.asarray(px), jnp.asarray(py), z, z, jnp.asarray(px < 0.5e6),
            2.0, 300.0, bounds_static=bounds, grid_spec=spec, render_spec=rs,
            margin=3, resolve=False, colors=(col, col, col),
            clamp_drift=clamp)
        return float(jnp.sum(a))

    full = mass(ppx_ref, ppy_ref, False)
    clipped = mass(ppx, ppy, False)
    clamped = mass(ppx, ppy, True)
    assert clipped < 0.8 * full  # the old behavior really clips this sprite
    np.testing.assert_allclose(clamped, full, rtol=1e-5)
