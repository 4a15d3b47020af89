"""Band-sharded plane-resident step on 8 virtual CPU devices: parity vs the
single-chip plane step, lossless conservation, cross-band transit, and the
distributed MXU-rasterizer composite."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    plane_step,
    render_plane_state,
    to_particle_state,
)
from rust_particle_system_tpu.parallel import make_band_mesh
from rust_particle_system_tpu.parallel.plane_sharded import (
    check_plane_diags,
    make_plane_sharded_frame,
    make_plane_sharded_step,
    shard_plane_state,
)
from rust_particle_system_tpu.render import RenderSpec

BOUNDS = (-54.0, 54.0, -36.0, 36.0)  # 12 x 8 cells of 9.0 -> gh=9 pads below


def _setup(rng, n=320, n_bands=4, gh_rows=8, capacity=16, vmax=30.0):
    """Grid whose height divides n_bands exactly (bands own gh/n_bands rows)."""
    params = make_params(bounds=BOUNDS, gravity=120.0, shader_delay=0)
    # build an explicit spec with gh divisible by n_bands
    spec = GridSpec(x_min=BOUNDS[0], y_min=BOUNDS[2], cell_size=9.0,
                    gw=13, gh=gh_rows, capacity=capacity)
    pos = np.stack(
        [rng.uniform(BOUNDS[0], BOUNDS[1] - 1e-3, n),
         rng.uniform(BOUNDS[2], BOUNDS[3] - 1e-3, n)], axis=-1
    ).astype(np.float32)
    vel = rng.uniform(-vmax, vmax, (n, 2)).astype(np.float32)
    state = make_state(jnp.asarray(pos), jnp.asarray(vel)).with_ids()
    ps = plane_state_from_particles(state, spec)
    assert int(ps.lost) == 0
    return params, spec, ps


@pytest.mark.parametrize("n_bands,rebin_variant", [
    (2, 5), (2, 6), (4, 5), (4, 6),
    # 8 bands over gh=8 rows -> R=1: the v6 slab's row0-2 ghost lives TWO
    # bands up and must arrive via the second ppermute hop (plane_sharded's
    # R==1 branch) — otherwise untested.
    (8, 6),
])
def test_plane_sharded_matches_single_chip(rng, n_bands, rebin_variant):
    params, spec, ps = _setup(rng, n_bands=n_bands)
    mesh = make_band_mesh(n_bands)
    step = make_plane_sharded_step(spec, mesh, rebin_variant=rebin_variant)
    sharded = shard_plane_state(ps, mesh)

    single = ps
    for _ in range(4):
        sharded, diags = step(sharded, params)
        jax.block_until_ready(sharded.px)  # 1-core CPU-mesh rendezvous guard
        check_plane_diags(diags)
        single = plane_step(single, params, spec)

    got = to_particle_state(sharded, params)
    want = to_particle_state(single, params)
    go = np.argsort(np.asarray(got.ids))
    wo = np.argsort(np.asarray(want.ids))
    np.testing.assert_allclose(
        np.asarray(got.pos)[go], np.asarray(want.pos)[wo], rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got.vel)[go], np.asarray(want.vel)[wo], rtol=0, atol=2e-3)


def test_plane_sharded_conserves_across_band_transit(rng):
    """Fast downward flow: particles cross band boundaries every few frames;
    live count must stay exact (migration IS the lossless rebin)."""
    params, spec, ps = _setup(rng, n=200, n_bands=4, vmax=60.0)
    params = params._replace(gravity=jnp.float32(400.0))
    mesh = make_band_mesh(4)
    step = make_plane_sharded_step(spec, mesh)
    sharded = shard_plane_state(ps, mesh)
    n_live = int(np.asarray(ps.live).sum())
    for _ in range(8):
        sharded, diags = step(sharded, params)
        jax.block_until_ready(sharded.px)
        vals = check_plane_diags(diags, expect_particles=n_live)
    assert vals["live_after"] == n_live


def test_plane_sharded_band_crossing_changes_owner(rng):
    """A particle moving into another band's rows ends up resident there."""
    params, spec, _ = _setup(rng, n=4, n_bands=2)
    mesh = make_band_mesh(2)
    # One particle in the top row of band 0 (row 3), moving up fast.
    px = np.full((spec.gh, spec.gw, spec.capacity), SENTINEL, np.float32)
    py = np.full_like(px, SENTINEL)
    vx = np.zeros_like(px)
    vy = np.zeros_like(px)
    ids = np.zeros_like(px)
    px[3, 5, 0] = BOUNDS[0] + 5.5 * 9.0 + 4.0
    py[3, 5, 0] = BOUNDS[2] + 3.5 * 9.0
    vy[3, 5, 0] = 9.0 / float(params.dt) * 0.9  # ~0.9 cell-rows per frame
    ids[3, 5, 0] = 7.0
    from rust_particle_system_tpu.ops.pallas.resident import PlaneState

    ps = PlaneState(px=jnp.asarray(px), py=jnp.asarray(py), vx=jnp.asarray(vx),
                    vy=jnp.asarray(vy), idsf=jnp.asarray(ids),
                    frame=jnp.asarray(10, jnp.int32),
                    lost=jnp.asarray(0, jnp.int32), n=1)
    params = params._replace(gravity=jnp.float32(0.0))
    step = make_plane_sharded_step(spec, mesh)
    sharded = shard_plane_state(ps, mesh)
    for _ in range(3):
        sharded, diags = step(sharded, params)
        jax.block_until_ready(sharded.px)
        check_plane_diags(diags, expect_particles=1)
    live = np.asarray(sharded.live)
    rows = np.argwhere(live)[:, 0]
    assert len(rows) == 1 and rows[0] >= 4, f"expected band-1 rows, got {rows}"


@pytest.mark.parametrize("rebin_variant", [5, 6])
def test_plane_sharded_crowded_boundary_defers_then_delivers(rebin_variant):
    """Cross-band adoption into a FULL edge cell: the mover must be deferred
    (retained across the ppermute boundary, zero losses) and delivered once the
    destination cell frees up — SURVEY §7 hard part 4's crowding case.

    Construction (pure advection: all force terms zeroed): cell (1, 5) — band
    0's top row — is filled to capacity with occupants sliding right one cell
    per frame; a mover in band 1's bottom row falls one cell-row per frame into
    it.  Frame 1: occupants are pass-Y stayers, so the mover finds zero holes
    and is retained in band 1 (deferred > 0).  Frame 2: the occupants' old
    slots are dead, the mover crosses the band boundary into (1, 5).
    """
    n_bands = 2
    capacity = 16
    spec = GridSpec(x_min=-54.0, y_min=-36.0, cell_size=9.0,
                    gw=13, gh=4, capacity=capacity)
    params = make_params(bounds=(-54.0, 63.0, -36.0, 0.0), gravity=0.0,
                        shader_delay=0, pressure_multiplier=0.0,
                        viscosity_strength=0.0, near_density_multiplier=0.0)
    shp = (spec.gh, spec.gw, capacity)
    px = np.full(shp, SENTINEL, np.float32)
    py = np.full(shp, SENTINEL, np.float32)
    vx = np.zeros(shp, np.float32)
    vy = np.zeros(shp, np.float32)
    ids = np.zeros(shp, np.float32)
    dt = float(params.dt)
    # 16 occupants fill cell (1, 5) (x in [-9, 0), y in [-27, -18)), all moving
    # one cell right per frame.
    for s in range(capacity):
        px[1, 5, s] = -9.0 + (s + 0.5) * (9.0 / capacity)
        py[1, 5, s] = -22.5
        vx[1, 5, s] = 9.0 / dt
        ids[1, 5, s] = float(s)
    # The mover: band 1's bottom row (row 2), falling one cell-row per frame.
    px[2, 5, 0] = -5.0
    py[2, 5, 0] = -14.0
    vy[2, 5, 0] = -9.0 / dt
    ids[2, 5, 0] = 99.0
    from rust_particle_system_tpu.ops.pallas.resident import PlaneState

    ps = PlaneState(px=jnp.asarray(px), py=jnp.asarray(py),
                    vx=jnp.asarray(vx), vy=jnp.asarray(vy),
                    idsf=jnp.asarray(ids), frame=jnp.asarray(10, jnp.int32),
                    lost=jnp.asarray(0, jnp.int32), n=capacity + 1)
    mesh = make_band_mesh(n_bands)
    step = make_plane_sharded_step(spec, mesh, rebin_variant=rebin_variant)
    sharded = shard_plane_state(ps, mesh)

    deferred = []
    for _ in range(2):
        sharded, diags = step(sharded, params)
        jax.block_until_ready(sharded.px)
        vals = check_plane_diags(diags, expect_particles=capacity + 1)
        deferred.append(vals["deferred"])
    assert deferred[0] >= 1, f"mover was not deferred at the full cell: {deferred}"
    # Delivered: the mover now resides in band 0 (row < 2).
    live = np.asarray(sharded.live)
    idsf = np.asarray(sharded.idsf)
    rows = np.argwhere(live & (idsf == 99.0))
    assert len(rows) == 1 and rows[0][0] < 2, (
        f"mover not delivered into band 0: slots {rows}, deferred {deferred}")


def test_plane_sharded_render_matches_single_chip(rng):
    """Distributed psum composite == the single-chip plane rasterizer image."""
    params, spec, ps = _setup(rng, n=200, n_bands=4, vmax=10.0)
    # 1 world unit = 1 px: 108 x 72 viewport
    rs = RenderSpec(width=108, height=72, max_radius_px=2)
    params = params._replace(particle_size=jnp.float32(2.0))
    mesh = make_band_mesh(4)
    frame = make_plane_sharded_frame(spec, mesh, rs, BOUNDS)
    sharded = shard_plane_state(ps, mesh)
    sharded2, image, diags = frame(sharded, params)
    jax.block_until_ready(image)
    check_plane_diags(diags)

    single = plane_step(ps, params, spec)
    want = render_plane_state(single, params, spec, rs, bounds_static=BOUNDS)
    np.testing.assert_allclose(
        np.asarray(image), np.asarray(want), rtol=0, atol=2.5e-2)
