"""Parity tests: Pallas SPH force kernels vs the pure-JAX grid step (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.grid_step import grid_step
from rust_particle_system_tpu.ops.pallas.sph_step import sph_step_pallas
from rust_particle_system_tpu.ops.reference_step import reference_step

BOUNDS = (-100.0, 100.0, -50.0, 50.0)


def _random_state(rng, n, vmax=20.0):
    x_min, x_max, y_min, y_max = BOUNDS
    pos = np.stack(
        [rng.uniform(x_min, x_max, n), rng.uniform(y_min, y_max, n)], axis=-1
    ).astype(np.float32)
    vel = rng.uniform(-vmax, vmax, (n, 2)).astype(np.float32)
    return pos, vel


@pytest.mark.parametrize("capacity", [32, 64])
def test_pallas_step_matches_grid_step(rng, capacity):
    n = 300
    pos, vel = _random_state(rng, n)
    params = make_params(bounds=BOUNDS, gravity=100.0, shader_delay=0)
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=capacity)
    state = make_state(pos, vel)

    want = grid_step(state, params, spec)
    got = sph_step_pallas(state, params, spec)

    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(want.pos), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(want.vel), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got.color), np.asarray(want.color), rtol=1e-3, atol=1e-3)


def test_pallas_step_matches_oracle_multi_frame(rng):
    n = 96
    pos, vel = _random_state(rng, n, vmax=10.0)
    params = make_params(bounds=BOUNDS, gravity=150.0, shader_delay=0)
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=64)

    s_pallas = make_state(pos, vel)
    s_ref = make_state(pos, vel)
    ref_step = jax.jit(reference_step)
    for _ in range(6):
        s_pallas = sph_step_pallas(s_pallas, params, spec)
        s_ref = ref_step(s_ref, params)
    np.testing.assert_allclose(
        np.asarray(s_pallas.pos), np.asarray(s_ref.pos), rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(s_pallas.vel), np.asarray(s_ref.vel), rtol=1e-3, atol=5e-2
    )


def test_pallas_step_coincident_particles_finite():
    pos = np.zeros((4, 2), np.float32)
    params = make_params(bounds=BOUNDS, shader_delay=0)
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=16)
    out = sph_step_pallas(make_state(pos), params, spec)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    assert np.all(np.isfinite(np.asarray(out.vel)))


def test_pallas_step_warmup_identity(rng):
    n = 64
    pos, vel = _random_state(rng, n)
    params = make_params(bounds=BOUNDS, gravity=400.0, shader_delay=2)
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=32)
    s = make_state(pos, vel)
    for _ in range(2):
        s = sph_step_pallas(s, params, spec)
    np.testing.assert_array_equal(np.asarray(s.pos), pos)
    assert int(s.frame) == 2


def test_pallas_pack2_matches_grid_step(rng):
    """Pair-packed layout (two cells per lane row, B-unit neighbors) parity."""
    n = 400
    pos, vel = _random_state(rng, n)
    params = make_params(bounds=BOUNDS, gravity=100.0, shader_delay=0)
    spec_ref = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=64)
    spec_pk = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=64, pack2=True)
    state = make_state(pos, vel)

    want = state
    got = state
    for _ in range(3):
        want = grid_step(want, params, spec_ref)
        got = sph_step_pallas(got, params, spec_pk)

    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(want.pos), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(want.vel), rtol=1e-3, atol=1e-2)


def test_pallas_pack2_odd_grid_width(rng):
    """Odd cell-column counts pad a dead cell into the last A/B unit."""
    bounds = (-95.0, 95.0, -50.0, 50.0)  # gw = floor(190/9)+1 = 22 -> try 9.5 for odd
    n = 200
    x_min, x_max, y_min, y_max = bounds
    pos = np.stack(
        [rng.uniform(x_min, x_max, n), rng.uniform(y_min, y_max, n)], axis=-1
    ).astype(np.float32)
    params = make_params(bounds=bounds, gravity=50.0, shader_delay=0,
                         smoothing_radius=9.5)
    spec_ref = GridSpec.from_bounds(bounds, cell_size=9.5, capacity=64)
    spec_pk = GridSpec.from_bounds(bounds, cell_size=9.5, capacity=64, pack2=True)
    assert spec_pk.gw % 2 == 1, "test intends an odd grid width"
    state = make_state(pos)
    want = grid_step(state, params, spec_ref)
    got = sph_step_pallas(state, params, spec_pk)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(want.pos), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(want.vel), rtol=1e-3, atol=1e-2)


def test_resident_step_matches_original_order(rng):
    """Sorted-resident frames vs original-order frames, reordered back via ids.

    Frame 1 is BITWISE equal (identical input rows -> identical sorted layout).
    Later frames agree only to float tolerance: the stable sort breaks key ties by
    input row order, so the resident state (rows already cell-sorted) assigns tied
    particles to different lanes and pair sums accumulate in a different order —
    the same determinism class as any input permutation of the non-resident step.
    """
    n = 400
    pos, vel = _random_state(rng, n)
    params = make_params(bounds=BOUNDS, gravity=100.0, shader_delay=0)
    for spec in (
        GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=32),
        GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=32, pack2=True),
    ):
        s_plain = make_state(pos, vel)
        s_res = make_state(pos, vel).with_ids()
        s_plain = sph_step_pallas(s_plain, params, spec)
        s_res = sph_step_pallas(s_res, params, spec, resident=True)
        back1 = s_res.in_original_order()
        np.testing.assert_array_equal(np.asarray(back1.pos), np.asarray(s_plain.pos))
        np.testing.assert_array_equal(np.asarray(back1.vel), np.asarray(s_plain.vel))

        for _ in range(3):
            s_plain = sph_step_pallas(s_plain, params, spec)
            s_res = sph_step_pallas(s_res, params, spec, resident=True)
        back = s_res.in_original_order()
        assert np.array_equal(np.asarray(back.ids), np.arange(n))
        np.testing.assert_allclose(
            np.asarray(back.pos), np.asarray(s_plain.pos), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(back.vel), np.asarray(s_plain.vel), rtol=1e-3, atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(back.color), np.asarray(s_plain.color), rtol=1e-2, atol=1e-2
        )
        assert int(back.frame) == int(s_plain.frame)


def test_chunk_split_gating_is_identical_to_ungated():
    """The occupancy-gating chunk pattern must be a pure skip optimization:
    walk outputs with the production CHUNK_SPLITS, with uniform chunks, and
    with a single full-width chunk agree bitwise (gated-away chunks hold only
    dead slots, whose outputs are never read back live)."""
    import rust_particle_system_tpu.ops.pallas.sph as sphmod
    from rust_particle_system_tpu.core.params import make_params
    from rust_particle_system_tpu.core.state import make_state
    from rust_particle_system_tpu.ops.grid import GridSpec
    from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL
    from rust_particle_system_tpu.ops.pallas.resident import (
        plane_state_from_particles,
    )
    from rust_particle_system_tpu.ops.pallas.sph_step import _forces_from_cells

    bounds = (-72.0, 72.0, -36.0, 36.0)
    spec = GridSpec.from_bounds(bounds, 9.0, capacity=64, cell_aspect=1,
                                pack2=True)
    params = make_params(bounds=bounds, gravity=300.0, shader_delay=0)
    key = jax.random.key(11)
    kx, ky = jax.random.split(key)
    n = 900
    pos = jnp.stack(
        [jax.random.uniform(kx, (n,), minval=bounds[0], maxval=bounds[1]),
         jax.random.uniform(ky, (n,), minval=bounds[2], maxval=bounds[3])],
        axis=-1)
    ps = plane_state_from_particles(make_state(pos), spec)
    live = np.asarray(ps.px < 0.5 * SENTINEL)

    saved = (sphmod.CHUNK_SPLITS, sphmod.CHUNK_OVERRIDE)
    outs = {}
    try:
        for label, splits, override in (
            ("production", (0.0, 0.625, 0.75, 0.875, 1.0), 0),
            ("uniform16", None, 16),
            ("fullwidth", None, 128),
        ):
            sphmod.CHUNK_SPLITS = splits
            sphmod.CHUNK_OVERRIDE = override
            nvx, nvy = _forces_from_cells(ps.px, ps.py, ps.vx, ps.vy, spec,
                                          params, True)
            outs[label] = (np.asarray(nvx), np.asarray(nvy))
    finally:
        sphmod.CHUNK_SPLITS, sphmod.CHUNK_OVERRIDE = saved

    ref = outs["fullwidth"]
    for label in ("production", "uniform16"):
        for a, b in zip(outs[label], ref):
            assert np.array_equal(a[live], b[live]), label
