"""Tests for the plane-resident fused frame (plane_frame) and its patch-margin
defaulting — the production step+render path (models/sph.py step_and_render).

Regression anchor: the tight-patch margin default (radius + 1 px drift slack)
must clamp to what the pixel stride allows — stride-9 geometries with
max_radius_px=4 previously picked margin 5 and tripped the rasterizer's
``stride >= 2*margin`` precondition at trace time (found by an on-TPU drive of
SPHFluid.create(...max_radius_px=4).step_and_render).
"""

import jax
import numpy as np

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import (
    PlaneState,
    plane_frame,
    plane_state_from_particles,
    plane_step,
    render_plane_state,
)
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_planes import drifted_patch_margin

BOUNDS = (-96.0, 96.0, -54.0, 54.0)


def _plane_state(rng, n, spec, vmax=10.0):
    pos = np.stack(
        [rng.uniform(BOUNDS[0], BOUNDS[1], n), rng.uniform(BOUNDS[2], BOUNDS[3], n)],
        axis=-1,
    ).astype(np.float32)
    vel = rng.uniform(-vmax, vmax, (n, 2)).astype(np.float32)
    return plane_state_from_particles(make_state(pos, vel), spec)


def test_drifted_patch_margin_clamps_to_stride():
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=16)
    # 1 unit/px -> 9 px stride; radius 4 wants margin 5, stride allows 4.
    rs4 = RenderSpec(width=192, height=108, max_radius_px=4)
    assert drifted_patch_margin(spec, rs4, BOUNDS) == 4
    # radius 2 fits the tight default untouched.
    rs2 = RenderSpec(width=192, height=108, max_radius_px=2)
    assert drifted_patch_margin(spec, rs2, BOUNDS) == 3
    # explicit wide-patch request floors at the radius, caps at MARGIN (4).
    assert drifted_patch_margin(spec, rs2, BOUNDS, patch_margin=4) == 4
    assert drifted_patch_margin(spec, rs4, BOUNDS, patch_margin=2) == 4
    # no static bounds: uncapped tight default.
    assert drifted_patch_margin(spec, rs2, None) == 3


def test_plane_frame_coarse_pixel_geometry(rng):
    """Stride-9 px + max_radius_px=4 must trace and render (the regression)."""
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=16)
    rs = RenderSpec(width=192, height=108, max_radius_px=4)
    params = make_params(bounds=BOUNDS, gravity=120.0, shader_delay=0)
    ps = _plane_state(np.random.default_rng(0), 300, spec)
    new_ps, img = plane_frame(ps, params, spec, rs, bounds_static=BOUNDS)
    assert img.shape == (108, 192, 4)
    assert np.isfinite(np.asarray(img)).all()
    assert int(new_ps.frame) == int(ps.frame) + 1
    # the standalone plane render accepts the same geometry
    img2 = render_plane_state(new_ps, params, spec, rs, bounds_static=BOUNDS)
    assert np.isfinite(np.asarray(img2)).all()


def test_plane_frame_state_matches_plane_step(rng):
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=16)
    rs = RenderSpec(width=192, height=108, max_radius_px=2)
    params = make_params(bounds=BOUNDS, gravity=120.0, shader_delay=0)
    ps = _plane_state(np.random.default_rng(1), 300, spec)
    want = plane_step(ps, params, spec)
    got, _img = plane_frame(ps, params, spec, rs, bounds_static=BOUNDS)
    for f in ("px", "py", "vx", "vy", "idsf"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            rtol=1e-6, atol=1e-6, err_msg=f)
    assert int(got.frame) == int(want.frame)


def test_plane_frame_image_matches_standalone_render(rng):
    """The fused image equals rendering the end state standalone (both draw the
    same end-of-frame positions; slot arrangement differs only in summation
    order and within-slack drift clamping, which small velocities keep inert)."""
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=16)
    rs = RenderSpec(width=192, height=108, max_radius_px=2)
    params = make_params(bounds=BOUNDS, gravity=60.0, shader_delay=0)
    ps = _plane_state(np.random.default_rng(2), 250, spec, vmax=4.0)
    new_ps, img = plane_frame(ps, params, spec, rs, bounds_static=BOUNDS)
    want = render_plane_state(new_ps, params, spec, rs, bounds_static=BOUNDS)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_plane_frame_warmup_frozen(rng):
    spec = GridSpec.from_bounds(BOUNDS, cell_size=9.0, capacity=16)
    rs = RenderSpec(width=192, height=108, max_radius_px=2)
    params = make_params(bounds=BOUNDS, gravity=120.0, shader_delay=5)
    ps = _plane_state(np.random.default_rng(3), 200, spec)
    new_ps, img = plane_frame(ps, params, spec, rs, bounds_static=BOUNDS)
    np.testing.assert_array_equal(np.asarray(new_ps.px), np.asarray(ps.px))
    np.testing.assert_array_equal(np.asarray(new_ps.vy), np.asarray(ps.vy))
    assert int(new_ps.frame) == int(ps.frame) + 1
    assert np.isfinite(np.asarray(img)).all()
