"""Plane-resident rebin kernel + resident step: oracle parity, conservation, drops.

The rebin kernel must EXACTLY reproduce a per-cell bucketed oracle (same keying as
ops/grid.py::cell_coords, same candidate ordering: source row-major, then cell,
then slot).  The resident step must track the stream-resident step's trajectory on
identical states (tolerance: force sums accumulate in a different order).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import scatter_init
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL, rebin_planes
from rust_particle_system_tpu.ops.pallas.resident import (
    PlaneState,
    plane_state_from_particles,
    plane_step,
    to_particle_state,
)
from rust_particle_system_tpu.ops.pallas.sph_step import sph_step_pallas


def oracle_rebin(planes, spec):
    """Numpy oracle: bucket by key; order (source row, source cell, slot)."""
    gh, gw, C = planes[0].shape
    k = len(planes)
    ps = [np.asarray(p).reshape(gh * gw, C) for p in planes]
    out = [np.full((gh * gw, C), SENTINEL if c < 2 else 0.0, np.float32)
           for c in range(k)]
    counts = np.zeros(gh * gw, np.int64)
    buckets = [[] for _ in range(gh * gw)]
    cw, chh = spec.cell_width, spec.cell_size
    for cell in range(gh * gw):
        for s in range(C):
            x, y = ps[0][cell, s], ps[1][cell, s]
            if x >= 0.5 * SENTINEL:
                continue
            kx = min(max(int(np.floor((x - spec.x_min) / cw)), 0), gw - 1)
            ky = min(max(int(np.floor((y - spec.y_min) / chh)), 0), gh - 1)
            buckets[ky * gw + kx].append((cell, s))
    for cell in range(gh * gw):
        cy, cx = divmod(cell, gw)
        sel = []
        for dy in (-1, 0, 1):
            for (src, s) in buckets[cell]:
                sy, sx = divmod(src, gw)
                if sy == cy + dy and abs(sx - cx) <= 1:
                    sel.append((sy, src, s))
        sel.sort()
        counts[cell] = len(sel)
        for i, (_, src, s) in enumerate(sel[:C]):
            for c in range(k):
                out[c][cell, i] = ps[c][src, s]
    return [o.reshape(gh, gw, C) for o in out], counts


def _demo_planes(rng, spec, C, fill_frac, drift, k=4):
    gh, gw = spec.gh, spec.gw
    cw, chh = spec.cell_width, spec.cell_size
    chans = [np.full((gh, gw, C), SENTINEL, np.float32) for _ in range(2)] + [
        np.zeros((gh, gw, C), np.float32) for _ in range(k - 2)
    ]
    nid = 0
    for cy in range(gh):
        for cx in range(gw):
            n = rng.binomial(C, fill_frac)
            for s in range(n):
                x = spec.x_min + (cx + rng.random()) * cw
                y = spec.y_min + (cy + rng.random()) * chh
                chans[0][cy, cx, s] = x + (rng.random() * 2 - 1) * drift * cw
                chans[1][cy, cx, s] = y + (rng.random() * 2 - 1) * drift * chh
                for c in range(2, k):
                    chans[c][cy, cx, s] = rng.standard_normal() if c < k - 1 \
                        else float(nid)
                nid += 1
    return [jnp.asarray(c) for c in chans]


@pytest.mark.parametrize("variant", [2, 3])
@pytest.mark.parametrize("drift", [0.9, 1.8])
def test_rebin_matches_oracle(rng, variant, drift):
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=16)
    planes = _demo_planes(rng, spec, 16, 0.5, drift)
    want_planes, want_counts = oracle_rebin(planes, spec)
    got_planes, counts = rebin_planes(planes, spec, variant=variant)
    for c in range(len(planes)):
        np.testing.assert_array_equal(np.asarray(got_planes[c]),
                                      np.asarray(want_planes[c]))
    np.testing.assert_array_equal(np.asarray(counts), want_counts)


def test_rebin_overflow_counts_report_drops(rng):
    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=10.0, gw=3, gh=1, capacity=4)
    # 6 particles all keyed into the middle cell: capacity 4 -> 2 dropped.
    px = jnp.full((1, 3, 4), SENTINEL, jnp.float32)
    py = jnp.full((1, 3, 4), SENTINEL, jnp.float32)
    px = px.at[0, 0, :3].set(jnp.asarray([12.0, 13.0, 14.0]))
    py = py.at[0, 0, :3].set(5.0)
    px = px.at[0, 1, :3].set(jnp.asarray([15.0, 16.0, 17.0]))
    py = py.at[0, 1, :3].set(5.0)
    got, counts = rebin_planes([px, py], spec, variant=3)
    counts = np.asarray(counts)
    assert counts[1] == 6 and counts[0] == 0 and counts[2] == 0
    kept = np.asarray(got[0])[0, 1]
    assert np.all(kept < 0.5 * SENTINEL)  # all 4 slots filled
    assert int(np.sum(np.asarray(got[0]) < 0.5 * SENTINEL)) == 4


def _mini_setup(n=512, capacity=16):
    bounds = (-90.0, 90.0, -45.0, 45.0)
    params = make_params(bounds=bounds)
    spec = GridSpec.from_bounds(bounds, float(params.smoothing_radius), capacity)
    state = scatter_init(jax.random.key(0), n, bounds).with_ids()
    return params, spec, state


def test_plane_state_roundtrip():
    params, spec, state = _mini_setup()
    ps = plane_state_from_particles(state, spec)
    assert int(ps.lost) == 0
    back = to_particle_state(ps, params)
    order = np.argsort(np.asarray(back.ids))
    np.testing.assert_allclose(
        np.asarray(back.pos)[order], np.asarray(state.pos), rtol=0, atol=0
    )
    np.testing.assert_array_equal(np.asarray(back.ids)[order], np.arange(state.n))
    # Warm-up colour is white, as the stream state starts.
    np.testing.assert_array_equal(np.asarray(back.color), 1.0)


@pytest.mark.parametrize("variant", [3])
def test_plane_step_matches_stream_resident(variant):
    params, spec, state = _mini_setup()
    ps = plane_state_from_particles(state, spec)
    stream = state
    for _ in range(9):  # 5 warm-up + 4 live frames
        ps = plane_step(ps, params, spec, variant=variant)
        stream = sph_step_pallas(stream, params, spec, resident=True)
    assert int(ps.lost) == 0
    got = to_particle_state(ps, params)
    want = stream.in_original_order()
    g = np.asarray(got.pos)[np.argsort(np.asarray(got.ids))]
    w = np.asarray(want.pos)
    np.testing.assert_allclose(g, w, rtol=0, atol=5e-4)
    gv = np.asarray(got.vel)[np.argsort(np.asarray(got.ids))]
    wv = np.asarray(want.vel)
    np.testing.assert_allclose(gv, wv, rtol=0, atol=5e-3)


def test_plane_step_warmup_freezes_state():
    params, spec, state = _mini_setup(n=128)
    ps = plane_state_from_particles(state, spec)
    p0 = np.asarray(ps.px)
    ps2 = plane_step(ps, params, spec)
    assert int(ps2.frame) == 1
    np.testing.assert_array_equal(np.asarray(ps2.px), p0)


def test_plane_step_counts_escapes():
    params, spec, state = _mini_setup(n=64)
    ps = plane_state_from_particles(state, spec)
    # Launch one particle fast enough to cross > 1 cell in a frame.
    fast = dataclasses.replace(
        ps,
        vx=ps.vx.at[ps.live].set(0.0),
        frame=jnp.asarray(10, jnp.int32),
    )
    # give every live slot a huge velocity: all escape
    fast = dataclasses.replace(
        fast,
        vx=jnp.where(ps.live, 3.0 * spec.cell_width / float(params.dt), 0.0),
    )
    out = plane_step(fast, params, spec)
    # Expected escapes: live slots whose clipped destination cell is more than one
    # cell from the source cell (edge particles clip back within reach).
    dt = float(params.dt)
    live = np.asarray(ps.live)
    px, vx = np.asarray(fast.px), np.asarray(fast.vx)
    predx = px + vx * dt
    kx = np.clip(
        np.floor((predx - spec.x_min) / spec.cell_width).astype(int), 0,
        spec.gw - 1,
    )
    src_cx = np.broadcast_to(
        np.arange(spec.gw)[None, :, None], px.shape
    )
    escapes = int(np.sum(live & (np.abs(kx - src_cx) > 1)))
    assert escapes > 0
    assert int(out.lost) == escapes
