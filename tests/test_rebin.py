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


def oracle_hole_fill_pass(flats, spec, shift, row_only, fills):
    """Numpy mirror of one v4 pass: stayers keep slots, movers fill dest holes.

    Window semantics are FLAT (cell ∓ shift in the flattened cell stream), exactly
    as the kernel sees them — pass X's row-wrapped lanes are rejected by the full
    dest-cell compare, never by masking."""
    nc, C = flats[0].shape
    gw, gh = spec.gw, spec.gh
    cw, chh = spec.cell_width, spec.cell_size
    k = len(flats)
    out = [np.full((nc, C), f, np.float32) for f in fills]

    def dest(x, y):
        kx = min(max(int(np.floor((x - spec.x_min) / cw)), 0), gw - 1)
        ky = min(max(int(np.floor((y - spec.y_min) / chh)), 0), gh - 1)
        return kx, ky

    for cell in range(nc):
        cy, cx = divmod(cell, gw)
        stay = np.zeros(C, bool)
        for s in range(C):
            x, y = flats[0][cell, s], flats[1][cell, s]
            if x >= 0.5 * SENTINEL:
                continue
            kx, ky = dest(x, y)
            stay[s] = (ky == cy) if row_only else (ky == cy and kx == cx)
            if stay[s]:
                for c in range(k):
                    out[c][cell, s] = flats[c][cell, s]
        arrivals = []
        for src in (cell - shift, cell + shift):
            if not (0 <= src < nc):
                continue
            for s in range(C):
                x, y = flats[0][src, s], flats[1][src, s]
                if x >= 0.5 * SENTINEL:
                    continue
                kx, ky = dest(x, y)
                if (ky == cy) if row_only else (ky == cy and kx == cx):
                    arrivals.append((src, s))
        holes = [s for s in range(C) if not stay[s]]
        for r, (src, s) in enumerate(arrivals):
            if r >= len(holes):
                break
            for c in range(k):
                out[c][cell, holes[r]] = flats[c][src, s]
    return out


def oracle_rebin_v4(planes, spec):
    gh, gw, C = planes[0].shape
    k = len(planes)
    fills = [SENTINEL if c < 2 else 0.0 for c in range(k)]
    flats = [np.asarray(p).reshape(gh * gw, C).copy() for p in planes]
    flats = oracle_hole_fill_pass(flats, spec, gw, True, fills)
    flats = oracle_hole_fill_pass(flats, spec, 1, False, fills)
    counts = np.sum(np.asarray(flats[0]) < 0.5 * SENTINEL, axis=1)
    return [f.reshape(gh, gw, C) for f in flats], counts


@pytest.mark.parametrize("drift", [0.9, 1.8])
def test_rebin_v4_matches_pass_oracle(rng, drift):
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=16)
    planes = _demo_planes(rng, spec, 16, 0.5, drift)
    want_planes, want_counts = oracle_rebin_v4(planes, spec)
    got_planes, counts = rebin_planes(planes, spec, variant=4)
    for c in range(len(planes)):
        np.testing.assert_array_equal(np.asarray(got_planes[c]),
                                      np.asarray(want_planes[c]))
    np.testing.assert_array_equal(np.asarray(counts), want_counts)


def test_rebin_v4_multiset_matches_v3_when_no_drops(rng):
    """With capacity headroom, v4 must place exactly the same particles in every
    cell as the full-window v3 — only the slot ORDER differs (v4 keeps stayers in
    place and tolerates holes)."""
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=32)
    planes = _demo_planes(rng, spec, 32, 0.25, 0.9)  # ~8/32 slots: no overflow
    v3_planes, v3_counts = rebin_planes(planes, spec, variant=3)
    v4_planes, v4_counts = rebin_planes(planes, spec, variant=4)
    assert np.all(np.asarray(v3_counts) <= 32)
    np.testing.assert_array_equal(np.asarray(v3_counts), np.asarray(v4_counts))
    nc = spec.num_cells
    a = [np.asarray(p).reshape(nc, 32) for p in v3_planes]
    b = [np.asarray(p).reshape(nc, 32) for p in v4_planes]
    for cell in range(nc):
        live3 = a[0][cell] < 0.5 * SENTINEL
        live4 = b[0][cell] < 0.5 * SENTINEL
        m3 = sorted(map(tuple, np.stack([p[cell][live3] for p in a], -1)))
        m4 = sorted(map(tuple, np.stack([p[cell][live4] for p in b], -1)))
        assert m3 == m4, f"cell {cell} multiset mismatch"


def test_rebin_v4_stayers_keep_slots(rng):
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=16)
    planes = _demo_planes(rng, spec, 16, 0.5, 0.9)
    got, _ = rebin_planes(planes, spec, variant=4)
    px = np.asarray(planes[0]).reshape(-1, 16)
    py = np.asarray(planes[1]).reshape(-1, 16)
    npx = np.asarray(got[0]).reshape(-1, 16)
    cw, chh = spec.cell_width, spec.cell_size
    cellc = np.arange(spec.num_cells)[:, None]
    kx = np.clip(np.floor((px - spec.x_min) / cw).astype(int), 0, spec.gw - 1)
    ky = np.clip(np.floor((py - spec.y_min) / chh).astype(int), 0, spec.gh - 1)
    stay = (px < 0.5 * SENTINEL) & (ky * spec.gw + kx == cellc)
    np.testing.assert_array_equal(npx[stay], px[stay])


def test_rebin_v4_conservation_with_drops(rng):
    """Crowded grid: live_out + implied drops == live_in; no particle duplicated."""
    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=10.0, gw=4, gh=2, capacity=4)
    rng_ = np.random.default_rng(3)
    px = np.full((2, 4, 4), SENTINEL, np.float32)
    py = np.full((2, 4, 4), SENTINEL, np.float32)
    ids = np.zeros((2, 4, 4), np.float32)
    nid = 0
    for cy in range(2):
        for cx in range(4):
            for s in range(4):
                px[cy, cx, s] = np.clip(
                    cx * 10 + rng_.uniform(-8, 18), 0.1, 39.9)
                py[cy, cx, s] = np.clip(
                    cy * 10 + rng_.uniform(-8, 18), 0.1, 19.9)
                ids[cy, cx, s] = float(nid)
                nid += 1
    planes = [jnp.asarray(px), jnp.asarray(py), jnp.asarray(ids)]
    got, counts = rebin_planes(planes, spec, variant=4,
                               fills=(SENTINEL, SENTINEL, -1.0))
    live = np.asarray(got[0]) < 0.5 * SENTINEL
    out_ids = np.asarray(got[2])[live]
    assert len(out_ids) == int(np.asarray(counts).sum()) <= nid
    assert len(np.unique(out_ids)) == len(out_ids)  # no duplication
    assert np.all(out_ids >= 0)


def oracle_hole_fill_pass_v5(flats, spec, shift, row_only, fills):
    """Numpy mirror of one LOSSLESS (v5) pass: holes = dead slots only, clamped
    adoption toward the source, un-adopted movers retained in place."""
    nc, C = flats[0].shape
    gw, gh = spec.gw, spec.gh
    cw, chh = spec.cell_width, spec.cell_size
    k = len(flats)
    out = [np.full((nc, C), f, np.float32) for f in fills]
    adopted = np.zeros((nc, C), bool)

    def dest(x, y):
        kx = min(max(int(np.floor((x - spec.x_min) / cw)), 0), gw - 1)
        ky = min(max(int(np.floor((y - spec.y_min) / chh)), 0), gh - 1)
        return kx, ky

    def live(cell, s):
        return flats[0][cell, s] < 0.5 * SENTINEL

    for cell in range(nc):
        cy, cx = divmod(cell, gw)
        for s in range(C):
            if not live(cell, s):
                continue
            kx, ky = dest(flats[0][cell, s], flats[1][cell, s])
            stay = (ky == cy) if row_only else (ky != cy or kx == cx)
            if stay:
                for c in range(k):
                    out[c][cell, s] = flats[c][cell, s]
    for cell in range(nc):
        cy, cx = divmod(cell, gw)
        holes = [s for s in range(C) if not live(cell, s)]
        arrivals = []
        for gi, src in enumerate((cell - shift, cell + shift)):
            if not (0 <= src < nc):
                continue
            if not row_only and (src // gw) != cy:
                continue  # flat-shift wrap at a row edge: not a real neighbor
            for s in range(C):
                if not live(src, s):
                    continue
                kx, ky = dest(flats[0][src, s], flats[1][src, s])
                if row_only:
                    ok = (ky >= cy) if gi == 0 else (ky <= cy)
                else:
                    ok = ky == cy and ((kx >= cx) if gi == 0 else (kx <= cx))
                if ok:
                    arrivals.append((src, s))
        for r, (src, s) in enumerate(arrivals):
            if r >= len(holes):
                break
            for c in range(k):
                out[c][cell, holes[r]] = flats[c][src, s]
            adopted[src, s] = True
    for cell in range(nc):
        cy, cx = divmod(cell, gw)
        for s in range(C):
            if not live(cell, s) or adopted[cell, s]:
                continue
            kx, ky = dest(flats[0][cell, s], flats[1][cell, s])
            mover = (ky != cy) if row_only else (ky == cy and kx != cx)
            if mover:  # un-adopted mover: retained in place
                for c in range(k):
                    out[c][cell, s] = flats[c][cell, s]
    return out


def oracle_rebin_v5(planes, spec):
    gh, gw, C = planes[0].shape
    k = len(planes)
    fills = [SENTINEL if c < 2 else 0.0 for c in range(k)]
    flats = [np.asarray(p).reshape(gh * gw, C).copy() for p in planes]
    flats = oracle_hole_fill_pass_v5(flats, spec, gw, True, fills)
    flats = oracle_hole_fill_pass_v5(flats, spec, 1, False, fills)
    counts = np.sum(np.asarray(flats[0]) < 0.5 * SENTINEL, axis=1)
    return [f.reshape(gh, gw, C) for f in flats], counts


@pytest.mark.parametrize("variant", [5, 6])
@pytest.mark.parametrize("drift", [0.9, 1.8])
def test_rebin_v5_matches_pass_oracle(rng, drift, variant):
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=16)
    planes = _demo_planes(rng, spec, 16, 0.6, drift)
    want_planes, want_counts = oracle_rebin_v5(planes, spec)
    got_planes, counts = rebin_planes(planes, spec, variant=variant)
    for c in range(len(planes)):
        np.testing.assert_array_equal(np.asarray(got_planes[c]),
                                      np.asarray(want_planes[c]))
    np.testing.assert_array_equal(np.asarray(counts), want_counts)


@pytest.mark.parametrize("variant", [5, 6])
def test_rebin_v5_never_drops(rng, variant):
    """Severely crowded grid (many cells at full capacity): every particle must
    survive the rebin, bit-identically, with no duplicates."""
    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=10.0, gw=4, gh=2, capacity=4)
    rng_ = np.random.default_rng(3)
    px = np.zeros((2, 4, 4), np.float32)
    py = np.zeros((2, 4, 4), np.float32)
    ids = np.zeros((2, 4, 4), np.float32)
    nid = 0
    for cy in range(2):
        for cx in range(4):
            for s in range(4):  # every slot full; heavy cross-cell movement
                px[cy, cx, s] = np.clip(cx * 10 + rng_.uniform(-8, 18), 0.1, 39.9)
                py[cy, cx, s] = np.clip(cy * 10 + rng_.uniform(-8, 18), 0.1, 19.9)
                ids[cy, cx, s] = float(nid)
                nid += 1
    planes = [jnp.asarray(px), jnp.asarray(py), jnp.asarray(ids)]
    got, counts = rebin_planes(planes, spec, variant=variant,
                               fills=(SENTINEL, SENTINEL, -1.0))
    live = np.asarray(got[0]) < 0.5 * SENTINEL
    out_ids = np.sort(np.asarray(got[2])[live])
    np.testing.assert_array_equal(out_ids, np.arange(nid, dtype=np.float32))
    assert int(np.asarray(counts).sum()) == nid


@pytest.mark.parametrize("variant", [5, 6])
def test_rebin_v5_fast_particle_hops_toward_destination(rng, variant):
    """A >1-cell/frame mover is not dropped: it hops one cell per rebin call
    toward its destination and arrives after ceil(distance) calls."""
    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=10.0, gw=6, gh=1, capacity=4)
    px = np.full((1, 6, 4), SENTINEL, np.float32)
    py = np.full((1, 6, 4), SENTINEL, np.float32)
    px[0, 0, 0] = 45.0  # sits in cell 0's slots, position is in cell 4
    py[0, 0, 0] = 5.0
    planes = [jnp.asarray(px), jnp.asarray(py)]
    for hop in range(1, 5):
        planes, counts = rebin_planes(planes, spec, variant=variant)
        live = np.asarray(planes[0]) < 0.5 * SENTINEL
        assert int(live.sum()) == 1, f"particle lost at hop {hop}"
        cell = int(np.argwhere(live.reshape(6, 4))[0][0])
        assert cell == min(hop, 4), f"hop {hop}: resident cell {cell}"
        planes = [jnp.asarray(p) for p in planes]
    # Arrived: destination == resident cell, stays put on further rebins.
    planes, _ = rebin_planes(planes, spec, variant=variant)
    live = np.asarray(planes[0]) < 0.5 * SENTINEL
    assert int(np.argwhere(live.reshape(6, 4))[0][0]) == 4


@pytest.mark.parametrize("variant", [5, 6])
def test_rebin_v5_no_wrap_duplication(variant):
    """Regression (found by the 1M conservation bench): an in-transit particle
    sitting in the LAST column satisfies the clamped pass-X keep test of the
    next row's FIRST cell through the flat-shift wrap — it must not be adopted
    there (duplication) nor dropped."""
    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=10.0, gw=3, gh=2, capacity=2)
    px = np.full((2, 3, 2), SENTINEL, np.float32)
    py = np.full((2, 3, 2), SENTINEL, np.float32)
    ids = np.zeros((2, 3, 2), np.float32)
    # Cell (1,2) full of stayers -> the mover below cannot be adopted in pass Y.
    px[1, 2] = [25.0, 26.0]
    py[1, 2] = [15.0, 16.0]
    ids[1, 2] = [1.0, 2.0]
    # In-transit mover: resident (0,2), destination (1,2).
    px[0, 2, 0] = 27.0
    py[0, 2, 0] = 17.0
    ids[0, 2, 0] = 3.0
    planes = [jnp.asarray(px), jnp.asarray(py), jnp.asarray(ids)]
    got, counts = rebin_planes(planes, spec, variant=variant,
                               fills=(SENTINEL, SENTINEL, -1.0))
    live = np.asarray(got[0]) < 0.5 * SENTINEL
    out_ids = np.sort(np.asarray(got[2])[live])
    np.testing.assert_array_equal(out_ids, [1.0, 2.0, 3.0])  # no dup, no loss
    # the mover is retained at its source cell (0,2), not teleported to (1,0)
    assert not live[1, 0].any()
    assert live[0, 2, 0]


def test_rebin_v5_matches_v4_when_no_overflow(rng):
    """With capacity headroom and sub-cell drift, v4 and v5 place the same
    particles in every cell (multisets equal; slot order may differ)."""
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=32)
    planes = _demo_planes(rng, spec, 32, 0.25, 0.9)
    a4, c4 = rebin_planes(planes, spec, variant=4)
    a5, c5 = rebin_planes(planes, spec, variant=5)
    np.testing.assert_array_equal(np.asarray(c4), np.asarray(c5))
    nc = spec.num_cells
    a = [np.asarray(p).reshape(nc, 32) for p in a4]
    b = [np.asarray(p).reshape(nc, 32) for p in a5]
    for cell in range(nc):
        l4 = a[0][cell] < 0.5 * SENTINEL
        l5 = b[0][cell] < 0.5 * SENTINEL
        m4 = sorted(map(tuple, np.stack([p[cell][l4] for p in a], -1)))
        m5 = sorted(map(tuple, np.stack([p[cell][l5] for p in b], -1)))
        assert m4 == m5, f"cell {cell} multiset mismatch"


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


def test_plane_step_retains_escapes_lossless():
    """>1-cell/frame movers are NOT dropped under the default (v5) rebin: they
    hop one cell per frame toward their destination; lost never grows."""
    params, spec, state = _mini_setup(n=64)
    ps = plane_state_from_particles(state, spec)
    # give every live slot a huge velocity: all would escape a 3x3 window
    fast = dataclasses.replace(
        ps,
        vx=jnp.where(ps.live, 3.0 * spec.cell_width / float(params.dt), 0.0),
        frame=jnp.asarray(10, jnp.int32),
    )
    live_before = int(np.asarray(ps.live).sum())
    out = plane_step(fast, params, spec)
    assert int(out.lost) == int(ps.lost)  # lossless: no new drops, ever
    assert int(np.asarray(out.live).sum()) == live_before
    # The legacy lossy variant (4) drops exactly the escapes.
    dt = float(params.dt)
    live = np.asarray(ps.live)
    px, vx = np.asarray(fast.px), np.asarray(fast.vx)
    predx = px + vx * dt
    kx = np.clip(
        np.floor((predx - spec.x_min) / spec.cell_width).astype(int), 0,
        spec.gw - 1,
    )
    src_cx = np.broadcast_to(np.arange(spec.gw)[None, :, None], px.shape)
    escapes = int(np.sum(live & (np.abs(kx - src_cx) > 1)))
    assert escapes > 0
    out4 = plane_step(fast, params, spec, variant=4)
    assert int(out4.lost) - int(ps.lost) == escapes


@pytest.mark.parametrize("drift", [0.4, 0.9, 1.8])
def test_rebin_v6_bit_identical_to_v5(rng, drift):
    """v6 (row-fused single kernel) must reproduce v5's output BIT-FOR-BIT —
    same slots, same order, same counts — including crowded cells, edge rows
    and in-transit movers."""
    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=7,
                    capacity=16)
    planes = _demo_planes(rng, spec, 16, 0.7, drift)
    a5, c5 = rebin_planes(planes, spec, variant=5)
    a6, c6 = rebin_planes(planes, spec, variant=6)
    for c in range(len(planes)):
        np.testing.assert_array_equal(np.asarray(a6[c]), np.asarray(a5[c]))
    np.testing.assert_array_equal(np.asarray(c6), np.asarray(c5))


def test_init_overflow_spills_to_neighbor_losslessly(rng):
    """Initial binning must not drop capacity overflow: extra particles spill
    to the nearest free neighbor cell (the reference never drops a particle —
    its sorted runs are unbounded, compute_shader.wgsl:455-525), arrive as
    deferred movers, and stepping conserves them."""
    from rust_particle_system_tpu.core.state import make_state

    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=9.0, gw=9, gh=9,
                    capacity=16)
    n = 20  # 4 over the center cell's capacity
    pos = np.stack(
        [36.0 + 4.5 + rng.uniform(-2, 2, n),
         36.0 + 4.5 + rng.uniform(-2, 2, n)], axis=-1).astype(np.float32)
    state = make_state(jnp.asarray(pos)).with_ids()

    ps_drop = plane_state_from_particles(state, spec, spill_overflow=False)
    assert int(ps_drop.lost) == 4  # the legacy drop contract

    ps = plane_state_from_particles(state, spec)
    assert int(ps.lost) == 0
    live = np.asarray(ps.live)
    assert int(live.sum()) == n
    # every id present exactly once
    ids = np.sort(np.asarray(ps.idsf)[live].astype(int))
    np.testing.assert_array_equal(ids, np.arange(n))
    # home cell full; the 4 spills sit in its 3x3 ring (all adjacent free)
    cnt = live.sum(axis=-1)
    assert cnt[4, 4] == 16
    ring = cnt[3:6, 3:6].sum() - cnt[4, 4]
    assert ring == 4
    # stepping keeps the spills (deferred movers, lossless rebin)
    params = make_params(bounds=(0.0, 81.0, 0.0, 81.0), gravity=0.0,
                         shader_delay=0)
    out = plane_step(ps, params, spec)
    assert int(out.lost) == 0
    assert int(np.asarray(out.live).sum()) == n


def test_init_overflow_with_packed_neighborhood_reports_lost(rng):
    """When a cell's whole 5x5 neighborhood is packed solid, overflow cannot
    spill — it must be counted in ``lost`` honestly (not silently vanish, not
    crash the spill loop)."""
    from rust_particle_system_tpu.core.state import make_state

    spec = GridSpec(x_min=0.0, y_min=0.0, cell_size=9.0, gw=9, gh=9,
                    capacity=8)
    pts = []
    for cy in range(2, 7):
        for cx in range(2, 7):
            extra = 3 if (cy, cx) == (4, 4) else 0
            for s in range(8 + extra):
                pts.append([cx * 9.0 + 1.0 + 0.5 * s, cy * 9.0 + 4.5])
    pos = np.asarray(pts, np.float32)
    state = make_state(jnp.asarray(pos)).with_ids()
    ps = plane_state_from_particles(state, spec)
    assert int(ps.lost) == 3  # 5x5 solid: nothing can spill
    assert int(np.asarray(ps.live).sum()) == len(pts) - 3


@pytest.mark.parametrize("drift", [0.4, 0.9, 1.8])
@pytest.mark.parametrize("n_bands", [2, 4])
def test_rebin_v6_band_bit_identical_to_full(rng, drift, n_bands):
    """The band-sharded v6 driver (_rebin_v6_band) fed the 2-deep ghost rows a
    ppermute would deliver must reproduce the full-plane v6 rebin BIT-FOR-BIT
    per band slab — including mesh-edge bands, whose ghost rows are ZEROS (the
    ppermute edge value): every neighbor-row read must be guarded by the
    kernel's global-row edge conditions."""
    from rust_particle_system_tpu.ops.pallas.rebin import _rebin_v6_band

    spec = GridSpec(x_min=-90.0, y_min=-45.0, cell_size=9.0, gw=11, gh=8,
                    capacity=16)
    planes = _demo_planes(rng, spec, 16, 0.7, drift)
    planes = [jnp.asarray(p) for p in planes]
    full, cfull = rebin_planes(planes, spec, variant=6)
    R = spec.gh // n_bands
    k = len(planes)
    gw, C = spec.gw, spec.capacity
    zeros = jnp.zeros((gw, C), jnp.float32)
    for b in range(n_bands):
        r0 = b * R
        slab = [p[r0 : r0 + R] for p in planes]
        # ghosts exactly as the mesh would deliver them (zeros past the edge)
        lo1 = [p[r0 - 1] if r0 >= 1 else zeros for p in planes]
        hi1 = [p[r0 + R] if r0 + R < spec.gh else zeros for p in planes]
        lo2 = [planes[c][r0 - 2] if r0 >= 2 else zeros for c in (0, 1)]
        out, cnts = _rebin_v6_band(slab, spec, (SENTINEL, SENTINEL, 0.0, 0.0),
                                   jnp.asarray(r0, jnp.int32), lo2, lo1, hi1,
                                   interpret=True)
        for c in range(k):
            np.testing.assert_array_equal(
                np.asarray(out[c]), np.asarray(full[c][r0 : r0 + R]),
                err_msg=f"band {b} channel {c}")
        np.testing.assert_array_equal(
            np.asarray(cnts),
            np.asarray(cfull[r0 * gw : (r0 + R) * gw]))


@pytest.mark.parametrize("variant", [5, 6])
def test_plane_step_fused_tail_matches_xla_tail(variant):
    """fuse_tail=True (integrate/bounce/defer-restore in the walk epilogue) must
    reproduce the XLA tail to FMA-rounding tolerance (the two compilation
    contexts fuse the same expressions differently — measured 1-ulp drift),
    with identity conservation exact."""
    params, spec, state = _mini_setup(n=700, capacity=16)
    params = params._replace(shader_delay=jnp.asarray(0, jnp.int32),
                             gravity=jnp.float32(600.0))
    a = plane_state_from_particles(state, spec)
    b = a
    for _ in range(6):
        a = plane_step(a, params, spec, variant=variant, fuse_tail=False)
        b = plane_step(b, params, spec, variant=variant, fuse_tail=True)
    assert int(b.lost) == int(a.lost)
    la, lb = np.asarray(a.live), np.asarray(b.live)
    np.testing.assert_array_equal(
        np.sort(np.asarray(a.idsf)[la]), np.sort(np.asarray(b.idsf)[lb]))
    sa = to_particle_state(a, params)
    sb = to_particle_state(b, params)
    oa = np.argsort(np.asarray(sa.ids))
    ob = np.argsort(np.asarray(sb.ids))
    np.testing.assert_allclose(np.asarray(sb.pos)[ob], np.asarray(sa.pos)[oa],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sb.vel)[ob], np.asarray(sa.vel)[oa],
                               rtol=0, atol=1e-3)


def test_plane_step_fused_tail_handles_deferred_chunks():
    """A state where EVERY live slot is deferred (all movers, full dest cells):
    the occupancy-gated empty-chunk path must still run the epilogue — deferred
    particles keep their predicted position + post-gravity velocity (bounced),
    and none vanish."""
    params, spec, state = _mini_setup(n=256, capacity=16)
    params = params._replace(shader_delay=jnp.asarray(0, jnp.int32))
    ps = plane_state_from_particles(state, spec)
    fast = dataclasses.replace(
        ps,
        vx=jnp.where(ps.live, 3.0 * spec.cell_width / float(params.dt), 0.0),
        frame=jnp.asarray(10, jnp.int32),
    )
    live_before = int(np.asarray(ps.live).sum())
    a = plane_step(fast, params, spec, fuse_tail=False)
    b = plane_step(fast, params, spec, fuse_tail=True)
    assert int(np.asarray(b.live).sum()) == live_before
    for f in ("px", "py", "vx", "vy", "idsf"):
        np.testing.assert_array_equal(np.asarray(getattr(b, f)),
                                      np.asarray(getattr(a, f)), err_msg=f)
