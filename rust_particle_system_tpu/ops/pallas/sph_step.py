"""Full SPH frame with Pallas force kernels — the production single-chip step.

Assembly: XLA does what XLA is best at (the 1M-key radix sort, gathers, elementwise
integrate/bounce/colour); Pallas does the three neighborhood passes where the pairwise
FLOPs live.  Same bulk-synchronous spec as ``ops/grid_step.py`` (its parity oracle) and
``ops/reference_step.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import kernels as K
from ...core.params import SimParams
from ...core.state import ParticleState
from ...ops.grid import GridSpec, build_grid
from .plane_build import cell_planes_aos
from .sph import (
    _SENTINEL,
    _grow_plane,
    _own_plane,
    _pack_a,
    _pack_b,
    density_planes,
    force_planes,
    force_planes_integrated,
    plane_geometry,
    pressure_terms,
    unpack_pairs,
)


def _forces_from_cells(pxg, pyg, vxg, vyg, spec, params, interpret, halo=None,
                       integrate_planes=None):
    """Run the two Pallas walks on [gh, gw, C] channel planes.

    Returns post-force velocity planes (nvx, nvy) [gh, gw, C].  Dispatches on
    ``spec.pack2``: the classic one-cell-per-lane-row layout, or the pair-packed
    layout (two cells per 128-lane row + half-shifted B neighbor planes, 6 offsets
    instead of 9 — see ops/pallas/sph.py).

    ``halo``: optional callable ``(plane [rows, gw, C], fill) -> (lo, hi)`` with
    lo/hi [gw, C] — the ghost cell-rows adjacent to this slab (row below row 0 /
    row above row rows−1).  The band-sharded step passes a ppermute closure here
    (parallel/plane_sharded.py) so the multi-chip path runs THESE EXACT kernels;
    None (single-chip) fills ghosts with the channel fill.

    ``integrate_planes``: optional ``(npx, npy)`` TRUE predicted-position planes.
    When given, the force walk's epilogue also performs the frame tail (velocity
    combine, deferred-slot restore, integrate, bounce, dead-slot park — see
    ops/pallas/sph.py::_force_finalize_integrated) and the return value becomes
    the FINAL ``(px, py, vx, vy)`` planes."""
    gh, gw, C = pxg.shape
    dt = params.dt
    vscale = params.viscosity_kernel_norm * params.viscosity_strength * dt
    integ = integrate_planes is not None

    if not spec.pack2:
        cp, tc, wt = plane_geometry(gw, C)

        def grown(x, fill):
            p = _grow_plane(_own_plane(x, gh, gw, wt, fill, cp), fill)
            if halo is not None:
                lo, hi = halo(x, fill)
                p = p.at[0, 1 : gw + 1, :C].set(lo.astype(jnp.float32))
                p = p.at[gh + 1, 1 : gw + 1, :C].set(hi.astype(jnp.float32))
            return p

        pxw = _own_plane(pxg, gh, gw, wt, _SENTINEL, cp)
        vxw = _own_plane(vxg, gh, gw, wt, 0.0, cp)
        vyw = _own_plane(vyg, gh, gw, wt, 0.0, cp)
        ppx = grown(pxg, _SENTINEL)
        ppy = grown(pyg, _SENTINEL)

        rho, rhon = density_planes(ppx, ppy, params, interpret)
        P1, NPo, NPn = pressure_terms(rho, rhon, params)
        fargs = (
            ppx, ppy, grown(P1[:, :gw, :C], 0.0), grown(NPn[:, :gw, :C], 0.0),
            grown(vxg, 0.0), grown(vyg, 0.0),
        )
        if integ:
            npxw = _own_plane(integrate_planes[0], gh, gw, wt, _SENTINEL, cp)
            npyw = _own_plane(integrate_planes[1], gh, gw, wt, _SENTINEL, cp)
            outs = force_planes_integrated(
                *fargs, [NPo, npxw, npyw], params, interpret)
            return tuple(o[:, :gw, :C] for o in outs)
        fx, fy, fvx, fvy = force_planes(*fargs, [NPo], params, interpret)
        nvx = vxw + fx * dt + fvx * vscale
        nvy = vyw + fy * dt + fvy * vscale
        return nvx[:, :gw, :C], nvy[:, :gw, :C]

    # Pair-packed layout.
    np2 = (gw + 1) // 2
    cp, tc, wt2 = plane_geometry(np2, 2 * C)

    def aplane(x, fill):
        return _own_plane(_pack_a(x, fill), gh, np2, wt2, fill, cp)

    def bplane(x, fill):
        """B-units into halo layout: B[q] at padded column q+1; ghost rows from
        the halo callback (sharded) or the fill (single-chip)."""
        b = _pack_b(x, fill)  # [gh, np2+1, 2C]
        out = jnp.full((gh + 2, wt2 + 2, cp), fill, jnp.float32)
        out = out.at[1 : gh + 1, 1 : np2 + 2, : b.shape[-1]].set(
            b.astype(jnp.float32)
        )
        if halo is not None:
            lo, hi = halo(x, fill)
            blo = _pack_b(lo[None], fill)  # [1, np2+1, 2C]
            bhi = _pack_b(hi[None], fill)
            out = out.at[0, 1 : np2 + 2, : blo.shape[-1]].set(
                blo[0].astype(jnp.float32))
            out = out.at[gh + 1, 1 : np2 + 2, : bhi.shape[-1]].set(
                bhi[0].astype(jnp.float32))
        return out

    apx = aplane(pxg, _SENTINEL)
    apy = aplane(pyg, _SENTINEL)
    avx = aplane(vxg, 0.0)
    avy = aplane(vyg, 0.0)
    bpx = bplane(pxg, _SENTINEL)
    bpy = bplane(pyg, _SENTINEL)

    rho, rhon = density_planes(bpx, bpy, params, interpret,
                               own_planes=[apx, apy], n_dx=2)
    P1, NPo, NPn = pressure_terms(rho, rhon, params)
    # Neighbor-side per-slot terms must be in B layout: unpack the (A-layout)
    # kernel outputs back to cell space, then B-pack.  Pure reshapes + one
    # shifted copy each.
    P1u = unpack_pairs(P1, gw, C)
    NPnu = unpack_pairs(NPn, gw, C)
    fargs = (
        bpx, bpy, bplane(P1u, 0.0), bplane(NPnu, 0.0),
        bplane(vxg, 0.0), bplane(vyg, 0.0),
    )
    if integ:
        anpx = aplane(integrate_planes[0], _SENTINEL)
        anpy = aplane(integrate_planes[1], _SENTINEL)
        outs = force_planes_integrated(
            *fargs, [apx, apy, P1, NPn, avx, avy, NPo, anpx, anpy],
            params, interpret, n_dx=2,
        )
        return tuple(unpack_pairs(o, gw, C) for o in outs)
    fx, fy, fvx, fvy = force_planes(
        *fargs, [apx, apy, P1, NPn, avx, avy, NPo],
        params, interpret, n_dx=2,
    )
    nvx = avx + fx * dt + fvx * vscale
    nvy = avy + fy * dt + fvy * vscale
    return unpack_pairs(nvx, gw, C), unpack_pairs(nvy, gw, C)


def sph_physics_pallas(state: ParticleState, params: SimParams, spec: GridSpec,
                       interpret: bool | None = None, want_planes: bool = False,
                       resident: bool = False):
    """One physics frame.  Returns (new_state, overflow[, planes]).

    Two Pallas walks (spec v2): density, then fused pressure+viscosity.  Everything
    between them is elementwise in the padded plane layout [gh, wt, CP] — values at
    empty slots are finite garbage that is never read back (the pull-back gathers
    live slots only; the fused-render planes are live-masked).

    With ``want_planes`` the cell-dense planes of the frame's END state (positions,
    velocities, live mask) are also returned, enabling the fused renderer
    (``render/splat_planes.py``) to draw the frame without re-binning.

    With ``resident`` the new state is returned in THIS frame's cell-sorted order
    (requires ``state.ids``; the ids column rides the one perm gather as a plain-f32
    f32 channel).  This skips the inverse permutation — an argsort plus a 1M-row
    gather per frame — which only exists to restore an ordering the physics never
    needs.  Callers track identity through ``state.ids``."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    dt = params.dt

    vel = state.vel + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
    pred = state.pos + vel * dt

    grid = build_grid(spec, pred, with_table=False)
    n = pred.shape[0]

    # Cell-plane build: ONE perm gather packs (pred, vel) into sorted order, then
    # the aligned-window + dynamic-roll kernel lays the runs out as slot planes
    # (2 gather slices per CELL instead of one per slot — see plane_build.py).
    # In resident mode the same gather also carries the old positions and the
    # f32-valued ids, so no second particle-order gather ever happens.
    fills = (_SENTINEL, _SENTINEL, 0.0, 0.0)
    chans = [pred, vel]
    if resident:
        if state.ids is None:
            raise ValueError("resident step requires state.ids (state.with_ids())")
        if n > 1 << 24:
            raise ValueError(
                f"resident mode supports n <= 2^24 (got {n}): ids ride a f32 "
                "VALUE channel, exact only up to 2^24; use resident=False above"
            )
        # ids ride the gather as plain f32 VALUES: integers <= 2^24 are exact in
        # f32, id 0 maps to 0.0 (normal), and gathers/concats never round — so no
        # subnormal-flush hazard (round 2 hit that with a raw bitcast: ids < 2^23
        # bitcast to subnormals, which the TPU flushes to zero in fused data
        # movement).  This covers the 16M (== 2^24) flagship config.
        idsf = state.ids.astype(jnp.float32)
        chans += [state.pos, idsf[:, None]]
    packed = jnp.concatenate(chans, axis=-1)[grid.perm]
    sorted_packed = packed[:, :4]  # (pred, vel), the plane-build channels
    cells = cell_planes_aos(sorted_packed, grid.starts, nc, C, fills, interpret)
    counts = grid.starts[1 : nc + 1] - grid.starts[:nc]  # [nc]

    pxg = cells[..., 0].reshape(gh, gw, C)
    pyg = cells[..., 1].reshape(gh, gw, C)
    vxg = cells[..., 2].reshape(gh, gw, C)
    vyg = cells[..., 3].reshape(gh, gw, C)

    # The two Pallas walks (density, fused pressure+viscosity — spec v2).
    nvx, nvy = _forces_from_cells(pxg, pyg, vxg, vyg, spec, params, interpret)

    # Packed final pull-back: one [n]-row gather of (vx, vy) pairs.
    vplane = jnp.stack(
        [nvx.reshape(nc, C), nvy.reshape(nc, C)], axis=-1
    )
    s = jnp.minimum(grid.slot, C - 1)
    pulled = vplane[grid.sorted_keys, s]  # [n, 2], sorted order
    in_table = (grid.slot < C)[:, None]
    # Overflow particles (beyond capacity) keep their post-gravity velocity.
    vel_s = jnp.where(in_table, pulled, sorted_packed[:, 2:4])

    if resident:
        # Integrate/bounce/colour directly in sorted order; identity rides ids.
        pos_s = packed[:, 4:6] + vel_s * dt
        pos_s, vel_s = K.bounce_bounds(
            pos_s, vel_s, params.bounds, params.damping_factor
        )
        color = K.energy_color(vel_s, params.max_energy)
        ids_new = packed[:, 6].astype(jnp.int32)
        new_state = ParticleState(pos=pos_s, vel=vel_s, color=color,
                                  frame=state.frame, ids=ids_new)
    else:
        new_vel = vel_s[jnp.argsort(grid.perm)]  # inverse-perm gather, not scatter
        pos = state.pos + new_vel * dt
        pos, new_vel = K.bounce_bounds(
            pos, new_vel, params.bounds, params.damping_factor
        )
        color = K.energy_color(new_vel, params.max_energy)
        new_state = ParticleState(pos=pos, vel=new_vel, color=color,
                                  frame=state.frame, ids=state.ids)
    if not want_planes:
        return new_state, grid.overflow

    # End-of-frame planes for the fused renderer: final position = predicted +
    # (v_final − v_predicted)·dt, then the same bounce, all elementwise in plane
    # space.
    fx_plane = pxg + (nvx - vxg) * dt
    fy_plane = pyg + (nvy - vyg) * dt
    plane_pos = jnp.stack([fx_plane, fy_plane], axis=-1)
    plane_vel = jnp.stack([nvx, nvy], axis=-1)
    plane_pos, plane_vel = K.bounce_bounds(
        plane_pos, plane_vel, params.bounds, params.damping_factor
    )
    slot_iota = jnp.arange(C, dtype=jnp.int32)
    live3 = slot_iota[None, None, :] < counts.reshape(gh, gw, 1)
    planes = {
        "px": jnp.where(live3, plane_pos[..., 0], jnp.float32(1e6)),
        "py": jnp.where(live3, plane_pos[..., 1], jnp.float32(1e6)),
        "vx": plane_vel[..., 0],
        "vy": plane_vel[..., 1],
        "live": live3,
    }
    return new_state, grid.overflow, planes


@functools.partial(jax.jit, static_argnames=("spec", "interpret", "resident"))
def sph_step_pallas(state: ParticleState, params: SimParams, spec: GridSpec,
                    interpret: bool | None = None,
                    resident: bool = False) -> ParticleState:
    """Warm-up-honoring full frame; drop-in for grid_step/reference_step.

    ``resident=True`` (requires ``state.ids``) returns the state in cell-sorted
    order — the production configuration: it skips the per-frame inverse
    permutation whose only purpose is cosmetic row ordering.  Recover the original
    order any time with ``state.in_original_order()``."""
    stepped = jax.lax.cond(
        state.frame >= params.shader_delay,
        lambda s: sph_physics_pallas(s, params, spec, interpret,
                                     resident=resident)[0],
        lambda s: s,
        state,
    )
    return stepped._replace(frame=state.frame + 1)


def state_planes(state: ParticleState, spec: GridSpec,
                 interpret: bool | None = None):
    """Cell planes of a state as-is (no physics) — the warm-up render path."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    grid = build_grid(spec, state.pos, with_table=False)
    fills = (_SENTINEL, _SENTINEL, 0.0, 0.0)
    sorted_packed = jnp.concatenate([state.pos, state.vel], axis=-1)[grid.perm]
    cells = cell_planes_aos(sorted_packed, grid.starts, nc, C, fills, interpret)
    counts = grid.starts[1 : nc + 1] - grid.starts[:nc]
    slot_iota = jnp.arange(C, dtype=jnp.int32)
    live3 = slot_iota[None, None, :] < counts.reshape(gh, gw, 1)
    return {
        "px": jnp.where(live3, cells[..., 0].reshape(gh, gw, C), jnp.float32(1e6)),
        "py": jnp.where(live3, cells[..., 1].reshape(gh, gw, C), jnp.float32(1e6)),
        "vx": cells[..., 2].reshape(gh, gw, C),
        "vy": cells[..., 3].reshape(gh, gw, C),
        "live": live3,
    }


@functools.partial(
    jax.jit, static_argnames=("spec", "render_spec", "bounds_static", "interpret")
)
def render_state_planes(state: ParticleState, params, spec: GridSpec, render_spec,
                        bounds_static: tuple, interpret: bool | None = None):
    """Standalone identity-camera render via the cell-plane patch rasterizer.

    Bins the CURRENT positions + colours into cell planes (one sort + one gather +
    the aligned-window plane kernel) and rasterizes them with the MXU patch splat —
    the fastest raw-positions -> image path (the reference's render pass analog,
    `src/particle_render.rs:65-107`).  Draws ``state.color`` as-is (matching the
    general splat path).  Planes are exact (no post-binning drift), so the patch
    margin is exactly ``render_spec.max_radius_px``.

    Capacity contract (same as the physics step): particles beyond a cell's
    ``spec.capacity`` slots are ABSENT from the image — the same frames where they
    exert/receive no grid forces.  ``Simulation.stats()`` reports the current
    state's overflow count; a nonzero value means the grid capacity should be
    raised (models/sph.py documents the settle-safe default)."""
    from ...render.splat_planes import MARGIN, splat_from_planes

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    grid = build_grid(spec, state.pos, with_table=False)
    fills = (_SENTINEL, _SENTINEL, 0.0, 0.0, 0.0)
    packed = jnp.concatenate([state.pos, state.color[:, :3]], axis=-1)[grid.perm]
    cells = cell_planes_aos(packed, grid.starts, nc, C, fills, interpret)
    counts = grid.starts[1 : nc + 1] - grid.starts[:nc]
    live3 = (jnp.arange(C, dtype=jnp.int32)[None, None, :]
             < counts.reshape(gh, gw, 1))
    ch = tuple(cells[..., k].reshape(gh, gw, C) for k in range(5))
    margin = min(MARGIN, render_spec.max_radius_px)
    return splat_from_planes(
        ch[0], ch[1], ch[2], ch[3], live3,
        params.particle_size, params.max_energy,
        bounds_static=bounds_static, grid_spec=spec, render_spec=render_spec,
        interpret=interpret, margin=margin, colors=(ch[2], ch[3], ch[4]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("spec", "render_spec", "bounds_static", "interpret", "resident",
                     "patch_margin"),
)
def sph_frame_pallas(state: ParticleState, params: SimParams, spec: GridSpec,
                     render_spec, bounds_static: tuple | None = None,
                     interpret: bool | None = None, resident: bool = False,
                     patch_margin: int | None = None):
    """Fused step + render: one frame of physics AND its image, sharing the binning.

    Returns (new_state, image).  The image is drawn from the frame's cell planes with
    zero extra binning work (see render/splat_planes.py).  Warm-up frames
    (frame < shader_delay) leave state frozen and render it as-is, matching
    sph_step_pallas + a separate render.

    Note a fused-render limitation: a particle is drawn inside the patch of the cell it
    was binned in (by predicted position), so a sprite whose within-frame displacement
    exceeds ``margin − radius_px`` (1 px at the tight default) renders displaced by
    the excess — the in-kernel center clamp preserves its full mass instead of
    clipping it at the patch edge; overflow particles beyond cell capacity are absent
    from the fused image.  Use the standalone rasterizer when exact positions matter
    for very fast sprites.
    """
    from ...render.splat_planes import splat_from_planes

    def live_frame(s):
        new_state, _overflow, planes = sph_physics_pallas(
            s, params, spec, interpret, want_planes=True, resident=resident
        )
        return new_state, planes

    def frozen_frame(s):
        return s, state_planes(s, spec, interpret)

    new_state, planes = jax.lax.cond(
        state.frame >= params.shader_delay, live_frame, frozen_frame, state
    )
    # Patch margin: the default is the TIGHT patch (radius + 1 px of undisplaced
    # drift slack) with in-kernel center clamping — sprites drifting further
    # render displaced by the excess instead of clipped (mass-preserving; see
    # render/splat_planes.py::_clamp_center).  Pass ``patch_margin=4`` for the
    # classic wide patch (2 px of undisplaced slack at radius 2).  The rasterizer
    # requires pixel stride >= 2*margin, so the tight default clamps to stride//2
    # (losing drift slack before losing the fast path) on coarse-pixel geometries.
    from ...render.splat_planes import drifted_patch_margin

    margin = drifted_patch_margin(spec, render_spec, bounds_static, patch_margin)
    image = splat_from_planes(
        planes["px"], planes["py"], planes["vx"], planes["vy"], planes["live"],
        params.particle_size, params.max_energy,
        bounds_static=bounds_static, grid_spec=spec, render_spec=render_spec,
        interpret=interpret, margin=margin, clamp_drift=True,
        color_sum=jnp.float32(1.0),  # energy_color ramp: r+g+b == 1
    )
    return new_state._replace(frame=state.frame + 1), image
