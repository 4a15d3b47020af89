"""Plane-RESIDENT SPH: state lives in cell planes across frames; no per-frame sort.

The stream pipeline (ops/pallas/sph_step.py) pays ~19 ms/frame at 1M re-deriving
cell structure (radix sort + packed perm gather + plane-build kernel) that the
physics then uses for ~27 ms of force work.  Here the state IS the cell structure:
channel planes ``[gh, gw, C]`` (positions, velocities, ids) carried across frames,
re-binned each frame by one LOCAL Pallas compaction over the 3x3 neighborhood
(ops/pallas/rebin.py) — valid because per-frame movement is CFL-bounded to about a
cell.  The render needs no binning at all: the planes feed the MXU patch rasterizer
(render/splat_planes.py) directly.

Semantics match the bulk-synchronous spec of ops/grid_step.py / sph_step.py (the
reference's five GPU dispatches, src/particle_compute.rs:91-195).  The default
rebin (variant 6 — the row-fused kernel, bit-identical to variant 5 and measured
faster on-chip: 7.12 vs 7.87 ms at 1M; the band-sharded path drives the v5
passes directly) is LOSSLESS: a mover that finds no free
slot in its destination cell, or that moved more than one cell in a frame, is
RETAINED in its current slot and merely deferred from the force walk for the
frame — the stream path's capacity-overflow contract (overflow particles
exert/receive no grid forces, keep their post-gravity velocity).  ``lost``
therefore only counts initial-binning overflow and stays constant while
stepping; ``Simulation.stats`` still surfaces it.

Identity: each slot's original particle index rides a plain-f32 ids channel
(exact for n <= 2^24); ``to_particle_state`` restores id order for trajectory,
checkpoint, and parity consumers.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ...core import kernels as K
from ...core.params import SimParams
from ...core.state import ParticleState
from ...ops.grid import GridSpec, build_grid
from .plane_build import cell_planes_aos
from .rebin import SENTINEL, rebin_planes
from .sph_step import _forces_from_cells


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("px", "py", "vx", "vy", "idsf", "frame", "lost"),
    meta_fields=("n",),
)
@dataclasses.dataclass(frozen=True)
class PlaneState:
    """Cell-plane particle state.  Dead slots: px/py = SENTINEL, vx/vy/idsf = 0.

    ``n`` (static) is the initial particle count; ``lost`` counts particles
    dropped so far, so the live total is always ``n - lost``.  Under the default
    lossless rebin (variant 5) only the INITIAL binning can drop (capacity
    overflow in ``plane_state_from_particles``); stepping never loses particles.
    Legacy variants 2-4 also drop rebin overflow and >1-cell/frame escapes.
    """

    px: jnp.ndarray  # [gh, gw, C] f32
    py: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    idsf: jnp.ndarray  # original index as f32 value (exact to 2^24)
    frame: jnp.ndarray  # [] int32
    lost: jnp.ndarray  # [] int32, cumulative dropped
    n: int = 0

    @property
    def live(self):
        return self.px < 0.5 * SENTINEL

    def traj_positions(self):
        """[n, 2] positions in original-id order (lost rows park at SENTINEL)."""
        s = self.to_particle_state()
        return s.pos


def _spill_init_overflow(ch, packed, keys, slot, spec: GridSpec,
                         max_spill: int = 4096):
    """Zero-loss initial binning: place capacity-overflow particles into the
    nearest neighbor cell with a free slot instead of dropping them.

    The reference never drops a particle (its sorted runs have no capacity,
    `compute_shader.wgsl:455-525`); the plane layout's static per-cell cap can
    overflow on clustered inits.  Overflow rows (``slot >= C`` in the sorted
    stream) are re-homed to the closest free cell in their 5x5 neighborhood
    (distance order, row-major tiebreak).  A spilled particle's resident cell
    differs from its position's cell, so the first frames treat it exactly
    like a retained mover: deferred from the force walk until the lossless
    rebin hops it home as space frees up — no special-casing anywhere
    downstream.  Runs once at init (a dynamic-trip scatter loop, not a frame
    kernel).  Returns (planes, spilled_count); overflow beyond ``max_spill``
    or with a fully-packed 5x5 neighborhood stays dropped and reported.
    """
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    n = packed.shape[0]
    over = slot >= C
    n_over = jnp.sum(over, dtype=jnp.int32)
    idx = jnp.nonzero(over, size=max_spill, fill_value=n)[0]
    counts = jnp.sum(ch[0] < 0.5 * SENTINEL, axis=-1).astype(jnp.int32)
    offs = sorted(
        [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)
         if (dy, dx) != (0, 0)],
        key=lambda o: (o[0] * o[0] + o[1] * o[1], o[0], o[1]))
    offs = jnp.asarray(offs, jnp.int32)  # [24, 2] by distance
    packed_pad = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[1]), packed.dtype)])
    keys_pad = jnp.concatenate([keys, jnp.zeros((1,), keys.dtype)])

    def body(i, carry):
        planes, counts, spilled = carry
        pi = idx[i]
        valid = pi < n
        key = keys_pad[pi]
        cy = key // gw
        cx = key - cy * gw
        nys = jnp.clip(cy + offs[:, 0], 0, gh - 1)
        nxs = jnp.clip(cx + offs[:, 1], 0, gw - 1)
        ncnt = counts[nys, nxs]
        # clipped offsets can alias the (full) home cell; exclude it
        free = (ncnt < C) & ((nys != cy) | (nxs != cx))
        j = jnp.argmax(free)
        do = valid & free[j]
        ty, tx, s = nys[j], nxs[j], ncnt[j]
        vals = packed_pad[pi]
        planes = [
            p.at[ty, tx, s].set(jnp.where(do, vals[c], p[ty, tx, s]))
            for c, p in enumerate(planes)
        ]
        counts = counts.at[ty, tx].add(jnp.where(do, 1, 0))
        return planes, counts, spilled + jnp.where(do, 1, 0)

    planes, _, spilled = jax.lax.fori_loop(
        0, jnp.minimum(n_over, max_spill), body,
        (list(ch), counts, jnp.asarray(0, jnp.int32)))
    return planes, spilled


def plane_state_from_particles(state: ParticleState, spec: GridSpec,
                               interpret: bool | None = None,
                               spill_overflow: bool = True) -> "PlaneState":
    """Initial binning: one sort + gather + plane build (the only one ever run).

    ``spill_overflow`` (default on) re-homes per-cell capacity overflow to the
    nearest free neighbor cell instead of dropping it (see
    :func:`_spill_init_overflow`) — ``lost`` is then 0 unless a whole 5x5
    neighborhood is packed solid."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    state = state.with_ids()
    n = state.n
    if n > 1 << 24:
        raise ValueError(f"plane-resident ids are exact only to 2^24 (got {n})")
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    grid = build_grid(spec, state.pos, with_table=False)
    idsf = state.ids.astype(jnp.float32)
    packed = jnp.concatenate([state.pos, state.vel, idsf[:, None]], axis=-1)[
        grid.perm
    ]
    fills = (SENTINEL, SENTINEL, 0.0, 0.0, 0.0)
    cells = cell_planes_aos(packed, grid.starts, nc, C, fills, interpret)
    ch = [cells[..., i].reshape(gh, gw, C) for i in range(5)]
    lost = grid.overflow
    if spill_overflow:
        ch, spilled = _spill_init_overflow(ch, packed, grid.sorted_keys,
                                           grid.slot, spec)
        lost = lost - spilled
    return PlaneState(
        px=ch[0], py=ch[1], vx=ch[2], vy=ch[3], idsf=ch[4],
        frame=state.frame, lost=lost, n=n,
    )


@jax.jit
def _planes_to_particles(ps: PlaneState):
    """Pull live slots back to an [n]-row particle stream, ordered by id.

    Rows of dropped particles (``lost > 0``) come LAST, with ids >= n, positions at
    SENTINEL and zero velocity — placeholders, not physics.  Colour is white before
    the first live frame and the kinetic-energy ramp after, matching what the
    stream step writes (compute_shader.wgsl:101-118).
    """
    n = ps.n
    live = ps.live.reshape(-1)
    ids = ps.idsf.astype(jnp.int32).reshape(-1)
    key = jnp.where(live, ids, jnp.int32(n))
    order = jnp.argsort(key)[:n]  # jnp.argsort is stable
    livc = live[order]
    pos = jnp.stack(
        [ps.px.reshape(-1)[order], ps.py.reshape(-1)[order]], axis=-1
    )
    vel = jnp.where(
        livc[:, None],
        jnp.stack([ps.vx.reshape(-1)[order], ps.vy.reshape(-1)[order]], axis=-1),
        0.0,
    )
    ids_out = jnp.where(livc, key[order], n + jnp.arange(n, dtype=jnp.int32))
    return pos, vel, ids_out, livc


def to_particle_state(ps: PlaneState, params: SimParams | None = None
                      ) -> ParticleState:
    pos, vel, ids_out, _ = _planes_to_particles(ps)
    if params is not None:
        colored = K.energy_color(vel, params.max_energy)
        white = jnp.ones_like(colored)
        color = jnp.where(ps.frame > params.shader_delay, colored, white)
    else:
        color = jnp.ones((ps.n, 4), jnp.float32)
    return ParticleState(pos=pos, vel=vel, color=color, frame=ps.frame,
                         ids=ids_out)


# Bind as a method so trajectory/snapshot consumers can stay state-agnostic.
PlaneState.to_particle_state = to_particle_state


def plane_physics(ps: PlaneState, params: SimParams, spec: GridSpec,
                  interpret: bool | None = None, variant: int = 6,
                  fuse_tail: bool = True):
    """One live physics frame on plane state.  Returns the new PlaneState plus the
    end-of-frame planes dict for the fused renderer (same keys as
    sph_physics_pallas's ``want_planes``).

    The default rebin (variant 6; bit-identical to 5) is LOSSLESS: movers that find no free slot in
    their destination cell, and >1-cell/frame movers in transit, are retained in
    their current slot and DEFERRED — parked out of the force walk for the frame
    (gravity + integrate + bounce only), exactly the stream path's
    capacity-overflow contract.  ``lost`` then only counts initial-binning
    overflow; it never grows during stepping."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    dt = params.dt
    live = ps.live
    live_before = jnp.sum(live, dtype=jnp.int32)

    # Gravity + predict, elementwise in plane space (compute_shader.wgsl:397-405).
    vxp = jnp.where(live, ps.vx, 0.0)
    vyp = jnp.where(live, ps.vy - params.gravity * dt, 0.0)
    predx = jnp.where(live, ps.px + vxp * dt, SENTINEL)
    predy = jnp.where(live, ps.py + vyp * dt, SENTINEL)

    # Local rebin keyed on predicted positions — replaces bin+sort+offsets+gather
    # (src/particle_compute.rs:106-163).
    new_planes, counts = rebin_planes(
        [predx, predy, vxp, vyp, ps.idsf], spec, interpret=interpret,
        variant=variant,
    )
    npx, npy, nvx0, nvy0, nidsf = new_planes
    C = spec.capacity
    kept = jnp.sum(jnp.minimum(counts, C), dtype=jnp.int32)
    lost_now = live_before - kept

    if variant in (5, 6):
        # Deferred slots: destination cell != resident cell (capacity-retained or
        # in transit).  They take no pair forces this frame — sentinel-park them
        # for the walks and pin their velocity to the post-gravity value, the
        # same treatment the stream step gives capacity-overflow particles
        # (ops/pallas/sph_step.py:179-182).
        kx = jnp.clip(jnp.floor((npx - spec.x_min) / spec.cell_width)
                      .astype(jnp.int32), 0, spec.gw - 1)
        ky = jnp.clip(jnp.floor((npy - spec.y_min) / spec.cell_size)
                      .astype(jnp.int32), 0, spec.gh - 1)
        cellx = jnp.arange(spec.gw, dtype=jnp.int32)[None, :, None]
        celly = jnp.arange(spec.gh, dtype=jnp.int32)[:, None, None]
        nlive = npx < 0.5 * SENTINEL
        defer = nlive & ((kx != cellx) | (ky != celly))
        fpx = jnp.where(defer, SENTINEL, npx)
        fpy = jnp.where(defer, SENTINEL, npy)
        if fuse_tail:
            # Walk epilogue performs the whole tail in-kernel (velocity combine,
            # defer restore, integrate, bounce, dead-slot park) — the XLA tail
            # below never materializes (ops/pallas/sph.py::
            # _force_finalize_integrated).  Bit-identical math, same order.
            px2, py2, vx2, vy2 = _forces_from_cells(
                fpx, fpy, nvx0, nvy0, spec, params, interpret,
                integrate_planes=(npx, npy))
            live2 = npx < 0.5 * SENTINEL
            out = PlaneState(
                px=px2, py=py2, vx=vx2, vy=vy2,
                idsf=jnp.where(live2, nidsf, 0.0),
                frame=ps.frame, lost=ps.lost + lost_now, n=ps.n,
            )
            planes = {"px": out.px, "py": out.py, "vx": out.vx, "vy": out.vy,
                      "live": live2}
            return out, planes
        nvx, nvy = _forces_from_cells(fpx, fpy, nvx0, nvy0, spec, params,
                                      interpret)
        # Walk outputs at sentinel-parked slots are garbage (self-term of a
        # zero-density slot) — restore the post-gravity velocity explicitly.
        nvx = jnp.where(defer, nvx0, nvx)
        nvy = jnp.where(defer, nvy0, nvy)
    else:
        # The two Pallas force walks (density, fused pressure+viscosity).
        nvx, nvy = _forces_from_cells(npx, npy, nvx0, nvy0, spec, params,
                                      interpret)

    live2 = npx < 0.5 * SENTINEL
    # Integrate from pred-consistent positions; bounce; re-park dead slots
    # (bounce would otherwise clamp sentinels into the domain).
    fx = npx + (nvx - nvx0) * dt
    fy = npy + (nvy - nvy0) * dt
    pos2, vel2 = K.bounce_bounds(
        jnp.stack([fx, fy], axis=-1), jnp.stack([nvx, nvy], axis=-1),
        params.bounds, params.damping_factor,
    )
    out = PlaneState(
        px=jnp.where(live2, pos2[..., 0], SENTINEL),
        py=jnp.where(live2, pos2[..., 1], SENTINEL),
        vx=jnp.where(live2, vel2[..., 0], 0.0),
        vy=jnp.where(live2, vel2[..., 1], 0.0),
        idsf=jnp.where(live2, nidsf, 0.0),
        frame=ps.frame, lost=ps.lost + lost_now, n=ps.n,
    )
    planes = {
        "px": out.px, "py": out.py, "vx": out.vx, "vy": out.vy, "live": live2,
    }
    return out, planes


@functools.partial(jax.jit,
                   static_argnames=("spec", "interpret", "variant",
                                    "fuse_tail"))
def plane_step(ps: PlaneState, params: SimParams, spec: GridSpec,
               interpret: bool | None = None, variant: int = 6,
               fuse_tail: bool = True) -> PlaneState:
    """Warm-up-honoring full frame on plane-resident state."""
    stepped = jax.lax.cond(
        ps.frame >= params.shader_delay,
        lambda s: plane_physics(s, params, spec, interpret, variant,
                                fuse_tail)[0],
        lambda s: s,
        ps,
    )
    return dataclasses.replace(stepped, frame=ps.frame + 1)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "render_spec", "bounds_static", "interpret",
                     "variant", "patch_margin", "fuse_tail"),
)
def plane_frame(ps: PlaneState, params: SimParams, spec: GridSpec, render_spec,
                bounds_static: tuple, interpret: bool | None = None,
                variant: int = 6, patch_margin: int | None = None,
                fuse_tail: bool = True):
    """Fused step + render from plane-resident state: physics AND image with ZERO
    binning work — the planes go straight into the MXU patch rasterizer."""
    from ...render.splat_planes import splat_from_planes

    def live_frame(s):
        return plane_physics(s, params, spec, interpret, variant, fuse_tail)

    def frozen_frame(s):
        return s, {"px": s.px, "py": s.py, "vx": s.vx, "vy": s.vy,
                   "live": s.live}

    new_ps, planes = jax.lax.cond(
        ps.frame >= params.shader_delay, live_frame, frozen_frame, ps
    )
    # Default: the TIGHT patch (radius + 1 px drift slack) with in-kernel
    # center clamping — a sprite drifting beyond the slack renders displaced
    # by the excess instead of clipped (mass-preserving), so the fast 16-lane
    # patch layout is safe as the default (48.8 -> ~39 ms fused at 1M/1080p).
    # Pass patch_margin=4 for the classic wide patch (2 px of undisplaced
    # slack at radius 2).  Coarse-pixel geometries clamp the slack to what the
    # stride allows (see drifted_patch_margin).
    from ...render.splat_planes import drifted_patch_margin

    margin = drifted_patch_margin(spec, render_spec, bounds_static, patch_margin)
    image = splat_from_planes(
        planes["px"], planes["py"], planes["vx"], planes["vy"], planes["live"],
        params.particle_size, params.max_energy,
        bounds_static=bounds_static, grid_spec=spec, render_spec=render_spec,
        interpret=interpret, margin=margin, clamp_drift=True,
        color_sum=jnp.float32(1.0),  # energy_color ramp: r+g+b == 1
    )
    return dataclasses.replace(new_ps, frame=ps.frame + 1), image


@functools.partial(
    jax.jit,
    static_argnames=("spec", "render_spec", "bounds_static", "interpret"),
)
def render_plane_state(ps: PlaneState, params: SimParams, spec: GridSpec,
                       render_spec, bounds_static: tuple,
                       interpret: bool | None = None):
    """Standalone render of plane-resident state — NO binning at all.

    Positions drifted at most one integration from their binned cell, so the
    patch margin covers sprite radius + 1 px of drift (the same contract as the
    fused frame; radius-2 sprites stay on the fast 16-lane-row patch layout —
    see render/splat_planes.py).  Warm-up states draw white, matching the
    stream path.
    """
    from ...render.splat_planes import drifted_patch_margin, splat_from_planes

    live = ps.live
    colored = K.energy_color(
        jnp.stack([ps.vx, ps.vy], axis=-1), params.max_energy
    )
    white = jnp.ones_like(colored)
    rgb = jnp.where(ps.frame > params.shader_delay, colored, white)
    return splat_from_planes(
        ps.px, ps.py, ps.vx, ps.vy, live,
        params.particle_size, params.max_energy,
        bounds_static=bounds_static, grid_spec=spec, render_spec=render_spec,
        interpret=interpret,
        margin=drifted_patch_margin(spec, render_spec, bounds_static),
        # Same mass-preserving contract as the fused frame: a sprite drifted
        # beyond the slack (bounce reflections, retained movers) renders
        # displaced by the excess instead of clipped at its patch edge.
        clamp_drift=True,
        colors=(rgb[..., 0], rgb[..., 1], rgb[..., 2]),
        # Sum rule: the ramp sums to 1, warm-up white to 3 — a single traced
        # scalar since the white/ramp switch is per-state, not per-slot.
        color_sum=jnp.where(ps.frame > params.shader_delay,
                            jnp.float32(1.0), jnp.float32(3.0)),
    )
