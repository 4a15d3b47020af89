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
from ...ops.grid import GridSpec, build_grid, gather_to_cells
from .sph import (
    _SENTINEL,
    density_cells_pallas,
    pressure_cells_pallas,
    viscosity_cells_pallas,
)


def sph_physics_pallas(state: ParticleState, params: SimParams, spec: GridSpec,
                       interpret: bool | None = None):
    """One physics frame.  Returns (new_state, overflow)."""
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    dt = params.dt

    vel = state.vel + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
    pred = state.pos + vel * dt

    grid = build_grid(spec, pred)
    pred_s = pred[grid.perm]
    vel_s = vel[grid.perm]

    table = grid.table[:nc]  # [nc, C]
    live = table >= 0
    cpos = gather_to_cells(grid, spec, pred_s)[:nc]  # [nc, C, 2]

    px = jnp.where(live, cpos[..., 0], _SENTINEL).reshape(gh, gw, C)
    py = jnp.where(live, cpos[..., 1], _SENTINEL).reshape(gh, gw, C)
    idx = jnp.where(live, table, -1).reshape(gh, gw, C)

    rho, rhon = density_cells_pallas(px, py, spec=spec, params=params,
                                     interpret=interpret)

    fpx, fpy = pressure_cells_pallas(px, py, idx, rho, rhon, spec=spec,
                                     params=params, interpret=interpret)

    # Velocity updates happen in PLANE space (elementwise over cell slots) so the
    # per-particle pull-back gather runs once, at the end — gathers dominate the
    # XLA glue at 1M particles.
    cvel = gather_to_cells(grid, spec, vel_s)[:nc]
    vx = jnp.where(live, cvel[..., 0], 0.0).reshape(gh, gw, C) + fpx * dt
    vy = jnp.where(live, cvel[..., 1], 0.0).reshape(gh, gw, C) + fpy * dt

    fvx, fvy = viscosity_cells_pallas(px, py, idx, vx, vy, spec=spec,
                                      params=params, interpret=interpret)
    vx = vx + fvx * params.viscosity_strength * dt
    vy = vy + fvy * params.viscosity_strength * dt

    def plane_to_sorted(plane):
        """[gh, gw, C] plane -> per-sorted-particle values."""
        flat = plane.reshape(nc, C)
        s = jnp.minimum(grid.slot, C - 1)
        return flat[grid.sorted_keys, s]

    in_table = grid.slot < C
    # Overflow particles (beyond capacity) keep their post-gravity velocity.
    vel_s = jnp.where(
        in_table[:, None],
        jnp.stack([plane_to_sorted(vx), plane_to_sorted(vy)], axis=-1),
        vel_s,
    )

    new_vel = vel_s[jnp.argsort(grid.perm)]  # inverse-perm gather, not scatter
    pos = state.pos + new_vel * dt
    pos, new_vel = K.bounce_bounds(pos, new_vel, params.bounds, params.damping_factor)
    color = K.energy_color(new_vel, params.max_energy)
    return (
        ParticleState(pos=pos, vel=new_vel, color=color, frame=state.frame),
        grid.overflow,
    )


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def sph_step_pallas(state: ParticleState, params: SimParams, spec: GridSpec,
                    interpret: bool | None = None) -> ParticleState:
    """Warm-up-honoring full frame; drop-in for grid_step/reference_step."""
    stepped = jax.lax.cond(
        state.frame >= params.shader_delay,
        lambda s: sph_physics_pallas(s, params, spec, interpret)[0],
        lambda s: s,
        state,
    )
    return stepped._replace(frame=state.frame + 1)
