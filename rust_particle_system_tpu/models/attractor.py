"""Config-1 model: gravity + point-attractor force, explicit Euler, bounds bounce.

The "mouse attractor" workload from BASELINE.json — the interactive analog of dragging a
cursor through the fluid.  The attractor position is a traced param (feed a new one
every frame without recompiling, like the reference's per-frame uniform upload).
Shares the bounce/colour semantics with the SPH pipeline (compute_shader.wgsl:69-118).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import kernels as K
from ..core.state import ParticleState, scatter_init
from ..render import RenderSpec, splat


class AttractorParams(NamedTuple):
    dt: jnp.ndarray
    gravity: jnp.ndarray
    damping_factor: jnp.ndarray
    max_energy: jnp.ndarray
    particle_size: jnp.ndarray
    bounds: jnp.ndarray  # [4]
    attractor_pos: jnp.ndarray  # [2]
    attractor_strength: jnp.ndarray  # >0 attract, <0 repel
    attractor_falloff: jnp.ndarray  # softening length


def make_attractor_params(
    *,
    dt=0.01,
    gravity=200.0,
    damping_factor=0.7,
    max_energy=2_000.0,
    particle_size=3.0,
    bounds=(-960.0, 960.0, -540.0, 540.0),
    attractor_pos=(0.0, 0.0),
    attractor_strength=2_000.0,
    attractor_falloff=200.0,
) -> AttractorParams:
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return AttractorParams(
        dt=f32(dt),
        gravity=f32(gravity),
        damping_factor=f32(damping_factor),
        max_energy=f32(max_energy),
        particle_size=f32(particle_size),
        bounds=f32(bounds),
        attractor_pos=f32(attractor_pos),
        attractor_strength=f32(attractor_strength),
        attractor_falloff=f32(attractor_falloff),
    )


def attractor_step(state: ParticleState, params: AttractorParams) -> ParticleState:
    """v += (g + attract)·dt; x += v·dt; bounce; colour.  Pure elementwise — vmap-free
    by construction, fuses to a single XLA kernel."""
    delta = params.attractor_pos[None, :] - state.pos
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1, keepdims=True))
    direction = delta / jnp.maximum(dist, 1e-6)
    # Smooth inverse falloff: full strength inside `falloff`, ~1/d beyond it.
    magnitude = params.attractor_strength / (1.0 + dist / params.attractor_falloff)
    accel = direction * magnitude + jnp.array([0.0, -1.0]) * params.gravity

    vel = state.vel + accel * params.dt
    pos = state.pos + vel * params.dt
    pos, vel = K.bounce_bounds(pos, vel, params.bounds, params.damping_factor)
    color = K.energy_color(vel, params.max_energy)
    return ParticleState(pos=pos, vel=vel, color=color, frame=state.frame + 1)


@dataclasses.dataclass(frozen=True)
class Attractor:
    render_spec: RenderSpec
    bounds: tuple

    @classmethod
    def create(cls, bounds=(-960.0, 960.0, -540.0, 540.0), render_spec=None):
        return cls(render_spec=render_spec or RenderSpec(), bounds=tuple(bounds))

    def default_params(self) -> AttractorParams:
        return make_attractor_params(bounds=self.bounds)

    def init(self, key, n):
        return scatter_init(key, n, self.bounds)

    def step(self, state, params):
        return attractor_step(state, params)

    def render(self, state, params, camera=None):
        return splat(state.pos, state.color, params.particle_size, params.bounds,
                     self.render_spec, camera=camera)
