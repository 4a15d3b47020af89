"""Config-2 model: curl-noise flow-field advection of 1M+ particles.

Forces come from the curl of an analytic sum-of-octaves potential ψ(x, t):

    flow(x, t) = (∂ψ/∂y, −∂ψ/∂x)

which is divergence-free by construction (the standard curl-noise trick), so particles
swirl without clumping.  The per-particle update (field eval + drag + Euler + wrap +
colour) is pure elementwise math over [n, 2] arrays — XLA fuses the whole step into one
kernel, which is exactly the "vmapped fused integrate kernel" workload of BASELINE.json
config 2.  The potential is evaluated analytically (no texture fetch), so its gradient
is exact, cheap, and bandwidth-free — ideal for the VPU.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import kernels as K
from ..core.state import ParticleState, scatter_init
from ..render import RenderSpec, splat

_N_OCTAVES = 4


class FlowFieldParams(NamedTuple):
    dt: jnp.ndarray
    flow_strength: jnp.ndarray  # scales the curl velocity field
    drag: jnp.ndarray  # relaxation rate toward the field velocity
    noise_scale: jnp.ndarray  # base spatial wavelength
    time_scale: jnp.ndarray  # field animation speed
    max_energy: jnp.ndarray
    particle_size: jnp.ndarray
    bounds: jnp.ndarray  # [4]
    # Static-shaped per-octave phase/direction tables (part of the params pytree so a
    # re-seeded field needs no recompile).
    octave_dirs: jnp.ndarray  # [_N_OCTAVES, 2] unit wave vectors
    octave_phases: jnp.ndarray  # [_N_OCTAVES]
    octave_speeds: jnp.ndarray  # [_N_OCTAVES]


def make_flow_params(
    *,
    dt=0.01,
    flow_strength=250.0,
    drag=4.0,
    noise_scale=300.0,
    time_scale=1.0,
    max_energy=2_000.0,
    particle_size=2.0,
    bounds=(-960.0, 960.0, -540.0, 540.0),
    seed: int = 0,
) -> FlowFieldParams:
    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    angles = jax.random.uniform(k1, (_N_OCTAVES,), minval=0.0, maxval=2.0 * jnp.pi)
    dirs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    phases = jax.random.uniform(k2, (_N_OCTAVES,), maxval=2.0 * jnp.pi)
    speeds = jax.random.uniform(k3, (_N_OCTAVES,), minval=0.5, maxval=2.0)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return FlowFieldParams(
        dt=f32(dt),
        flow_strength=f32(flow_strength),
        drag=f32(drag),
        noise_scale=f32(noise_scale),
        time_scale=f32(time_scale),
        max_energy=f32(max_energy),
        particle_size=f32(particle_size),
        bounds=f32(bounds),
        octave_dirs=dirs.astype(jnp.float32),
        octave_phases=phases.astype(jnp.float32),
        octave_speeds=speeds.astype(jnp.float32),
    )


def curl_velocity(pos, t, params: FlowFieldParams):
    """Analytic curl of the layered-sine potential at positions [n, 2]."""
    # ψ = Σ_o (A/2^o) sin(k_o·x / (L/2^o) + φ_o + ω_o t)
    # ∇ψ  = Σ_o (A/2^o) cos(·) k_o / (L/2^o)
    # curl = (∂ψ/∂y, −∂ψ/∂x)
    vx = jnp.zeros(pos.shape[0], jnp.float32)
    vy = jnp.zeros(pos.shape[0], jnp.float32)
    for o in range(_N_OCTAVES):
        wavelength = params.noise_scale / (2.0**o)
        amp = params.flow_strength * wavelength / params.noise_scale
        k = params.octave_dirs[o] / wavelength
        phase = (
            pos[:, 0] * k[0]
            + pos[:, 1] * k[1]
            + params.octave_phases[o]
            + params.octave_speeds[o] * params.time_scale * t
        )
        grad = jnp.cos(phase)[:, None] * k[None, :] * amp * wavelength
        vx = vx + grad[:, 1]
        vy = vy - grad[:, 0]
    return jnp.stack([vx, vy], axis=-1)


def _wrap(pos, bounds):
    """Periodic wrap (flow fields advect forever; walls would pile particles up)."""
    x_min, x_max, y_min, y_max = bounds[0], bounds[1], bounds[2], bounds[3]
    w, h = x_max - x_min, y_max - y_min
    x = jnp.mod(pos[..., 0] - x_min, w) + x_min
    y = jnp.mod(pos[..., 1] - y_min, h) + y_min
    return jnp.stack([x, y], axis=-1)


def flow_step(state: ParticleState, params: FlowFieldParams) -> ParticleState:
    t = state.frame.astype(jnp.float32) * params.dt
    field = curl_velocity(state.pos, t, params)
    # velocity relaxes toward the field: dv = drag·(field − v)·dt
    vel = state.vel + params.drag * (field - state.vel) * params.dt
    pos = _wrap(state.pos + vel * params.dt, params.bounds)
    color = K.energy_color(vel, params.max_energy)
    return ParticleState(pos=pos, vel=vel, color=color, frame=state.frame + 1)


@dataclasses.dataclass(frozen=True)
class FlowField:
    render_spec: RenderSpec
    bounds: tuple

    @classmethod
    def create(cls, bounds=(-960.0, 960.0, -540.0, 540.0), render_spec=None):
        return cls(render_spec=render_spec or RenderSpec(max_radius_px=3),
                   bounds=tuple(bounds))

    def default_params(self) -> FlowFieldParams:
        return make_flow_params(bounds=self.bounds)

    def init(self, key, n):
        # uniform scatter fills the whole domain (flow fields want full coverage)
        x_min, x_max, y_min, y_max = self.bounds
        kx, ky = jax.random.split(key)
        pos = jnp.stack(
            [
                jax.random.uniform(kx, (n,), minval=x_min, maxval=x_max),
                jax.random.uniform(ky, (n,), minval=y_min, maxval=y_max),
            ],
            axis=-1,
        )
        from ..core.state import make_state

        return make_state(pos)

    def step(self, state, params):
        return flow_step(state, params)

    def render(self, state, params, camera=None):
        return splat(state.pos, state.color, params.particle_size, params.bounds,
                     self.render_spec, camera=camera)
