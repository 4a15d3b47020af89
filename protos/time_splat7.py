"""Out-of-kernel split of the production plane splat at 1080p/1M.

time_splat6 put the KERNEL at 8.58 ms (pair 3.27 / acc +0.8 / spread+fold ~4.0 /
place +0.45).  The bench's render_plane_state row reads ~16.6 ms — this probe
measures where the rest goes:

  raw     — splat_from_planes(resolve=False): kernel + the XLA y-overlap fold
  full    — render_plane_state: + energy-color plane prep + splat_resolve
  resolve — splat_resolve alone on a fixed accumulator pair

Usage: python protos/time_splat7.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    render_plane_state,
)
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_planes import _FAR, splat_from_planes
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)
params = rps.make_params(bounds=BOUNDS, shader_delay=0,
                         particle_size=jnp.float32(2.0))

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * _FAR
vx = jnp.where(live, 30.0, 0.0)
vy = jnp.where(live, -12.0, 0.0)
rcol = jnp.where(live, 0.2, 0.0)
gcol = jnp.where(live, 0.5, 0.0)
bcol = jnp.where(live, 0.9, 0.0)


def timed(label, body):
    loop = jax.jit(lambda base: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i, base), jnp.float32(0)))
    hsync_one(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync_one(loop(jnp.float32(0.0101)))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:28s}: {per:7.2f} ms", flush=True)
    return per


def jostle(i, base):
    eps = 0.003 * jnp.float32(i) + base
    px = jnp.where(live, ps.px + eps, _FAR)
    py = jnp.where(live, ps.py + eps, _FAR)
    return px, py


def raw_body(i, base):
    px, py = jostle(i, base)
    rgb_acc, a_acc = splat_from_planes(
        px, py, vx, vy, live, params.particle_size, params.max_energy,
        bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
        margin=RS.max_radius_px + 1, colors=(rcol, gcol, bcol), resolve=False)
    return jnp.sum(rgb_acc[::64, ::64, 0]) + jnp.sum(a_acc[::64, ::64])


def resolved_body(i, base):
    px, py = jostle(i, base)
    img = splat_from_planes(
        px, py, vx, vy, live, params.particle_size, params.max_energy,
        bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
        margin=RS.max_radius_px + 1, colors=(rcol, gcol, bcol), resolve=True)
    return jnp.sum(img[::64, ::64, 0])


def full_body(i, base):
    px, py = jostle(i, base)
    import dataclasses as dc

    psr = dc.replace(ps, px=px, py=py, vx=vx, vy=vy)
    img = render_plane_state(psr, params, spec, RS, bounds_static=BOUNDS)
    return jnp.sum(img[::64, ::64, 0])


print(f"--- R={R}, 1M @ 1080p, margin={RS.max_radius_px + 1} ---", flush=True)
t_raw = timed("raw (kernel + y-fold)", raw_body)
t_res = timed("resolved (+splat_resolve)", resolved_body)
t_full = timed("full render_plane_state", full_body)
print(f"  y-fold+overhead = raw - kernel(8.58 from splat6) = {t_raw - 8.58:.2f}")
print(f"  resolve = {t_res - t_raw:.2f};  color prep etc = {t_full - t_res:.2f}")
