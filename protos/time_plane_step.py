"""Time the full plane-resident SPH frame at 1M on TPU, vs the 51 ms stream frame.

Usage: python protos/time_plane_step.py [C] [pack2(0|1)] [frames] [fused(0|1)]
Defaults C=64 pack2=1 frames=20 fused=0.
"""

import sys
import time

import jax
import jax.numpy as jnp

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_frame,
    plane_state_from_particles,
    plane_step,
)
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.runtime.timing import time_chained

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
pack2 = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 20
fused = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=C, pack2=pack2)
params = make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
state = make_state(pos).with_ids()
ps = plane_state_from_particles(state, spec)
print(f"C={C} pack2={pack2} n={N} grid {spec.gh}x{spec.gw} "
      f"initial lost={int(ps.lost)}", flush=True)

if fused:
    rspec = RenderSpec(width=1920, height=1080, max_radius_px=2)
    params = params._replace(particle_size=jnp.float32(2.0))
    step = jax.jit(
        lambda s: plane_frame(s, params, spec, rspec, bounds_static=BOUNDS)[0],
        donate_argnums=0)
else:
    step = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)

t0 = time.perf_counter()
ps = step(step(ps))
jax.block_until_ready(ps.px)
print(f"compile+2: {time.perf_counter() - t0:.1f} s", flush=True)
per, ps = time_chained(step, ps, FRAMES)
label = "plane_frame(step+render)" if fused else "plane_step"
print(f"{label} @ 1M C={C} pack2={int(pack2)}: {per * 1e3:.2f} ms/frame "
      f"({N / per / 1e6:.1f}M steps/s); lost={int(ps.lost)}", flush=True)
