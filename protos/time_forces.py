"""Time the two Pallas force walks alone at 1M, sweeping tile size / layout.

Usage: python protos/time_forces.py [TC] [pack2(0|1)] [C]
Defaults TC=0 (module default: 8), pack2=1, C=64.
"""

import sys
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu.ops.pallas.sph as sphmod
from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL
from rust_particle_system_tpu.ops.pallas.sph_step import _forces_from_cells
from rust_particle_system_tpu.runtime.timing import hsync

TC = int(sys.argv[1]) if len(sys.argv) > 1 else 0
pack2 = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 0
FRAC = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0  # occupancy override
DEFER = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
sphmod.TC_OVERRIDE = TC
sphmod.CHUNK_OVERRIDE = CHUNK
sphmod.DEFER_REDUCE = DEFER

BOUNDS = (-960.0, 960.0, -540.0, 540.0)
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=C, pack2=pack2)
params = make_params(bounds=BOUNDS, gravity=300.0)
gh, gw = spec.gh, spec.gw
frac = min(1_000_000 / (spec.num_cells * C), 1.0)

kx, ky = jax.random.split(jax.random.key(0))
base_x = jax.random.uniform(kx, (gh, gw, C), minval=0.0, maxval=9.0)
base_y = jax.random.uniform(ky, (gh, gw, C), minval=0.0, maxval=9.0)
ox = BOUNDS[0] + jnp.arange(gw)[None, :, None] * spec.cell_width
oy = BOUNDS[2] + jnp.arange(gh)[:, None, None] * spec.cell_size
if FRAC > 0.0:
    # settle-like occupancy: the same 1M particles packed into the bottom FRAC
    # of rows (pool), the rest air — exercises the empty-chunk gating.
    rows_pool = max(1, int(gh * FRAC))
    frac_pool = min(1_000_000 / (rows_pool * gw * C), 1.0)
    in_pool = (jnp.arange(gh) >= gh - rows_pool)[:, None, None]
    live = (jax.random.uniform(jax.random.key(2), (gh, gw, C)) < frac_pool) & in_pool
else:
    live = jax.random.uniform(jax.random.key(2), (gh, gw, C)) < frac
px = jnp.where(live, base_x + ox, SENTINEL)
py = jnp.where(live, base_y + oy, SENTINEL)
vx = jnp.where(live, jax.random.normal(jax.random.key(5), (gh, gw, C)), 0.0)
vy = jnp.where(live, jax.random.normal(jax.random.key(6), (gh, gw, C)), 0.0)
print(f"grid {gh}x{gw} C={C} pack2={pack2} TC_OVERRIDE={TC} "
      f"live={int(live.sum())}", flush=True)

fn = jax.jit(lambda a, b, c, d: _forces_from_cells(a, b, c, d, spec, params,
                                                   False)[0])
t0 = time.perf_counter()
hsync(fn(px, py, vx, vy))
print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

R = 32  # large in-jit R: the fixed ~26 ms dispatch round-trip must amortize
# TRAP (found round 3, protos/time_forces2.py): the POSITIONS must be jostled,
# not just the velocities — the density walk's pallas call consumes only
# (px, py), so with loop-invariant positions XLA hoists the ENTIRE density
# kernel out of the fori_loop and this "two-walk" loop times one walk
# (19.3 vs the true 26 ms at 1M).
loop = jax.jit(lambda seed: jax.lax.fori_loop(
    0, R,
    lambda i, acc: acc + jnp.sum(
        _forces_from_cells(
            jnp.where(live, px + 1e-4 * (seed + jnp.float32(i)), SENTINEL),
            py, vx, vy, spec, params, False)[0]
        [::16, ::16, 0]),
    jnp.float32(0)))
hsync(loop(jnp.float32(0.0)))  # warm; timed call takes a DIFFERENT traced seed
t0 = time.perf_counter()
hsync(loop(jnp.float32(7.0)))
per = (time.perf_counter() - t0) / R * 1e3
print(f"force walks (density + fused P+V): {per:.2f} ms "
      f"(r2 phase baseline 28.4)", flush=True)
