"""Sweep the row-strip rasterizer's placement sub-tile size (_TCS).

Placement cost per frame is ~dot-issue-count-bound: per sub-tile the kernel runs
3 small matmuls (acc, cells->lanes, strip placement), and at _TCS=16 the 1080p
sim-grid geometry issues 121 rows x 14 sub-tiles x 3 = ~5k dots/frame.  Doubling
_TCS halves the count (dot shapes grow, but their true FLOPs are <1% of MXU
peak, so latency/issue dominates).  VMEM bounds the sweep: alpha is
[tcs, C, LANES] f32 (2 MB at tcs=32, 4 MB at 64).

Usage: python protos/time_splat5.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu.render.splat_planes as sp
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * sp._FAR
vx = jnp.where(live, 30.0, 0.0)
vy = jnp.where(live, -12.0, 0.0)


def timed(label, body):
    loop = jax.jit(lambda: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i), jnp.float32(0)))
    hsync_one(loop())
    t0 = time.perf_counter()
    hsync_one(loop())
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:40s}: {per:7.2f} ms", flush=True)
    return per


def full(i):
    d = 0.003 * jnp.float32(i)
    px = jnp.where(live, ps.px + d, sp._FAR)
    py = jnp.where(live, ps.py + d, sp._FAR)
    img = sp.splat_from_planes(
        px, py, vx, vy, live, 2.0, 300.0, bounds_static=BOUNDS, grid_spec=spec,
        render_spec=RS, interpret=False, margin=3)
    return jnp.sum(img[::97, ::101, 0])


# correctness pin: tcs variants must agree bitwise-ish with the default
base = None
for tcs in (16, 32, 64):
    sp._TCS = tcs
    sp.splat_from_planes.clear_cache()
    img = sp.splat_from_planes(
        ps.px, ps.py, vx, vy, live, 2.0, 300.0, bounds_static=BOUNDS,
        grid_spec=spec, render_spec=RS, interpret=False, margin=3)
    if base is None:
        base = img
    else:
        err = float(jnp.max(jnp.abs(img - base)))
        print(f"tcs={tcs} max|img - img16| = {err:.2e}", flush=True)
        assert err < 1e-4, err
    timed(f"splat_from_planes m=3 tcs={tcs}", full)
