"""Chase the 5 ms gap: bench phases put the force span at 24.97 ms while
protos/time_forces.py (DEFER=1) measured the bare two walks at 19.77 ms.

Hypotheses, each isolated under the same R=32 in-jit protocol at 1M/pack2/C=64
(production module defaults: DEFER_REDUCE=True):

  W1  walks on REAL rebinned planes, positions FIXED across iterations,
      velocities jostled            — the time_forces protocol on real inputs
  W2  walks on REAL rebinned planes, positions jostled (eps where-add)
      per iteration                 — forces fresh HBM-read of the pos planes
  W3  predicted() + rebin v6 + walks (the bench upto_forces body)
  W4  same as W3 minus the walks (the bench upto_rebin body)

If W3 - W4 >> W1, the gap is interaction (pipeline barriers / HBM pressure
between the rebin and walk kernels), not the walks themselves.

Usage: python protos/time_forces2.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL, rebin_planes
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.ops.pallas.sph_step import _forces_from_cells
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1, pack2=True)
params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
dt = params.dt

kx, ky = jax.random.split(jax.random.key(100))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * SENTINEL
print(f"grid {spec.gh}x{spec.gw} C={spec.capacity} live={int(live.sum())}",
      flush=True)

# One production rebin to get "real" force-walk inputs.
vx0 = jnp.where(live, ps.vx, 0.0)
vy0 = jnp.where(live, ps.vy - params.gravity * dt, 0.0)
predx = jnp.where(live, ps.px + vx0 * dt, SENTINEL)
predy = jnp.where(live, ps.py + vy0 * dt, SENTINEL)
planes_r, _ = rebin_planes([predx, predy, vx0, vy0, ps.idsf], spec,
                           interpret=False, variant=6)
rpx, rpy, rvx, rvy, _ = [jax.block_until_ready(p) for p in planes_r]
rlive = rpx < 0.5 * SENTINEL


def timed(label, body):
    loop = jax.jit(lambda bb: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i, bb), jnp.float32(0)))
    hsync_one(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync_one(loop(jnp.float32(0.0101)))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:44s}: {per:7.2f} ms", flush=True)
    return per


def w1(i, bb):
    v = rvx + 1e-4 * (bb + jnp.float32(i))
    nvx, _ = _forces_from_cells(rpx, rpy, v, rvy, spec, params, False)
    return jnp.sum(nvx[::16, ::16, 0])


def w2(i, bb):
    eps = 0.003 * jnp.float32(i) + bb
    px = jnp.where(rlive, rpx + eps, SENTINEL)
    py = jnp.where(rlive, rpy + eps, SENTINEL)
    nvx, _ = _forces_from_cells(px, py, rvx, rvy, spec, params, False)
    return jnp.sum(nvx[::16, ::16, 0])


def predicted(i, bb):
    eps = 0.003 * jnp.float32(i) + bb
    vx = jnp.where(live, ps.vx, 0.0)
    vy = jnp.where(live, ps.vy - params.gravity * dt, 0.0)
    px = jnp.where(live, ps.px + eps + vx * dt, SENTINEL)
    py = jnp.where(live, ps.py + eps + vy * dt, SENTINEL)
    return px, py, vx, vy


def w3(i, bb):
    px, py, vx, vy = predicted(i, bb)
    planes, _ = rebin_planes([px, py, vx, vy, ps.idsf], spec,
                             interpret=False, variant=6)
    nvx, _ = _forces_from_cells(planes[0], planes[1], planes[2], planes[3],
                                spec, params, False)
    return jnp.sum(nvx[::16, ::16, 0])


def w4(i, bb):
    px, py, vx, vy = predicted(i, bb)
    planes, _ = rebin_planes([px, py, vx, vy, ps.idsf], spec,
                             interpret=False, variant=6)
    return jnp.sum(planes[0][::32, ::32, 0])


print(f"--- R={R}, 1M pack2 C=64, DEFER_REDUCE default ---", flush=True)
t1 = timed("W1 walks, fixed pos / jostled vel", w1)
t2 = timed("W2 walks, jostled pos", w2)
t4 = timed("W4 predict + rebin (bench upto_rebin)", w4)
t3 = timed("W3 predict + rebin + walks (bench upto_forces)", w3)
print(f"  W3-W4 (bench 'force span')                  : {t3 - t4:7.2f} ms",
      flush=True)
