"""Bisect the TPU-worker crash: production rowstrip splat inside lax.fori_loop.

The rowstrip kernel runs fine as a direct dispatch but crashed the TPU worker
when wrapped in an in-jit fori_loop repetition (the bench protocol).  Each
variant runs in THIS process (caller isolates via subprocess):

  direct    one dispatch, no loop                    (expected OK)
  fori      4-rep fori over sliced inputs            (the crashing shape)
  fori1     fori with trip count 1
  same      fori over the SAME (unsliced) input
  nowhen    fori, gating pl.when removed (env SPLAT_NOGATE=1 honored in-module)
  scan      lax.scan instead of fori

Usage: python protos/bisect_fori_crash.py <variant>
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import scatter_init
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    render_plane_state,
)
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.runtime.timing import hsync

variant = sys.argv[1] if len(sys.argv) > 1 else "fori"
N = 200_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)
params = make_params(bounds=BOUNDS)
rspec = RenderSpec(width=1920, height=1080, max_radius_px=2)

states = [
    plane_state_from_particles(
        scatter_init(jax.random.key(50 + i), N, params.bounds).with_ids(), spec)
    for i in range(4)
]
rpx = jnp.stack([s.px for s in states])
rpy = jnp.stack([s.py for s in states])
rvx = jnp.stack([s.vx for s in states])
rvy = jnp.stack([s.vy for s in states])

import dataclasses as dc


def render_i(px, py, vx, vy):
    psr = dc.replace(states[0], px=px, py=py, vx=vx, vy=vy)
    img = render_plane_state(psr, params, spec, rspec, bounds_static=BOUNDS)
    return jnp.sum(img[::64, ::64, 0])


if variant == "direct":
    out = jax.jit(render_i)(states[0].px, states[0].py, states[0].vx,
                            states[0].vy)
    hsync(out)
elif variant in ("fori", "fori1", "same"):
    trips = 1 if variant == "fori1" else 4

    @jax.jit
    def loop(rpx, rpy, rvx, rvy):
        def one(i, acc):
            if variant == "same":
                return acc + render_i(rpx[0], rpy[0], rvx[0], rvy[0])
            return acc + render_i(rpx[i], rpy[i], rvx[i], rvy[i])

        return jax.lax.fori_loop(0, trips, one, jnp.float32(0))

    hsync(loop(rpx, rpy, rvx, rvy))
elif variant == "scan":

    @jax.jit
    def loop(rpx, rpy, rvx, rvy):
        def one(acc, xs):
            px, py, vx, vy = xs
            return acc + render_i(px, py, vx, vy), 0.0

        acc, _ = jax.lax.scan(one, jnp.float32(0), (rpx, rpy, rvx, rvy))
        return acc

    hsync(loop(rpx, rpy, rvx, rvy))
else:
    raise SystemExit(f"unknown variant {variant}")

print(f"OK {variant}")
