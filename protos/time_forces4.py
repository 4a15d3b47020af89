"""Non-uniform own-chunk gating sweep (follow-up to time_forces3.py).

forces3 measured at 1M/pack2/C=64 (fresh / 40-frame-stepped):
    chunk=32: 25.93 / 25.65   chunk=16: 23.16 / 23.82   chunk=8: 26.21 / 26.67
and the live-slot profile: cells are front-loaded, dead mass concentrates in
each sub-cell's tail quarter.  Uniform fine chunks pay per-branch overhead on
the always-live head; this sweep puts fine chunks ONLY in the tail
(sph.CHUNK_SPLITS, fractions of the 64-slot sub-cell).

Usage: python protos/time_forces4.py [n] [frames]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import rust_particle_system_tpu.ops.pallas.sph as sphmod
from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    plane_step,
)
from rust_particle_system_tpu.ops.pallas.sph_step import _forces_from_cells
from rust_particle_system_tpu.runtime.timing import hsync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 40
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
R = 32

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1, pack2=True)
params = make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)


def uniform_init(key, n, bounds):
    x_min, x_max, y_min, y_max = bounds
    kx, ky = jax.random.split(key)
    pos = jnp.stack(
        [jax.random.uniform(kx, (n,), minval=x_min, maxval=x_max),
         jax.random.uniform(ky, (n,), minval=y_min, maxval=y_max)], axis=-1)
    return make_state(pos)


hsync(jnp.zeros((8,)) + 1.0)

ps0 = plane_state_from_particles(uniform_init(jax.random.key(0), N, BOUNDS),
                                 spec)
step = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
ps = plane_state_from_particles(uniform_init(jax.random.key(0), N, BOUNDS),
                                spec)
ps = step(step(ps))
for _ in range(FRAMES - 2):
    ps = step(ps)
hsync(ps.px)


def time_walks(state, label):
    live = state.px < 0.5 * SENTINEL
    px8, py8, vx8, vy8 = state.px, state.py, state.vx, state.vy

    def body(base):
        def one(i, acc):
            eps = 0.003 * jnp.float32(i) + base
            fpx = jnp.where(live, px8 + eps, SENTINEL)
            fpy = jnp.where(live, py8 + eps, SENTINEL)
            nvx, nvy = _forces_from_cells(fpx, fpy, vx8, vy8, spec, params,
                                          False)
            return acc + jnp.sum(nvx[::16, ::16, 0])
        return one

    fn = jax.jit(lambda base: jax.lax.fori_loop(0, R, body(base),
                                                jnp.float32(0)))
    hsync(fn(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync(fn(jnp.float32(0.0101)))
    print(f"  {label}: {(time.perf_counter() - t0) / R * 1e3:.2f} ms",
          flush=True)


PATTERNS = [
    ("tail16 (0,.75,1)", (0.0, 0.75, 1.0)),
    ("tail16x2 (0,.75,.875,1)", (0.0, 0.75, 0.875, 1.0)),
    ("head40 (0,.625,.75,.875,1)", (0.0, 0.625, 0.75, 0.875, 1.0)),
    ("halves+tail (0,.5,.75,.875,1)", (0.0, 0.5, 0.75, 0.875, 1.0)),
]

print(f"n={N} frames={FRAMES} grid {spec.gh}x{spec.gw} C=64 pack2", flush=True)
for name, splits in PATTERNS:
    sphmod.CHUNK_SPLITS = splits
    print(name, flush=True)
    time_walks(ps0, "fresh")
    time_walks(ps, "stepped")
sphmod.CHUNK_SPLITS = None
