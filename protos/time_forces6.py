"""Classic-layout (C=128 settle-safe) tail gating, 32-aligned.

The pack2 split pattern (0, 5/8, 3/4, 7/8, 1) REGRESSED the settled C=128
equilibrium 30.5 -> 37.1 ms/frame: the [0, 80) head slice is vreg-misaligned
and pool cells (occupancy ~101) lose the all-live single-branch fast path for
nothing (only [112, 128) is dead for them).  This probes a 32-ALIGNED pattern
with a dead-for-pool tail: (0, 3/4, 7/8, 1) -> [0:96][96:112][112:128], which
should skip ~12.5% of pool-cell pair work while the head stays one clean
96-lane slice.  Measured on the REAL settled state (238 frames of gravity
settling at 1M, the bench's settled-row regime) and on the uniform state.

Usage: python protos/time_forces6.py
"""

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

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
R = 32
SETTLE = 238

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=128)  # classic settle-safe
params = make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)

kx, ky = jax.random.split(jax.random.key(3))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
    axis=-1)

hsync(jnp.zeros((8,)) + 1.0)
ps_u = plane_state_from_particles(make_state(pos), spec)  # uniform snapshot
ps = plane_state_from_particles(make_state(pos), spec)
step = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
ps = step(step(ps))
for _ in range(SETTLE):
    ps = step(ps)
hsync(ps.px)
print(f"settled: live rows occupancy mean "
      f"{float(jnp.mean(jnp.sum(ps.px < 0.5 * SENTINEL, axis=-1)
                        .astype(jnp.float32))):.1f}/128", flush=True)


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


# The kernel gates classic layouts only through uniform chunks today; this
# probe drives the splits path for n_dx=3 via a temporary monkeypatch of the
# n_dx guard (flip the condition by setting CLASSIC too).
import rust_particle_system_tpu.ops.pallas.sph as s

orig_src_guard = None

for label, splits, classic in (
    ("uniform-32 chunks (production)", None, False),
    ("splits (0,.75,.875,1) 32-aligned", (0.0, 0.75, 0.875, 1.0), True),
):
    sphmod.CHUNK_SPLITS = splits
    if classic:
        # widen the guard: apply splits to n_dx=3 too for this measurement
        sphmod.CHUNK_SPLITS_CLASSIC = True
    print(label, flush=True)
    time_walks(ps_u, "uniform")
    time_walks(ps, "settled")
sphmod.CHUNK_SPLITS = (0.0, 0.625, 0.75, 0.875, 1.0)
sphmod.CHUNK_SPLITS_CLASSIC = False
