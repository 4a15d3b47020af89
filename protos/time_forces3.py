"""Round-4 force-span probe: own-slot chunk-gating widths on REALISTIC states.

VERDICT r3 #2 asks for the two force walks to drop 25 -> <=16 ms at 1M uniform.
The untried lever: finer own-slot occupancy gating.  At uniform occupancy
(~39/64 slots live), tile- and 32-lane-chunk gating skip nothing, but if live
slots are FRONT-COMPACTED per cell (as the initial binning guarantees and the
rebin's lowest-hole-first adoption tends to preserve), chunks of 8 own lanes
skip the dead tails: per 128-lane pack2 row the live pattern is
[0..k_a), [64..64+k_b) with k~39 — chunk-8 gating skips ~6/16 chunks = 37.5%
of the pair work.  Whether that survives (a) the per-chunk predication tax and
(b) hole scatter after real stepping is exactly what this proto measures:

  1. run the REAL production pipeline (plane_step) for 40 frames at 1M — the
     bench headline's exact regime — and report the live-slot distribution:
     per-chunk all-dead fractions at widths 8/16/32;
  2. time the two force walks on BOTH the freshly-binned state and the
     40-frame-stepped state, sweeping CHUNK_OVERRIDE in {32 (default), 16, 8}.

Usage: python protos/time_forces3.py [n] [frames]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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


hsync(jnp.zeros((8,)) + 1.0)  # absorb the tunnel's first-pull tax

ps0 = plane_state_from_particles(uniform_init(jax.random.key(0), N, BOUNDS),
                                 spec)
step = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
# donate a FRESH copy: ps0 stays alive for the fresh-binned stats/timing rows
ps = plane_state_from_particles(uniform_init(jax.random.key(0), N, BOUNDS),
                                spec)
ps = step(step(ps))
for _ in range(FRAMES - 2):
    ps = step(ps)
hsync(ps.px)


def chunk_stats(live_plane, label):
    """live_plane [gh, gw, C] -> packed-row [rows, 128] live mask stats."""
    live = np.asarray(live_plane)
    gh, gw, C = live.shape
    if gw % 2:
        live = np.concatenate(
            [live, np.zeros((gh, 1, C), bool)], axis=1)
        gw += 1
    rows = live.reshape(gh, gw // 2, 2 * C).reshape(-1, 2 * C)
    occ = rows.mean()
    out = [f"{label}: occ={occ:.3f}"]
    for w in (32, 16, 8):
        ch = rows.reshape(rows.shape[0], 128 // w, w)
        dead = (~ch.any(axis=2)).mean()
        out.append(f"dead@{w}={dead:.3f}")
    # slot-index liveness profile (first 8 + around the mean)
    prof = rows[:, :64].mean(axis=0)
    out.append("slot-live[0,16,32,40,48,56]="
               + ",".join(f"{prof[i]:.2f}" for i in (0, 16, 32, 40, 48, 56)))
    print("  ".join(out), flush=True)


print(f"n={N} frames={FRAMES} grid {spec.gh}x{spec.gw} C=64 pack2", flush=True)
chunk_stats(ps0.px < 0.5 * SENTINEL, "fresh-binned")
chunk_stats(ps.px < 0.5 * SENTINEL, "stepped")


def time_walks(state, label):
    live = state.px < 0.5 * SENTINEL
    px8, py8 = state.px, state.py
    vx8, vy8 = state.vx, state.vy

    def walk_loop(base):
        def body(i, acc):
            eps = 0.003 * jnp.float32(i) + base
            fpx = jnp.where(live, px8 + eps, SENTINEL)
            fpy = jnp.where(live, py8 + eps, SENTINEL)
            nvx, nvy = _forces_from_cells(fpx, fpy, vx8, vy8, spec, params,
                                          False)
            return acc + jnp.sum(nvx[::16, ::16, 0])
        return body

    fn = jax.jit(lambda base: jax.lax.fori_loop(0, R, walk_loop(base),
                                                jnp.float32(0)))
    hsync(fn(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync(fn(jnp.float32(0.0101)))
    ms = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label}: {ms:.2f} ms", flush=True)
    return ms


for chunk in (0, 16, 8):
    sphmod.CHUNK_OVERRIDE = chunk  # read at trace time; each jit below retraces
    label = f"chunk={chunk if chunk else 32}"
    print(label, flush=True)
    time_walks(ps0, f"{label} fresh")
    time_walks(ps, f"{label} stepped")
