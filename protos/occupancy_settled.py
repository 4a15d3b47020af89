"""Settled-pool per-cell occupancy: what capacity does a resting fluid need?

Decides whether small scenes (the reference's default 50k) can run a
capacity-32 pack2 layout (half the issued lanes of C=64 everywhere) without
deferral storms once the fluid pools at the bottom.  Occupancy at rest is set
by the SPH rest spacing (target_density / pressure), NOT by n — so the 1M and
50k pools should show the same per-cell max.

RESULTS (TPU v5 lite0, 2026-08-21, this file):

  50k scatter settled: frames=900 max/cell=64 p99=64 live_rows=7/121 lost=0
    occ_hist(0,1-8,9-16,17-24,25-32,33-48,49-64)=[25011,25,24,25,31,52,726]
  1M uniform settled : frames=400 max/cell=64 p99=64 live_rows=109/121 lost=0
    occ_hist=[10156,29,34,30,30,44,15571]

Conclusions: (a) the resting fluid SATURATES capacity 64 (p99 = max = 64) —
capacity 32 would starve the pool and churn the deferral machinery, so C=64
pack2 stays the smallest safe uniform-fast layout and C=128 classic stays the
settle-safe default; (b) a settled 50k pool keeps only 7 of 121 cell rows
live — the motivation for the rebin air-window row skip (ops/pallas/rebin.py
_make_kernel_v6), which cut measured settled frames: settled C=128 bench row
28.0 -> 25.13 ms, 50k steady-state fused frame 25.6 -> 10.96 ms (91 fps);
(c) 900 frames of an at-capacity pool with zero losses is a deferral stress
result in itself.
"""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    plane_step,
)
from rust_particle_system_tpu.runtime.timing import hsync

BOUNDS = (-960.0, 960.0, -540.0, 540.0)


def occupancy(label, n, frames, capacity=64):
    spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=capacity, cell_aspect=1,
                                pack2=True)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    if label.startswith("50k"):
        st = rps.scatter_init(jax.random.key(0), n, BOUNDS)
    else:
        kx, ky = jax.random.split(jax.random.key(0))
        pos = jnp.stack(
            [jax.random.uniform(kx, (n,), minval=BOUNDS[0], maxval=BOUNDS[1]),
             jax.random.uniform(ky, (n,), minval=BOUNDS[2], maxval=BOUNDS[3])],
            axis=-1)
        st = make_state(pos)
    ps = plane_state_from_particles(st.with_ids(), spec)
    sph = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
    for _ in range(frames):
        ps = sph(ps)
    hsync(ps.px)
    cnt = np.asarray(jnp.sum(jnp.where(ps.px < 0.5 * SENTINEL, 1, 0), axis=-1))
    live_rows = int((cnt.sum(axis=1) > 0).sum())
    hist, _ = np.histogram(cnt, bins=[0, 1, 9, 17, 25, 33, 49, 65])
    print(f"{label}: frames={frames} max/cell={cnt.max()} "
          f"p99={int(np.percentile(cnt[cnt > 0], 99))} live_rows={live_rows}/"
          f"{cnt.shape[0]} lost={int(ps.lost)} occ_hist(0,1-8,9-16,17-24,"
          f"25-32,33-48,49-64)={hist.tolist()}", flush=True)


if __name__ == "__main__":
    occupancy("50k scatter settled", 50_000, 900)
    occupancy("1M uniform settled ", 1_000_000, 400)
