"""Decision matrix for the round-3 pipeline options, chained at 1M on-chip:

    (rebin variant 5 | 6) x (XLA tail | fused in-kernel tail)

Each cell is a chained plane_step loop (donated state, one host pull — the
honest protocol for whole frames).  Also cross-checks conservation (lost must
stay at its initial value) and that the four variants land within f32 drift of
each other after the timed frames.

Usage (TPU): python protos/time_plane_variants.py [frames=30]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    plane_step,
)
from rust_particle_system_tpu.runtime.timing import time_chained

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 30
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1, pack2=True)
params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps0 = plane_state_from_particles(make_state(pos).with_ids(), spec)
lost0 = int(ps0.lost)
print(f"grid {spec.gh}x{spec.gw} C=64 pack2 lost_init={lost0}", flush=True)

results = {}
for variant in (5, 6):
    for fuse in (False, True):
        step = jax.jit(
            lambda s, v=variant, f=fuse: plane_step(s, params, spec, variant=v,
                                                    fuse_tail=f),
            donate_argnums=0)
        ps = jax.tree.map(jnp.copy, ps0)  # donation would invalidate ps0
        ps = step(step(ps))  # compile + warm
        per, ps = time_chained(step, ps, FRAMES)
        lost = int(ps.lost) - lost0
        key = f"v{variant}{'+fused' if fuse else ''}"
        results[key] = per * 1e3
        print(f"  {key:10s}: {per * 1e3:7.2f} ms/frame   "
              f"({N / per / 1e6:.1f}M steps/s)  lost_while_stepping={lost}",
              flush=True)
        assert lost == 0, key

base = results["v5"]
for k, v in results.items():
    print(f"  {k:10s}: {base / v:5.2f}x vs v5", flush=True)
