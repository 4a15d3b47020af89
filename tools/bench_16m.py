"""16M-particle single-chip benchmark of the PLANE-RESIDENT pipeline.

Round 2 ran 16M only through the non-resident stream path (1.27 s/frame): the
stream-resident ids encoding capped at n < 2^23.  The plane-resident state
carries ids as plain f32 (exact to 2^24), so 16M = 1.6e7 < 2^24 runs resident —
this records it.  Domain scales with sqrt(n/1e6) (capacity stays 64, grid
856x484); chained-loop timing with one host pull (runtime/timing.py protocol).

Usage (TPU): python tools/bench_16m.py [frames=10] [variant=5]
"""

from __future__ import annotations

import json
import sys
import time

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

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
VARIANT = int(sys.argv[2]) if len(sys.argv) > 2 else 5
N = 16_000_000
BOUNDS = (-3840.0, 3840.0, -2160.0, 2160.0)  # 4x the 1M domain: same density
CELL = 9.0

# Structural smoke without the chip (numbers meaningless): tiny shapes on CPU.
import os

if os.environ.get("RPS_BENCH_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")
    N = 2048
    BOUNDS = (-144.0, 144.0, -72.0, 72.0)
    FRAMES = 2


def main() -> None:
    spec = GridSpec.from_bounds(BOUNDS, CELL, capacity=64, cell_aspect=1,
                                pack2=True)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    kx, ky = jax.random.split(jax.random.key(0))
    pos = jnp.stack(
        [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
         jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
        axis=-1)
    t0 = time.perf_counter()
    ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
    lost_init = int(ps.lost)
    print(f"[16m] grid {spec.gh}x{spec.gw} C=64 init binning "
          f"{time.perf_counter() - t0:.1f}s lost={lost_init}", flush=True)

    step = jax.jit(lambda s: plane_step(s, params, spec, variant=VARIANT),
                   donate_argnums=0)
    t0 = time.perf_counter()
    ps = step(step(ps))  # compile + warm
    jax.block_until_ready(ps.frame)
    print(f"[16m] compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    per, ps = time_chained(step, ps, FRAMES)
    lost_stepping = int(ps.lost) - lost_init
    print(json.dumps({
        "metric": "steps_per_sec_16m_plane_resident",
        "value": round(N / per),
        "unit": "steps/s",
        "ms_per_frame": round(per * 1e3, 1),
        "n_particles": N,
        "frames": FRAMES,
        "variant": VARIANT,
        "lost_at_init": lost_init,
        "lost_while_stepping": lost_stepping,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
