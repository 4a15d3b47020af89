"""Headline benchmark: particle-steps/sec/chip on the flagship grid-SPH model.

Prints ONE JSON line:
    {"metric": "particle_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e9, ...}

``vs_baseline`` is measured against the BASELINE.md north-star target of 1e9
particle-steps/sec/chip at 1M particles (the reference publishes no numbers of its own
— see BASELINE.md).  Runs on whatever jax.devices()[0] is (the real TPU under the
driver).  Protocol: compile once, warm 2 scanned chunks, then time FRAMES frames inside
lax.scan (state stays on-device; one host sync at the end).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.grid_step import grid_step
from rust_particle_system_tpu.runtime.simulation import run_frames

N = 1_000_000
FRAMES = 20
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
CELL_SIZE = 9.0
CAPACITY = 128  # ~3.3x the uniform average occupancy at 1M
CHUNK_CELLS = 64


def uniform_init(key, n, bounds):
    x_min, x_max, y_min, y_max = bounds
    kx, ky = jax.random.split(key)
    pos = jnp.stack(
        [
            jax.random.uniform(kx, (n,), minval=x_min, maxval=x_max),
            jax.random.uniform(ky, (n,), minval=y_min, maxval=y_max),
        ],
        axis=-1,
    )
    from rust_particle_system_tpu.core.state import make_state

    return make_state(pos)


def main() -> None:
    spec = GridSpec.from_bounds(BOUNDS, CELL_SIZE, CAPACITY)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    state = uniform_init(jax.random.key(0), N, BOUNDS)

    def step(s, p):
        return grid_step(s, p, spec, CHUNK_CELLS)

    # compile + warm
    state = run_frames(step, state, params, 2)
    jax.block_until_ready(state.pos)

    t0 = time.perf_counter()
    state = run_frames(step, state, params, FRAMES)
    jax.block_until_ready(state.pos)
    elapsed = time.perf_counter() - t0

    value = FRAMES * N / elapsed
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec_per_chip",
                "value": value,
                "unit": "steps/s",
                "vs_baseline": value / 1e9,
                "n_particles": N,
                "frames": FRAMES,
                "elapsed_s": round(elapsed, 3),
                "backend": "grid_jax",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
