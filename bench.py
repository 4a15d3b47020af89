"""Headline benchmark: particle-steps/sec/chip on the flagship SPH model (Pallas path).

Prints ONE JSON line:
    {"metric": "particle_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e9, ...extra fields...}

``vs_baseline`` measures against the BASELINE.md north-star target of 1e9
particle-steps/sec/chip at 1M particles (the reference publishes no numbers of its
own — see BASELINE.md).  Extra fields record the secondary workloads: the config-2
flow-field fused-integrate rate and the 1080p point-splat render time at 1M sprites.

Protocol: per-frame jitted dispatch with donated state (a scanned loop measurably
de-optimizes Pallas steps — see runtime/simulation.py::run_frames_loop), 2 warm
frames, then FRAMES timed frames with one final host sync.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.models.flow_field import flow_step, make_flow_params
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.sph_step import sph_step_pallas
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_pallas import splat_pallas

N = 1_000_000
FRAMES = 20
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
CELL_SIZE = 9.0


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
    return make_state(pos)


def _time_loop(step, state, frames):
    state = jax.block_until_ready(step(state))  # compile + warm
    state = jax.block_until_ready(step(state))
    t0 = time.perf_counter()
    for _ in range(frames):
        state = step(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    return time.perf_counter() - t0, state


def main() -> None:
    # Primary: grid-SPH with Pallas force kernels, wide cells (aspect 2).
    spec = GridSpec.from_bounds(BOUNDS, CELL_SIZE, capacity=128, cell_aspect=2)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    state = uniform_init(jax.random.key(0), N, BOUNDS)
    sph = jax.jit(lambda s: sph_step_pallas(s, params, spec), donate_argnums=0)
    sph_elapsed, state = _time_loop(sph, state, FRAMES)
    sph_rate = FRAMES * N / sph_elapsed

    # Secondary: config-2 flow-field fused integrate at 1M.
    fparams = make_flow_params(bounds=BOUNDS)
    fstate = uniform_init(jax.random.key(1), N, BOUNDS)
    flow = jax.jit(lambda s: flow_step(s, fparams), donate_argnums=0)
    flow_elapsed, fstate = _time_loop(flow, fstate, FRAMES)
    flow_rate = FRAMES * N / flow_elapsed

    # Secondary: fused step + render p50 frame time (the BASELINE.json p50 metric).
    from rust_particle_system_tpu.ops.pallas.sph_step import sph_frame_pallas

    fused = jax.jit(
        lambda s: sph_frame_pallas(s, params, spec, RenderSpec(), bounds_static=BOUNDS),
        donate_argnums=0,
    )
    fstate2 = uniform_init(jax.random.key(2), N, BOUNDS)
    fstate2, img = fused(fstate2)
    jax.block_until_ready(img)
    frame_times = []
    for _ in range(11):
        t0 = time.perf_counter()
        fstate2, img = fused(fstate2)
        jax.block_until_ready(img)
        frame_times.append(time.perf_counter() - t0)
    p50_frame_ms = sorted(frame_times)[len(frame_times) // 2] * 1e3

    # Secondary: 1080p Pallas point-splat render of 1M sprites.
    rspec = RenderSpec(width=1920, height=1080, max_radius_px=4)
    pos, color = fstate.pos, fstate.color
    render = jax.jit(
        lambda p, c: splat_pallas(
            p, c, jnp.float32(2.0), jnp.asarray(BOUNDS, jnp.float32), rspec
        )
    )
    img = jax.block_until_ready(render(pos, color))
    t0 = time.perf_counter()
    for _ in range(10):
        img = render(pos, color)
    jax.block_until_ready(img)
    render_ms = (time.perf_counter() - t0) / 10 * 1e3

    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec_per_chip",
                "value": sph_rate,
                "unit": "steps/s",
                "vs_baseline": sph_rate / 1e9,
                "n_particles": N,
                "frames": FRAMES,
                "sph_ms_per_frame": round(sph_elapsed / FRAMES * 1e3, 2),
                "p50_fused_frame_ms": round(p50_frame_ms, 2),
                "flow_steps_per_sec": round(flow_rate),
                "splat_1080p_ms": round(render_ms, 3),
                "backend": "pallas_sph_aspect2",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
