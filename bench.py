"""Headline benchmark: particle-steps/sec/chip on the flagship SPH model (Pallas path).

Prints ONE JSON line:
    {"metric": "particle_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e9, ...extra fields...}

``vs_baseline`` measures against the BASELINE.md north-star target of 1e9
particle-steps/sec/chip at 1M particles (the reference publishes no numbers of its
own — see BASELINE.md).  Extra fields record the secondary workloads (flow-field rate,
fused step+render p50, standalone 1080p splat), a coarse per-phase frame breakdown
(VERDICT r1 #7; see bench_phases.py for the fine-grained version), and the issued-vs-
useful pair-work ratio of the force kernels (VERDICT r1 #2).

Protocol: per-frame jitted dispatch with donated state (a scanned loop measurably
de-optimizes Pallas steps — see runtime/simulation.py::run_frames_loop), 2 warm
frames, then FRAMES timed frames with one final host sync.  Phase timings cycle 5
distinct inputs because the axon runtime memoizes identical-input executions.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.models.flow_field import flow_step, make_flow_params
from rust_particle_system_tpu.ops.grid import GridSpec, build_grid
from rust_particle_system_tpu.ops.pallas.sph_step import (
    _forces_from_cells,
    sph_step_pallas,
)
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


def _time_variants(fn, argsets, reps=10):
    for a in argsets[:3]:
        jax.block_until_ready(jax.tree.leaves(fn(*a))[0])
    t0 = time.perf_counter()
    for r in range(reps):
        o = fn(*argsets[r % len(argsets)])
    jax.block_until_ready(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def measure_phases(spec, params):
    """Coarse per-frame phase split: grid build / plane+kernel forces / tail."""
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    dt = params.dt

    def mk(i):
        s = uniform_init(jax.random.key(100 + i), N, BOUNDS)
        return s.pos, s.vel

    states = [mk(i) for i in range(5)]

    @jax.jit
    def p_grid(pos, vel):
        v = vel + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
        pred = pos + v * dt
        return pred, v, build_grid(spec, pred)

    grids = [jax.block_until_ready(p_grid(*s)) for s in states]
    grid_ms = _time_variants(p_grid, states)

    @jax.jit
    def p_cells(pred, vel, perm, table):
        packed = jnp.concatenate([pred, vel], axis=-1)[perm]
        packed = jnp.concatenate(
            [packed, jnp.array([[1e6, 1e6, 0.0, 0.0]], jnp.float32)], 0)
        t = table[:nc]
        live = t >= 0
        cells = packed[jnp.where(live, t, N)]
        return tuple(cells[..., i].reshape(gh, gw, C) for i in range(4))

    cargs = [(g[0], g[1], g[2].perm, g[2].table) for g in grids]
    cellsets = [jax.block_until_ready(p_cells(*a)) for a in cargs]
    cells_ms = _time_variants(p_cells, cargs)

    @jax.jit
    def p_forces(a, b, c, d):
        return _forces_from_cells(a, b, c, d, spec, params, False)

    forces_ms = _time_variants(p_forces, cellsets)
    return {
        "grid_build_ms": round(grid_ms, 2),
        "plane_gather_ms": round(cells_ms, 2),
        "force_kernels_ms": round(forces_ms, 2),
        "detail": "see bench_phases.py for the fine-grained split",
    }


def pair_efficiency(spec, pos):
    """Issued vs within-radius pair counts for one frame's force walk."""
    h = CELL_SIZE
    grid = build_grid(spec, pos)
    nc, C = spec.num_cells, spec.capacity
    from rust_particle_system_tpu.ops.grid import gather_to_cells

    pos_s = pos[grid.perm]
    cpos = gather_to_cells(grid, spec, pos_s)
    nids = spec.neighbor_cell_ids()

    def count_chunk(c0):
        own = jax.lax.dynamic_slice(cpos, (c0, 0, 0), (256, C, 2))
        own_live = jax.lax.dynamic_slice(grid.table, (c0, 0), (256, C)) >= 0
        nbr = cpos[jax.lax.dynamic_slice(nids, (c0, 0), (256, 9))].reshape(256, 9 * C, 2)
        nbr_live = (grid.table[jax.lax.dynamic_slice(nids, (c0, 0), (256, 9))]
                    .reshape(256, 9 * C) >= 0)
        d2 = jnp.sum((nbr[:, None, :, :] - own[:, :, None, :]) ** 2, axis=-1)
        ok = (d2 <= h * h) & own_live[:, :, None] & nbr_live[:, None, :]
        return jnp.sum(ok, dtype=jnp.int64)

    chunks = jnp.arange(0, (nc // 256) * 256, 256)
    useful = int(sum(jax.lax.map(count_chunk, chunks)))
    if spec.pack2:
        np2 = (spec.gw + 1) // 2
        issued = np2 * spec.gh * 128 * 6 * 128
    else:
        cp = max(128, C)
        issued = nc * cp * 9 * cp
    return issued, useful


def main() -> None:
    # Primary: grid-SPH with the pair-packed Pallas layout (aspect-1 cells, two
    # cells per 128-lane row, half-shifted B-unit neighbors — 6 offsets, not 9).
    spec = GridSpec.from_bounds(BOUNDS, CELL_SIZE, capacity=64, cell_aspect=1,
                                pack2=True)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    state = uniform_init(jax.random.key(0), N, BOUNDS)
    sph = jax.jit(lambda s: sph_step_pallas(s, params, spec), donate_argnums=0)
    sph_elapsed, state = _time_loop(sph, state, FRAMES)
    sph_rate = FRAMES * N / sph_elapsed

    # Pair-work efficiency (VERDICT r1 #2): issued slot-pairs per walk vs pairs
    # actually within the smoothing radius.
    issued, useful = pair_efficiency(spec, uniform_init(jax.random.key(7), N, BOUNDS).pos)

    # Per-phase breakdown (VERDICT r1 #7).
    phases = measure_phases(spec, params)

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
                "pairs_issued_per_walk": issued,
                "pairs_useful_per_walk": useful,
                "pair_waste_ratio": round(issued / max(useful, 1), 2),
                "phases": phases,
                "backend": "pallas_sph_pack2",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
