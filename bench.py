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

Protocol notes (hard-won; see runtime/timing.py): this runtime memoizes
identical-input executions, its block_until_ready can return before completion
(only device->host pulls are true barriers), and every host RPC costs ~10s of ms —
so the chained frame loop ends in ONE host pull, and all unchained measurements
(phases, splat) run as in-jit repetition loops over distinct inputs with checksum
outputs.  Scan vs host loop is a wash for heavy frames (measured 65.5 ms both).
"""

from __future__ import annotations

import json
import sys
import time


def _progress(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

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
    # Chained timing with a host-pull barrier: block_until_ready does NOT actually
    # block on this runtime (see runtime/timing.py) — only device->host pulls do.
    from rust_particle_system_tpu.runtime.timing import hsync, time_chained

    state = step(state)  # compile + warm (chained; step donates its input)
    state = step(state)
    per, state = time_chained(step, state, frames)
    return per * frames, state


def measure_phases(spec, params, frame_ms):
    """Per-frame phase split via cumulative prefixes, each timed as an in-jit
    8-repetition loop over distinct inputs with a checksum output — the only
    protocol that survives this runtime's identical-input memoization, its
    non-blocking block_until_ready, AND its ~10s of ms per-RPC host-pull cost
    (see runtime/timing.py).  Differences of successive prefixes give the phases.
    """
    from rust_particle_system_tpu.runtime.timing import hsync

    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    dt = params.dt
    R = 8
    states = [uniform_init(jax.random.key(100 + i), N, BOUNDS) for i in range(R)]
    pos8 = jnp.stack([st.pos for st in states])
    vel8 = jnp.stack([st.vel for st in states])

    ids = jnp.arange(N, dtype=jnp.int32)

    def predict(i):
        v = vel8[i] + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
        return pos8[i] + v * dt, v

    def upto_grid(i, acc):
        pred, _ = predict(i)
        g = build_grid(spec, pred, with_table=False)
        return acc + jnp.sum(g.perm[::4096]).astype(jnp.float32)

    def make_packed(i):
        # The resident production gather: (pred, vel, pos, f32-valued ids).
        pred, v = predict(i)
        g = build_grid(spec, pred, with_table=False)
        idsf = ids.astype(jnp.float32)
        return g, jnp.concatenate([pred, v, pos8[i], idsf[:, None]], -1)[g.perm]

    def upto_gather(i, acc):
        _g, packed = make_packed(i)
        return acc + jnp.sum(packed[::4096, 0])

    def make_cells(i):
        from rust_particle_system_tpu.ops.pallas.plane_build import cell_planes_aos
        from rust_particle_system_tpu.ops.pallas.sph_step import _SENTINEL

        g, packed = make_packed(i)
        fills = (_SENTINEL, _SENTINEL, 0.0, 0.0)
        return cell_planes_aos(packed[:, :4], g.starts, nc, C, fills, False)

    def upto_planes(i, acc):
        return acc + jnp.sum(make_cells(i)[::512, ::32, 0])

    def upto_forces(i, acc):
        cells = make_cells(i)
        ch = tuple(cells[..., k].reshape(gh, gw, C) for k in range(4))
        nvx, _ = _forces_from_cells(*ch, spec, params, False)
        return acc + jnp.sum(nvx[::16, ::16, 0])

    def timed(body):
        fn = jax.jit(lambda: jax.lax.fori_loop(0, R, body, jnp.float32(0)))
        hsync(fn())
        t0 = time.perf_counter()
        hsync(fn())
        return (time.perf_counter() - t0) / R * 1e3

    t_grid = timed(upto_grid)
    t_gather = timed(upto_gather)
    t_planes = timed(upto_planes)
    t_forces = timed(upto_forces)
    return {
        "grid_build_ms": round(t_grid, 2),
        "perm_gather_ms": round(t_gather - t_grid, 2),
        "plane_kernel_ms": round(t_planes - t_gather, 2),
        "force_kernels_ms": round(t_forces - t_planes, 2),
        "tail_ms": round(frame_ms - t_forces, 2),
        "protocol": "in-jit x8 cumulative prefixes; tail = frame - prefix",
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
        # f32 per-chunk counts are exact (a chunk caps at 256*C*9C < 2^24 pairs);
        # the cross-chunk total sums in float64 on the host.  int64 would truncate
        # to int32 without x64 mode and spam the one JSON line users read.
        return jnp.sum(ok, dtype=jnp.float32)

    import numpy as np

    chunks = jnp.arange(0, (nc // 256) * 256, 256)
    useful = int(np.asarray(jax.lax.map(count_chunk, chunks), np.float64).sum())
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
    state = uniform_init(jax.random.key(0), N, BOUNDS).with_ids()
    sph = jax.jit(
        lambda s: sph_step_pallas(s, params, spec, resident=True), donate_argnums=0
    )
    _progress("headline...")
    sph_elapsed, state = _time_loop(sph, state, FRAMES)
    sph_rate = FRAMES * N / sph_elapsed

    # Pair-work efficiency (VERDICT r1 #2): issued slot-pairs per walk vs pairs
    # actually within the smoothing radius.
    _progress("pair_efficiency...")
    issued, useful = pair_efficiency(spec, uniform_init(jax.random.key(7), N, BOUNDS).pos)

    # Per-phase breakdown (VERDICT r1 #7).
    _progress("phases...")
    phases = measure_phases(spec, params, sph_elapsed / FRAMES * 1e3)

    # Secondary: config-2 flow-field fused integrate at 1M, scanned (one dispatch
    # per 100 frames — host dispatch costs ~8 ms/frame on this runtime, which would
    # otherwise dominate an elementwise step).
    from rust_particle_system_tpu.runtime.simulation import run_frames
    from rust_particle_system_tpu.runtime.timing import hsync

    _progress("flow...")
    fparams = make_flow_params(bounds=BOUNDS)
    fstate = uniform_init(jax.random.key(1), N, BOUNDS)
    FLOW_FRAMES = 100
    fstate = run_frames(flow_step, fstate, fparams, FLOW_FRAMES)
    hsync(fstate.pos)
    t0 = time.perf_counter()
    fstate = run_frames(flow_step, fstate, fparams, FLOW_FRAMES)
    hsync(fstate.pos)
    flow_elapsed = time.perf_counter() - t0
    flow_rate = FLOW_FRAMES * N / flow_elapsed

    # Secondary: fused step + render p50 frame time (the BASELINE.json p50 metric).
    from rust_particle_system_tpu.ops.pallas.sph_step import sph_frame_pallas

    fused = jax.jit(
        lambda s: sph_frame_pallas(s, params, spec, RenderSpec(), bounds_static=BOUNDS,
                                   resident=True),
        donate_argnums=0,
    )
    _progress("fused...")
    fstate2 = uniform_init(jax.random.key(2), N, BOUNDS).with_ids()
    from rust_particle_system_tpu.runtime.timing import hsync

    fstate2, img = fused(fstate2)
    fstate2, img = fused(fstate2)
    hsync(img)
    t0 = time.perf_counter()
    for _ in range(11):
        fstate2, img = fused(fstate2)
    hsync((fstate2.pos, img))
    p50_frame_ms = (time.perf_counter() - t0) / 11 * 1e3

    # Secondary: 1080p point-splat render of 1M sprites — the PRODUCTION
    # raw-positions path (SPHFluid.render identity camera): cell-plane binning +
    # MXU patch rasterizer (ops/pallas/sph_step.py::render_state_planes).
    # In-jit x4 over distinct states, checksum output — see measure_phases for why.
    from rust_particle_system_tpu.ops.pallas.sph_step import render_state_planes

    rspec = RenderSpec(width=1920, height=1080, max_radius_px=2)  # radius 2 px below
    color = fstate.color
    rstates = [uniform_init(jax.random.key(50 + i), N, BOUNDS) for i in range(4)]
    rpos4 = jnp.stack([s.pos for s in rstates])
    rparams = params._replace(particle_size=jnp.float32(2.0))

    @jax.jit
    def splat4(rpos4, color):
        def one(i, acc):
            img = render_state_planes(
                make_state(rpos4[i], color=color), rparams, spec, rspec,
                bounds_static=BOUNDS,
            )
            return acc + jnp.sum(img[::64, ::64, 0])
        return jax.lax.fori_loop(0, 4, one, jnp.float32(0))

    _progress("splat...")
    hsync(splat4(rpos4, color))
    t0 = time.perf_counter()
    hsync(splat4(rpos4, color))
    render_ms = (time.perf_counter() - t0) / 4 * 1e3

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
                "fused_frame_ms": round(p50_frame_ms, 2),
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
