"""Fine-grained per-phase frame breakdown of the Pallas SPH step at 1M particles.

Protocol (the only honest one on this runtime — see runtime/timing.py): every
cut point is a CUMULATIVE PREFIX of the frame pipeline, timed as an in-jit
8-repetition fori_loop over distinct inputs reduced to a checksum; successive
differences give the per-phase costs.  This survives (a) identical-input
memoization, (b) the non-blocking block_until_ready, (c) the ~10s-of-ms per-RPC
host-pull cost that poisons per-call timings.

Prints one JSON line per cut point plus the differenced phase table.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core import kernels as K
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec, build_grid
from rust_particle_system_tpu.ops.pallas import sph as S
from rust_particle_system_tpu.ops.pallas.sph_step import (
    _forces_from_cells,
    sph_physics_pallas,
)
from rust_particle_system_tpu.runtime.timing import hsync

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
CELL_SIZE = 9.0
R = 8  # in-jit repetitions (distinct inputs)


def main():
    spec = GridSpec.from_bounds(BOUNDS, CELL_SIZE, capacity=64, cell_aspect=1,
                                pack2=True)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    nc = spec.num_cells
    dt = params.dt

    def init(i):
        kx, ky = jax.random.split(jax.random.key(i))
        return jnp.stack(
            [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
             jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
            axis=-1,
        )

    pos8 = jnp.stack([init(i) for i in range(R)])
    vel8 = jnp.zeros_like(pos8)

    def predict(i):
        v = vel8[i] + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
        return pos8[i] + v * dt, v

    def sorted_keys_perm(i):
        pred, v = predict(i)
        keys = spec.cell_keys(pred)
        sk, perm = jax.lax.sort(
            (keys, jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=True)
        return pred, v, sk, perm

    # --- cumulative cut points ---
    def upto_sort(i, acc):
        _, _, sk, perm = sorted_keys_perm(i)
        return acc + jnp.sum(perm[::4096]).astype(jnp.float32)

    def upto_grid(i, acc):
        pred, _ = predict(i)
        g = build_grid(spec, pred)
        return acc + (jnp.sum(g.slot[::4096]) + jnp.sum(g.table[::512, 0])).astype(
            jnp.float32
        )

    def make_cells(i):
        pred, v = predict(i)
        g = build_grid(spec, pred)
        packed = jnp.concatenate([pred, v], -1)[g.perm]
        packed = jnp.concatenate(
            [packed, jnp.array([[1e6, 1e6, 0.0, 0.0]], jnp.float32)], 0)
        t = g.table[:nc]
        return packed[jnp.where(t >= 0, t, N)]

    def upto_planes(i, acc):
        return acc + jnp.sum(make_cells(i)[::512, ::32, 0])

    def upto_density(i, acc):
        cells = make_cells(i)
        cp, tc, wt2 = S.plane_geometry((gw + 1) // 2, 2 * C)
        pxg = cells[..., 0].reshape(gh, gw, C)
        pyg = cells[..., 1].reshape(gh, gw, C)
        np2 = (gw + 1) // 2
        apx = S._own_plane(S._pack_a(pxg, S._SENTINEL), gh, np2, wt2, S._SENTINEL, cp)
        apy = S._own_plane(S._pack_a(pyg, S._SENTINEL), gh, np2, wt2, S._SENTINEL, cp)

        def bplane(x, fill):
            b = S._pack_b(x, fill)
            out = jnp.full((gh + 2, wt2 + 2, cp), fill, jnp.float32)
            return out.at[1:gh + 1, 1:np2 + 2, :b.shape[-1]].set(b)

        rho, rhon = S.density_planes(bplane(pxg, S._SENTINEL),
                                     bplane(pyg, S._SENTINEL), params, False,
                                     own_planes=[apx, apy], n_dx=2)
        return acc + jnp.sum(rho[::16, ::16, 0])

    def upto_forces(i, acc):
        cells = make_cells(i)
        ch = tuple(cells[..., k].reshape(gh, gw, C) for k in range(4))
        nvx, _ = _forces_from_cells(*ch, spec, params, False)
        return acc + jnp.sum(nvx[::16, ::16, 0])

    def full_frame(i, acc):
        st = make_state(pos8[i], vel8[i])
        ns, _ = sph_physics_pallas(st, params, spec, False)
        return acc + jnp.sum(ns.pos[::4096])

    cuts = [
        ("sort", upto_sort),
        ("grid_build", upto_grid),
        ("plane_gathers", upto_planes),
        ("density", upto_density),
        ("forces", upto_forces),
        ("full_frame", full_frame),
    ]
    cum = {}
    for name, body in cuts:
        fn = jax.jit(lambda body=body: jax.lax.fori_loop(0, R, body, jnp.float32(0)))
        hsync(fn())
        t0 = time.perf_counter()
        hsync(fn())
        cum[name] = (time.perf_counter() - t0) / R * 1e3
        print(json.dumps({"cut": name, "cumulative_ms": round(cum[name], 2)}),
              flush=True)

    phases = {
        "sort_ms": cum["sort"],
        "starts_slot_table_ms": cum["grid_build"] - cum["sort"],
        "plane_gathers_ms": cum["plane_gathers"] - cum["grid_build"],
        "density_kernel_ms": cum["density"] - cum["plane_gathers"],
        "force_kernel_ms": cum["forces"] - cum["density"],
        "tail_ms": cum["full_frame"] - cum["forces"],
        "full_frame_ms": cum["full_frame"],
    }
    print(json.dumps({"phases": {k: round(v, 2) for k, v in phases.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
