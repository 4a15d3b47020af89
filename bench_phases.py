"""Per-phase frame breakdown of the Pallas SPH step at 1M particles.

Splits one frame into its pipeline phases and times each as a separately-jitted
function (chained on realistic intermediates, cycling distinct inputs to defeat the
axon runtime's identical-input memoization).  This is the measurement backing
bench.py's `phases` field and BASELINE.md's bottleneck table (VERDICT round-1 #7).

Round-1 breakdown (99.55 ms frame): grid 21.8 (argsort 4.5 + a 1M-row starts gather
+ keys re-gather), planes 20.4 (perm gather 8.5 + table gather 11.9), kernels
14.9/24.3/17.2 (density/pressure/viscosity), tail 16.9 (pull-back + a full argsort
for the inverse permutation).
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

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
CELL_SIZE = 9.0
REPS = 10
VARIANTS = 5  # distinct inputs cycled to defeat memoization


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


def timeit(name, fn, inputs_list, results):
    outs = [jax.block_until_ready(fn(*inp)) for inp in inputs_list]
    t0 = time.perf_counter()
    for r in range(REPS):
        o = fn(*inputs_list[r % len(inputs_list)])
    jax.block_until_ready(jax.tree.leaves(o)[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    results[name] = round(ms, 3)
    print(json.dumps({"phase": name, "ms": round(ms, 3)}), flush=True)
    return outs


def main():
    spec = GridSpec.from_bounds(BOUNDS, CELL_SIZE, capacity=128, cell_aspect=2)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    gh, gw, C = spec.gh, spec.gw, spec.capacity
    cp, tc, wt = S.plane_geometry(gw, C)
    nc = spec.num_cells
    dt = params.dt

    states = [uniform_init(jax.random.key(i), N, BOUNDS) for i in range(VARIANTS)]
    results = {}

    # ---- phase 1: predict + build_grid (sort_key_val + searchsorted + table) ----
    @jax.jit
    def p_grid(pos, vel):
        v = vel + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
        pred = pos + v * dt
        g = build_grid(spec, pred)
        return pred, v, g

    grids = timeit("grid_build", p_grid, [(s.pos, s.vel) for s in states], results)

    # ---- phase 2: plane build (perm gather + table gather + pads) ----
    @jax.jit
    def p_planes(pred, vel, perm, table):
        packed = jnp.concatenate([pred, vel], axis=-1)[perm]
        fills = jnp.asarray([S._SENTINEL, S._SENTINEL, 0.0, 0.0], jnp.float32)
        packed = jnp.concatenate([packed, fills[None, :]], axis=0)
        t = table[:nc]
        live = t >= 0
        cells = packed[jnp.where(live, t, N)]
        pxw = S._own_plane(cells[..., 0].reshape(gh, gw, C), gh, gw, wt,
                           S._SENTINEL, cp)
        pyw = S._own_plane(cells[..., 1].reshape(gh, gw, C), gh, gw, wt,
                           S._SENTINEL, cp)
        vxw = S._own_plane(cells[..., 2].reshape(gh, gw, C), gh, gw, wt, 0.0, cp)
        vyw = S._own_plane(cells[..., 3].reshape(gh, gw, C), gh, gw, wt, 0.0, cp)
        return (S._grow_plane(pxw, S._SENTINEL), S._grow_plane(pyw, S._SENTINEL),
                vxw, vyw)

    planes = timeit(
        "plane_build", p_planes,
        [(g[0], g[1], g[2].perm, g[2].table) for g in grids], results)

    # ---- phase 3: density kernel ----
    @jax.jit
    def p_density(ppx, ppy):
        return S.density_planes(ppx, ppy, params, False)

    dens = timeit("density_pallas", p_density,
                  [(p[0], p[1]) for p in planes], results)

    # ---- phase 4: fused pressure+viscosity kernel ----
    @jax.jit
    def p_force(ppx, ppy, vxw, vyw, rho, rhon):
        P1, NPo, NPn = S.pressure_terms(rho, rhon, params)
        return S.force_planes(
            ppx, ppy, S._grow_plane(P1, 0.0), S._grow_plane(NPn, 0.0),
            S._grow_plane(vxw, 0.0), S._grow_plane(vyw, 0.0), NPo, params, False)

    forces = timeit(
        "force_pallas", p_force,
        [(p[0], p[1], p[2], p[3], d[0], d[1]) for p, d in zip(planes, dens)],
        results)

    # ---- phase 5: velocity update + pull-back + inverse perm + tail ----
    @jax.jit
    def p_tail(vxw, vyw, fx, fy, fvx, fvy, sorted_keys, slot, perm, pos, vel):
        vscale = params.viscosity_kernel_norm * params.viscosity_strength * dt
        nvx = vxw + fx * dt + fvx * vscale
        nvy = vyw + fy * dt + fvy * vscale
        vplane = jnp.stack(
            [nvx[:, :gw, :C].reshape(nc, C), nvy[:, :gw, :C].reshape(nc, C)],
            axis=-1)
        s = jnp.minimum(slot, C - 1)
        pulled = vplane[sorted_keys, s]
        in_table = (slot < C)[:, None]
        vel_s = jnp.where(in_table, pulled, 0.0)
        new_vel = vel_s[jnp.argsort(perm)]
        p2 = pos + new_vel * dt
        p2, new_vel = K.bounce_bounds(p2, new_vel, params.bounds,
                                      params.damping_factor)
        color = K.energy_color(new_vel, params.max_energy)
        return p2, new_vel, color

    timeit(
        "tail_pullback", p_tail,
        [(p[2], p[3], f[0], f[1], f[2], f[3], g[2].sorted_keys, g[2].slot,
          g[2].perm, s.pos, s.vel)
         for p, f, g, s in zip(planes, forces, grids, states)], results)

    total = sum(v for k, v in results.items()
                if k in ("grid_build", "plane_build", "density_pallas",
                         "force_pallas", "tail_pullback"))
    print(json.dumps({"phase": "SUM_pipeline", "ms": round(total, 3)}), flush=True)
    print(json.dumps({"phases": results}), flush=True)


if __name__ == "__main__":
    main()
