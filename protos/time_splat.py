"""Splat kernel decomposition: where do the ~11 ms of render_state_planes go?

VERDICT r2 #4 wants the standalone 1080p splat under 5 ms.  The plane-resident
state already removed the ~19 ms re-bin; what remains is the patch kernel +
assembly.  This proto times, at 1M particles / 1080p / the production geometry
(stride 8 px cells, margin 4 -> 16x16=256-lane patches, C slots):

  full      splat_from_planes with resolve (the production path)
  margin    argv[3] sets the patch margin (4 = default; 2 = max_radius_px
            for exact planes: 13x13=169 -> 256 lanes vs 17x17=289 -> 384)
  kernel    the pallas_call alone (checksum pull, no assemble/resolve)
  d2only    kernel variant stopping after the distance matmul (alpha+channel
            chain removed) -> isolates the VPU sprite-profile cost
  nochan    kernel with alpha but a single summed output (channel matmul cost)
  flatd2    kernel computing d2 as ONE [TC*C, 4] x [4, lanes] matmul instead of
            TC-batched [C, 4] x [4, lanes] (identical math; batched small-M
            matmuls are suspected latency-bound)
  tc=16/32  cells-per-program sweep

Usage: python protos/time_splat.py [C] [reps]   (defaults C=64, reps=20)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_planes import (  # noqa: F401
    _FAR,
    _round_up,
    splat_from_planes,
)
# NOTE: written against the round-2 splat (K=4 quadratic-form + XLA assembly);
# superseded by time_splat3.py after the round-3 rowstrip redesign.
from rust_particle_system_tpu.runtime.timing import hsync

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
MARGIN = int(sys.argv[3]) if len(sys.argv) > 3 else 4

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=C)
params = make_params(bounds=BOUNDS, particle_size=2.0)

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * 1.0e6
print(f"C={C} grid {spec.gh}x{spec.gw} lost={int(ps.lost)}", flush=True)

x_min, x_max, y_min, y_max = BOUNDS
sxs = RS.width / (x_max - x_min)
sys_ = RS.height / (y_max - y_min)
sx_px = int(round(spec.cell_width * sxs))
sy_px = int(round(spec.cell_size * sys_))
ph = sy_px + 2 * MARGIN
pw = sx_px + 2 * MARGIN
lanes = _round_up(ph * pw, 128)
gh, gw = spec.gh, spec.gw
nc = gh * gw

ppx = jnp.where(live, (ps.px - x_min) * sxs, _FAR)
ppy = jnp.where(live, (y_max - ps.py) * sys_, _FAR)
r = jnp.where(live, 0.5, 0.0)
g = jnp.where(live, 0.7, 0.0)
b = jnp.where(live, 0.9, 0.0)

radius_px = 2.0

pidx = jnp.arange(lanes, dtype=jnp.float32)
prow = jnp.floor(pidx / pw)
pcol = pidx - prow * pw
dead = pidx >= ph * pw
lx = jnp.where(dead, -_FAR, pcol + 0.5)
ly = jnp.where(dead, -_FAR, prow + 0.5)
apix = jnp.stack([lx, ly, jnp.ones_like(lx), lx * lx + ly * ly])
scal = jnp.stack([jnp.float32(radius_px)])


def make_kernel(tc: int, mode: str):
    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref, *outs):
        radius = scal_ref[0]
        t = pl.program_id(0)
        cell = (t * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)).astype(
            jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        origin_x = cx * sx_px - MARGIN
        origin_y = RS.height - (cy + 1.0) * sy_px - MARGIN
        qx = px_ref[:] - origin_x
        qy = py_ref[:] - origin_y
        bmat = jnp.stack(
            [-2.0 * qx, -2.0 * qy, qx * qx + qy * qy, jnp.ones_like(qx)],
            axis=-1)  # [tc, C, 4]
        if mode == "flatd2":
            d2 = jax.lax.dot_general(
                bmat.reshape(tc * C, 4), apix_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(tc, C, lanes)
        else:
            amat = jnp.broadcast_to(apix_ref[:][None], (tc, 4, lanes))
            d2 = jax.lax.dot_general(
                bmat, amat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        if mode == "d2only":
            outs[0][:] = jnp.sum(d2, axis=1)
            return
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        edge0 = 0.8 * radius
        tt = jnp.clip((dist - edge0) / jnp.maximum(radius - edge0, 1e-6), 0.0, 1.0)
        alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
        alpha = jnp.where(alpha < 0.01, 0.0, alpha)
        if mode == "nochan":
            outs[0][:] = jnp.sum(alpha, axis=1)
            return
        cols = jnp.stack(
            [r_ref[:], g_ref[:], b_ref[:], jnp.ones_like(r_ref[:])], axis=1)
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for c in range(4):
            outs[c][:] = acc[:, c, :]

    return kernel


def run_variant(tc: int, mode: str):
    nc_pad = _round_up(nc, tc)

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    planes = [flat(ppx, _FAR), flat(ppy, _FAR), flat(r, 0.0), flat(g, 0.0),
              flat(b, 0.0)]
    n_out = 1 if mode in ("d2only", "nochan") else 4
    block = pl.BlockSpec((tc, C), lambda t: (t, 0))
    out_block = pl.BlockSpec((tc, lanes), lambda t: (t, 0))

    @jax.jit
    def go(planes):
        res = pl.pallas_call(
            make_kernel(tc, mode),
            grid=(nc_pad // tc,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((4, lanes), lambda t: (0, 0))] + [block] * 5,
            out_specs=tuple([out_block] * n_out),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nc_pad, lanes), jnp.float32)] * n_out),
            interpret=False,
        )(scal, apix, *planes)
        return sum(jnp.sum(x[::64, ::64]) for x in res)

    go(planes).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = go(planes)
    hsync(s)
    per = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  tc={tc:3d} mode={mode:8s}: {per:7.2f} ms", flush=True)
    return per


@jax.jit
def full(px, py, vx, vy):
    return splat_from_planes(
        px, py, vx, vy, px < 0.5 * 1.0e6, params.particle_size,
        params.max_energy, bounds_static=BOUNDS, grid_spec=spec,
        render_spec=RS, interpret=False, margin=MARGIN)


img = full(ps.px, ps.py, ps.vx, ps.vy).block_until_ready()
t0 = time.perf_counter()
for _ in range(REPS):
    img = full(ps.px, ps.py, ps.vx, ps.vy)
hsync(img)
print(f"full splat_from_planes: {(time.perf_counter() - t0) / REPS * 1e3:.2f} ms",
      flush=True)

for tc in (8, 16, 32):
    run_variant(tc, "base")
run_variant(8, "flatd2")
run_variant(16, "flatd2")
run_variant(8, "d2only")
run_variant(8, "nochan")
