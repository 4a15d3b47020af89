"""Kernel-only vs kernel+y-fold split of the v2 row-sublane splat at 1080p/1M.

time_splat7 put the FULL production render at 6.6 ms with resolve + color prep
free (both fuse).  This isolates the remaining two stages:

  kernel — the pallas_call alone (checksum the raw strip tensor q)
  +fold  — splat_from_planes(resolve=False): kernel + the two shifted adds

Replicates the v2 setup of render/splat_planes.py::splat_from_planes at the
identity-camera sim-grid geometry (margin = max_radius_px + 1 = 3).

Usage: python protos/time_splat8.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_planes import (
    _FAR,
    _make_strip_kernel_v2,
    _round_up,
    splat_from_planes,
)
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
MARGIN = RS.max_radius_px + 1

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)
params = rps.make_params(bounds=BOUNDS, shader_delay=0,
                         particle_size=jnp.float32(2.0))

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * _FAR
vx = jnp.where(live, 30.0, 0.0)
vy = jnp.where(live, -12.0, 0.0)
rcol = jnp.where(live, 0.2, 0.0)
gcol = jnp.where(live, 0.5, 0.0)
bcol = jnp.where(live, 0.9, 0.0)

# --- replicate the v2 geometry/consts of splat_from_planes ------------------
g = spec
gh, gw, C = ps.px.shape
x_min, x_max, y_min, y_max = BOUNDS
sx_scale = RS.width / (x_max - x_min)
sy_scale = RS.height / (y_max - y_min)
sx_px = int(round(g.cell_width * sx_scale))
sy_px = int(round(g.cell_size * sy_scale))
H, W = RS.height, RS.width
margin = MARGIN
ph = sy_px + 2 * margin
pw = sx_px + 2 * margin
rowpad = 16 if pw <= 16 else 32
G = 128 // rowpad
wt = _round_up(gw, G)
nsub = wt // G
PH_PAD = _round_up(ph, 8)
WP = _round_up((nsub - 1) * G * sx_px + 128, 128)
print(f"geom: gh={gh} gw={gw} C={C} sx={sx_px} sy={sy_px} ph={ph} pw={pw} "
      f"rowpad={rowpad} G={G} WP={WP}", flush=True)

lidx = np.arange(128)
lt, lj = lidx // rowpad, lidx % rowpad
E8 = jnp.asarray((lidx[None, :] // rowpad
                  == np.arange(G)[:, None]).astype(np.float32))
base = jnp.asarray((lt * sx_px - margin)[None, :], jnp.float32)
ljc = jnp.asarray(np.where(lj < pw, lj + 0.5, -_FAR)[None, :], jnp.float32)
iy = jnp.asarray(np.broadcast_to(
    (np.arange(PH_PAD) + 0.5)[:, None], (PH_PAD, 128)), jnp.float32)
P8 = np.zeros((128, 128), np.float32)
for l in range(128):
    if l % rowpad < pw:
        P8[l, (l // rowpad) * sx_px + l % rowpad] = 1.0
P8 = jnp.asarray(P8)

kernel = _make_strip_kernel_v2(gh, wt, C, G, rowpad, sx_px, sy_px,
                               margin, H, WP, PH_PAD, pw)
const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((G, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
               pl.BlockSpec((128, 128), lambda rr: (0, 0))]
in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))


def kernel_only(px, py, r, gc, b, radius_px):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)

    def plane(a, fill):
        if wt == gw:
            return a
        padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
        return jnp.concatenate([a, padc], axis=1)

    planes = [plane(px, _FAR), plane(py, _FAR), plane(r, 0.0),
              plane(gc, 0.0), plane(b, 0.0)]
    return pl.pallas_call(
        kernel,
        grid=(gh,),
        in_specs=const_specs + [in_block] * 5,
        out_specs=pl.BlockSpec((4, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((4, gh, PH_PAD, WP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(scal, E8, base, ljc, iy, P8, *planes)


def timed(label, body):
    loop = jax.jit(lambda bb: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i, bb), jnp.float32(0)))
    hsync_one(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync_one(loop(jnp.float32(0.0101)))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:28s}: {per:7.2f} ms", flush=True)
    return per


def jostle(i, bb):
    eps = 0.003 * jnp.float32(i) + bb
    px = jnp.where(live, ps.px + eps, _FAR)
    py = jnp.where(live, ps.py + eps, _FAR)
    # world -> pixel plane mapping (matches splat_from_planes)
    ppx = jnp.where(live, (px - x_min) * sx_scale, _FAR)
    ppy = jnp.where(live, (y_max - py) * sy_scale, _FAR)
    return ppx, ppy


def kernel_body(i, bb):
    ppx, ppy = jostle(i, bb)
    q = kernel_only(ppx, ppy, rcol, gcol, bcol,
                    params.particle_size * sx_scale)
    return jnp.sum(q[:, ::16, :, ::64])


def fold_body(i, bb):
    eps = 0.003 * jnp.float32(i) + bb
    px = jnp.where(live, ps.px + eps, _FAR)
    py = jnp.where(live, ps.py + eps, _FAR)
    rgb_acc, a_acc = splat_from_planes(
        px, py, vx, vy, live, params.particle_size, params.max_energy,
        bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
        margin=margin, colors=(rcol, gcol, bcol), resolve=False)
    return jnp.sum(rgb_acc[::64, ::64, 0]) + jnp.sum(a_acc[::64, ::64])


print(f"--- R={R}, 1M @ 1080p, margin={margin} ---", flush=True)
t_k = timed("kernel only", kernel_body)
t_f = timed("kernel + y-fold", fold_body)
print(f"  y-fold = {t_f - t_k:.2f} ms", flush=True)
