"""Bound the splat kernel's per-program infrastructure cost.

time_splat12 killed the routing-relayout theory (natural-layout dots: -0.16 ms).
So what IS the 2.9 ms that splat10's S4 (routing + RMW only) measures?  Bound it:

  E0  empty        kernel zeroes q and returns (no group loop at all)
  E1  gates only   + the per-group occupancy reduction and pl.when (empty body)
  V0  production   the 3ch kernel (reference)
  R2  2 rows/prog  production but grid=(gh/2,) with 2 cell rows per program
                   (halves program count; q blocks double in sublanes)

Usage: python protos/time_splat13.py [R]
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
from rust_particle_system_tpu.render.splat_planes import _FAR, _round_up
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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
rcol = jnp.where(live, 0.2, 0.0)
gcol = jnp.where(live, 0.5, 0.0)

gh, gw, C = ps.px.shape
x_min, x_max, y_min, y_max = BOUNDS
sx_scale = RS.width / (x_max - x_min)
sy_scale = RS.height / (y_max - y_min)
sx_px, sy_px = 9, 9
H, W = RS.height, RS.width
margin = MARGIN
ph, pw = sy_px + 2 * margin, sx_px + 2 * margin
rowpad = 16
G = 128 // rowpad
wt = _round_up(gw, G)
nsub = wt // G
PH_PAD = _round_up(ph, 8)
WP = _round_up((nsub - 1) * G * sx_px + 128, 128)
HI = jax.lax.Precision.HIGHEST
NCH = 3
GH2 = gh if gh % 2 == 0 else gh + 1  # pad rows for the 2-per-program variant

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


def group_body(lanes, gg, origin_y, radius, inv_w, base_v, ljc_v, iy_v, p8_v,
               write):
    qxl = lanes[0] - (base_v + jnp.float32(gg * G * sx_px))
    qyl = lanes[1] - origin_y
    dxl = ljc_v - qxl
    dx2 = dxl * dxl
    dy = iy_v[None] - qyl[:, None, :]
    d = jnp.sqrt(dy * dy + dx2[:, None, :])
    tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
    alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
    alpha = jnp.where(alpha < 0.01, 0.0, alpha)
    accs = jnp.stack([jnp.sum(lanes[2][:, None, :] * alpha, axis=0),
                      jnp.sum(lanes[3][:, None, :] * alpha, axis=0),
                      jnp.sum(alpha, axis=0)])
    strip = jax.lax.dot_general(
        accs, p8_v, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI)
    write(gg, strip)


def make_kernel(variant, rows):
    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        q_ref[...] = jnp.zeros((NCH, 1, rows * PH_PAD, WP), jnp.float32)
        if variant == "E0":
            return
        for rlocal in range(rows):
            rglob = pl.program_id(0) * rows + rlocal
            rr = jnp.float32(gh - 1) - jnp.float32(rglob)
            origin_y = H - (rr + 1.0) * sy_px - margin

            def write(gg, strip, rlocal=rlocal):
                x0 = gg * G * sx_px
                y0 = rlocal * PH_PAD
                cur = q_ref[:, 0, y0 : y0 + PH_PAD, x0 : x0 + 128]
                q_ref[:, 0, y0 : y0 + PH_PAD, x0 : x0 + 128] = cur + strip

            args = (origin_y, radius, inv_w, base_ref[...], ljc_ref[...],
                    iy_ref[...], p8_ref[...])
            for gg in range(nsub):
                sl = slice(gg * G, (gg + 1) * G)
                pxg = px_ref[rlocal, sl, :]
                any_live = jnp.max(jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5
                if variant == "E1":
                    @pl.when(any_live)
                    def _():
                        pass
                    continue

                @pl.when(any_live)
                def _(gg=gg, sl=sl, pxg=pxg, rlocal=rlocal, write=write,
                      args=args):
                    planesk = jnp.stack(
                        [pxg, py_ref[rlocal, sl, :], r_ref[rlocal, sl, :],
                         g_ref[rlocal, sl, :]])
                    lanes = jax.lax.dot_general(
                        planesk, e8_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    group_body(lanes, gg, *args, write)

    return kernel


const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((G, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
               pl.BlockSpec((128, 128), lambda rr: (0, 0))]


def run(kernel, rows, px, py, r, gc, radius_px):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)
    ghp = GH2 if rows == 2 else gh

    def plane(a, fill):
        out = a
        if wt != gw:
            padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
            out = jnp.concatenate([out, padc], axis=1)
        if ghp != gh:
            padr = jnp.full((ghp - gh, wt, C), fill, jnp.float32)
            out = jnp.concatenate([out, padr], axis=0)
        # reverse rows so program p covers consecutive descending rows
        return out[::-1]

    planes = [plane(px, _FAR), plane(py, _FAR), plane(r, 0.0), plane(gc, 0.0)]
    in_block = pl.BlockSpec((rows, wt, C), lambda rp: (rp, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(ghp // rows,),
        in_specs=const_specs + [in_block] * 4,
        out_specs=pl.BlockSpec((NCH, 1, rows * PH_PAD, WP),
                               lambda rp: (0, rp, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NCH, ghp // rows, rows * PH_PAD, WP),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(scal, E8, base, ljc, iy, P8, *planes)


def jostle(i, bb):
    eps = 0.003 * jnp.float32(i) + bb
    px = jnp.where(live, ps.px + eps, _FAR)
    py = jnp.where(live, ps.py + eps, _FAR)
    ppx = jnp.where(live, (px - x_min) * sx_scale, _FAR)
    ppy = jnp.where(live, (y_max - py) * sy_scale, _FAR)
    return ppx, ppy


def timed(label, body):
    loop = jax.jit(lambda bb: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i, bb), jnp.float32(0)))
    hsync_one(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync_one(loop(jnp.float32(0.0101)))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:28s}: {per:7.2f} ms", flush=True)
    return per


rpx = params.particle_size * sx_scale
ppx0, ppy0 = jostle(0, jnp.float32(0.0))

# exactness: R2 strips (reversed-row blocks) vs V0 strips (reversed q rows)
kv0 = make_kernel("V0", 1)
kr2 = make_kernel("R2", 2)
qv0 = np.asarray(jax.jit(
    lambda a, b, c, d, e: run(kv0, 1, a, b, c, d, e))(ppx0, ppy0, rcol, gcol,
                                                      rpx))
qr2 = np.asarray(jax.jit(
    lambda a, b, c, d, e: run(kr2, 2, a, b, c, d, e))(ppx0, ppy0, rcol, gcol,
                                                      rpx))
qr2 = qr2.reshape(NCH, GH2, PH_PAD, WP)[:, :gh]
# V0 runs row index rr = gh-1-p (top row last); R2 feeds reversed planes so
# program p block r covers grid row gh-1-(2p+r): same strips, reversed order.
err = np.abs(qr2 - qv0[:, ::-1]).max()
print(f"exactness R2 vs V0: max |dq| = {err:.2e}", flush=True)

print(f"--- R={R}, per-program-cost bound ---", flush=True)
for label, (v, rows) in {"E0 empty": ("E0", 1), "E1 gates": ("E1", 1),
                         "V0 production": ("V0", 1),
                         "R2 2rows/prog": ("R2", 2)}.items():
    k = make_kernel(v, rows)

    def body(i, bb, k=k, rows=rows):
        ppx, ppy = jostle(i, bb)
        q = run(k, rows, ppx, ppy, rcol, gcol, rpx)
        return jnp.sum(q[:, ::16, :, ::64])

    try:
        timed(label, body)
    except Exception as e:  # noqa: BLE001
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)
