"""Stage-strip profile of the v2 sum-rule splat kernel at 1080p/1M.

time_splat9 landed the 3-channel sum rule (6.44 -> 5.91 ms kernel-only) and
rejected dynamic slot chunking (scratch round-trip eats the saving).  This
decomposes the remaining 5.9 ms: each variant strips one stage so successive
differences attribute the time.

  S4 route     routing dot only (planes -> lane segments), accs = lane sums
  S3 +pair     + alpha evaluation ([C, PH_PAD, 128] distance/smoothstep math)
  S2 +accum    + the per-channel broadcast-mul + C-deep reduction chains
  S1 +place0   + placement dot and q RMW at a FIXED x0 (placement cost without
               the per-group strip offsets)
  S0 full      the production 3ch kernel (exactly splat9's "C sumrule")

Usage: python protos/time_splat10.py [R]
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
HI = jax.lax.Precision.HIGHEST
NCH = 3


def make_stage(stage):
    ngroup = wt // G

    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        for gg in range(ngroup):
            sl = slice(gg * G, (gg + 1) * G)
            pxg = px_ref[0, sl, :]
            any_live = jnp.max(jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(gg=gg, sl=sl, pxg=pxg):
                planesk = jnp.stack([pxg, py_ref[0, sl, :], r_ref[0, sl, :],
                                     g_ref[0, sl, :]])
                lanes = jax.lax.dot_general(
                    planesk, e8_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                if stage == "S4":
                    acc0 = (lanes[0] + lanes[1] + lanes[2] + lanes[3])[:PH_PAD]
                    accs = jnp.stack([acc0, acc0, acc0])
                    q_ref[:, 0, :, 0:128] = q_ref[:, 0, :, 0:128] + accs
                    return
                qxl = lanes[0] - (base_ref[...] + jnp.float32(gg * G * sx_px))
                qyl = lanes[1] - origin_y
                dxl = ljc_ref[...] - qxl
                dx2 = dxl * dxl
                dy = iy_ref[...][None] - qyl[:, None, :]
                d = jnp.sqrt(dy * dy + dx2[:, None, :])
                tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                if stage == "S3":
                    a = jnp.sum(alpha, axis=0)
                    accs = jnp.stack([a, a, a])
                    q_ref[:, 0, :, 0:128] = q_ref[:, 0, :, 0:128] + accs
                    return
                accs = jnp.stack(
                    [jnp.sum(lanes[2][:, None, :] * alpha, axis=0),
                     jnp.sum(lanes[3][:, None, :] * alpha, axis=0),
                     jnp.sum(alpha, axis=0)])
                if stage == "S2":
                    q_ref[:, 0, :, 0:128] = q_ref[:, 0, :, 0:128] + accs
                    return
                strip = jax.lax.dot_general(
                    accs, p8_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                if stage == "S1":
                    x0 = 0
                else:
                    x0 = gg * G * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + 128]
                q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    return kernel


const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((G, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
               pl.BlockSpec((128, 128), lambda rr: (0, 0))]
in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))


def run_stage(kernel, px, py, r, gc, radius_px):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)

    def plane(a, fill):
        if wt == gw:
            return a
        padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
        return jnp.concatenate([a, padc], axis=1)

    planes = [plane(px, _FAR), plane(py, _FAR), plane(r, 0.0), plane(gc, 0.0)]
    return pl.pallas_call(
        kernel,
        grid=(gh,),
        in_specs=const_specs + [in_block] * 4,
        out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
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
print(f"--- R={R}, stage-strip profile of the 3ch kernel ---", flush=True)
ts = {}
for s in ("S4", "S3", "S2", "S1", "S0"):
    k = make_stage(s)

    def body(i, bb, k=k):
        ppx, ppy = jostle(i, bb)
        q = run_stage(k, ppx, ppy, rcol, gcol, rpx)
        return jnp.sum(q[:, ::16, :, ::64])

    ts[s] = timed(s, body)

print(f"  routing (S4)                : {ts['S4']:.2f}", flush=True)
print(f"  pair math (S3-S4)           : {ts['S3'] - ts['S4']:.2f}", flush=True)
print(f"  channel accumulate (S2-S3)  : {ts['S2'] - ts['S3']:.2f}", flush=True)
print(f"  placement dot+RMW (S1-S2)   : {ts['S1'] - ts['S2']:.2f}", flush=True)
print(f"  strip offsets (S0-S1)       : {ts['S0'] - ts['S1']:.2f}", flush=True)
