"""Routing via natural-layout dots: kill the hidden relayout in the splat kernel.

time_splat10/11: the routing dot costs ~2.9 ms and batching groups barely helps
(NB=4: -0.37 ms), so the cost is NOT dot-issue overhead.  Hypothesis: the dot
contracts the SUBLANE dim of planesk [4, G, C] (K = G rides sublanes; Mosaic's
MXU wants K on lhs lanes), so every group pays a hidden [G, C] relayout.

Variants (all 3ch sum-rule, margin 3, same pair/accumulate/placement stages):

  V0  production     per-group dot on [4, G, C] (= splat9 "C sumrule")
  V1  transpose+dot  per program: jnp.swapaxes each channel [wt, C] -> [C, wt]
                     once; per group: slice [C, G] (lanes) and dot E8n [G, 128]
                     with K on LANES — the natural MXU layout.  Lane map
                     unchanged (cell = l // rowpad) via E8n[t, l] = [l//16==t].
  V2  transpose+rep  same transpose; routing by a single whole-row dot
                     [4C, wt] x Q [wt, nsub*128] (one issue, K=216).

Usage: python protos/time_splat12.py [R]
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
# whole-row routing one-hot for V2
QF = np.zeros((wt, nsub * 128), np.float32)
for w in range(wt):
    l0 = (w // G) * 128 + (w % G) * rowpad
    QF[w, l0 : l0 + rowpad] = 1.0
QF = jnp.asarray(QF)


def pair_accum_place(lanes, gg, origin_y, radius, inv_w, base_v, ljc_v, iy_v,
                     p8_v, q_ref):
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
    x0 = gg * G * sx_px
    cur = q_ref[:, 0, :, x0 : x0 + 128]
    q_ref[:, 0, :, x0 : x0 + 128] = cur + strip


def make_kernel(variant):
    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref, qf_ref,
               px_ref, py_ref, r_ref, g_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        args = (origin_y, radius, inv_w, base_ref[...], ljc_ref[...],
                iy_ref[...], p8_ref[...])

        if variant == "V0":
            for gg in range(nsub):
                sl = slice(gg * G, (gg + 1) * G)
                pxg = px_ref[0, sl, :]
                any_live = jnp.max(jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

                @pl.when(any_live)
                def _(gg=gg, sl=sl, pxg=pxg):
                    planesk = jnp.stack(
                        [pxg, py_ref[0, sl, :], r_ref[0, sl, :],
                         g_ref[0, sl, :]])
                    lanes = jax.lax.dot_general(
                        planesk, e8_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    pair_accum_place(lanes, gg, *args, q_ref)
            return

        # V1 / V2: one transpose per channel per program
        tch = [jnp.swapaxes(ref[0, :, :], 0, 1)          # [C, wt]
               for ref in (px_ref, py_ref, r_ref, g_ref)]
        if variant == "V1":
            for gg in range(nsub):
                sl = slice(gg * G, (gg + 1) * G)
                pxt = tch[0][:, sl]                       # [C, G]
                any_live = jnp.max(jnp.where(pxt < 0.5 * _FAR, 1.0, 0.0)) > 0.5

                @pl.when(any_live)
                def _(gg=gg, sl=sl, pxt=pxt):
                    planesk = jnp.stack([pxt, tch[1][:, sl], tch[2][:, sl],
                                         tch[3][:, sl]])  # [4, C, G]
                    lanes = jax.lax.dot_general(
                        planesk, e8_ref[...], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    pair_accum_place(lanes, gg, *args, q_ref)
            return

        # V2: one whole-row routing dot
        planesk = jnp.stack(tch)                          # [4, C, wt]
        lanes_all = jax.lax.dot_general(
            planesk, qf_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)
        for gg in range(nsub):
            lanes = lanes_all[:, :, gg * 128 : (gg + 1) * 128]
            any_live = jnp.max(
                jnp.where(lanes[0] < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(gg=gg, lanes=lanes):
                pair_accum_place(lanes, gg, *args, q_ref)

    return kernel


const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((G, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
               pl.BlockSpec((128, 128), lambda rr: (0, 0)),
               pl.BlockSpec((wt, nsub * 128), lambda rr: (0, 0))]
in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))


def run(kernel, px, py, r, gc, radius_px):
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
    )(scal, E8, base, ljc, iy, P8, QF, *planes)


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
q0 = None
for v in ("V0", "V1", "V2"):
    k = make_kernel(v)
    try:
        qv = np.asarray(jax.jit(lambda a, b, c, d, e, k=k: run(k, a, b, c, d, e)
                                )(ppx0, ppy0, rcol, gcol, rpx))
    except Exception as e:  # noqa: BLE001
        print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    if q0 is None:
        q0 = qv
    else:
        print(f"exactness {v}: max |dq| = {np.abs(qv - q0).max():.2e}",
              flush=True)

print(f"--- R={R}, routing-layout sweep (3ch) ---", flush=True)
for v in ("V0", "V1", "V2"):
    k = make_kernel(v)

    def body(i, bb, k=k):
        ppx, ppy = jostle(i, bb)
        q = run(k, ppx, ppy, rcol, gcol, rpx)
        return jnp.sum(q[:, ::16, :, ::64])

    try:
        timed(v, body)
    except Exception as e:  # noqa: BLE001
        print(f"  {v}: FAILED {type(e).__name__}", flush=True)
