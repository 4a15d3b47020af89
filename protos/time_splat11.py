"""Routing-batch variant of the v2 sum-rule splat kernel.

time_splat10's stage strip: routing dot 2.9 ms, pair math 1.65, channel
accumulate 0.70, placement 0.67 of the 5.93 ms kernel.  The routing dot is
3,267 tiny K=8 MXU dots per frame (one per 8-cell group per row program) —
its real MXU passes are ~0.9 ms, so ~2/3 is per-dot issue overhead.

This variant routes NB groups per dot: planesk [4, NB*8, C] x Q [NB*8, NB*128]
(block one-hot) -> [4, C, NB*128]; pair math / accumulate / placement then run
per 128-lane sub-slice exactly as production (each sub-group keeps its own
occupancy gate).  Same MXU pass count, NB-fold fewer dot issues.

Usage: python protos/time_splat11.py [R]
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
)
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
bcol = jnp.where(live, 0.3, 0.0)

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
PH_PAD = _round_up(ph, 8)
HI = jax.lax.Precision.HIGHEST
NCH = 3


def make_batched(NB):
    wt = _round_up(gw, NB * G)
    nsub = wt // G
    nblk = nsub // NB
    WP = _round_up((nsub - 1) * G * sx_px + 128, 128)

    lidx = np.arange(128)
    lt, lj = lidx // rowpad, lidx % rowpad
    base = jnp.asarray((lt * sx_px - margin)[None, :], jnp.float32)
    ljc = jnp.asarray(np.where(lj < pw, lj + 0.5, -_FAR)[None, :], jnp.float32)
    iy = jnp.asarray(np.broadcast_to(
        (np.arange(PH_PAD) + 0.5)[:, None], (PH_PAD, 128)), jnp.float32)
    P8 = np.zeros((128, 128), np.float32)
    for l in range(128):
        if l % rowpad < pw:
            P8[l, (l // rowpad) * sx_px + l % rowpad] = 1.0
    P8 = jnp.asarray(P8)
    # Block one-hot: cell t of the block owns lanes [ (t//G)*128 + (t%G)*rowpad,
    # +rowpad )
    QB = np.zeros((NB * G, NB * 128), np.float32)
    for t in range(NB * G):
        l0 = (t // G) * 128 + (t % G) * rowpad
        QB[t, l0 : l0 + rowpad] = 1.0
    QB = jnp.asarray(QB)

    def kernel(scal_ref, qb_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        for blk in range(nblk):
            slb = slice(blk * NB * G, (blk + 1) * NB * G)
            pxb = px_ref[0, slb, :]                             # [NB*G, C]
            blk_live = jnp.max(jnp.where(pxb < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(blk_live)
            def _(blk=blk, slb=slb, pxb=pxb):
                planesk = jnp.stack([pxb, py_ref[0, slb, :], r_ref[0, slb, :],
                                     g_ref[0, slb, :]])         # [4, NB*G, C]
                lanesb = jax.lax.dot_general(
                    planesk, qb_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                for s in range(NB):
                    gg = blk * NB + s
                    lanes = lanesb[:, :, s * 128 : (s + 1) * 128]
                    pxg = px_ref[0, gg * G : (gg + 1) * G, :]
                    g_live = jnp.max(
                        jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

                    @pl.when(g_live)
                    def _(gg=gg, lanes=lanes):
                        qxl = lanes[0] - (base_ref[...]
                                          + jnp.float32(gg * G * sx_px))
                        qyl = lanes[1] - origin_y
                        dxl = ljc_ref[...] - qxl
                        dx2 = dxl * dxl
                        dy = iy_ref[...][None] - qyl[:, None, :]
                        d = jnp.sqrt(dy * dy + dx2[:, None, :])
                        tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                        alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                        alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                        accs = jnp.stack(
                            [jnp.sum(lanes[2][:, None, :] * alpha, axis=0),
                             jnp.sum(lanes[3][:, None, :] * alpha, axis=0),
                             jnp.sum(alpha, axis=0)])
                        strip = jax.lax.dot_general(
                            accs, p8_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=HI)
                        x0 = gg * G * sx_px
                        cur = q_ref[:, 0, :, x0 : x0 + 128]
                        q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec((NB * G, NB * 128), lambda rr: (0, 0)),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((128, 128), lambda rr: (0, 0))]
    in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))

    def run(px, py, r, gc, radius_px):
        inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
        scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)

        def plane(a, fill):
            if wt == gw:
                return a
            padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
            return jnp.concatenate([a, padc], axis=1)

        planes = [plane(px, _FAR), plane(py, _FAR), plane(r, 0.0),
                  plane(gc, 0.0)]
        return pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=const_specs + [in_block] * 4,
            out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP),
                                   lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal, QB, base, ljc, iy, P8, *planes)

    return run, WP


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

# exactness vs NB=1 (the production shape)
run1, WP1 = make_batched(1)
q1 = np.asarray(jax.jit(run1)(ppx0, ppy0, rcol, gcol, rpx))
for NB in (2, 4, 8):
    runb, WPb = make_batched(NB)
    qb = np.asarray(jax.jit(runb)(ppx0, ppy0, rcol, gcol, rpx))
    err = np.abs(qb[:, :, :, :WP1] - q1[:, :, :, :WPb]).max() \
        if WPb >= WP1 else np.abs(qb - q1[:, :, :, :WPb]).max()
    print(f"exactness NB={NB}: max |dq| = {err:.2e}", flush=True)

print(f"--- R={R}, routing-batch sweep (3ch kernel) ---", flush=True)
for NB in (1, 2, 4, 8):
    runb, _ = make_batched(NB)

    def body(i, bb, runb=runb):
        ppx, ppy = jostle(i, bb)
        q = runb(ppx, ppy, rcol, gcol, rpx)
        return jnp.sum(q[:, ::16, :, ::64])

    timed(f"NB={NB}", body)
