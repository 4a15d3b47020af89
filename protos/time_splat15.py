"""Round-4 splat probes: per-program infra and slot-tail gating.

splat10 pinned the v2 kernel's stage strip at routing 2.9 / pair 1.65 /
acc 0.70 / placement 0.67 / infra 0.87 ms (1M/1080p, gh=120 programs), and
splat14 showed routing resists leaving the kernel (XLA pre-route 7.8 total,
roll-spread ties at 6.09).  Two levers remain untried:

  V4  TWO grid rows per program — halves the program count, so the ~0.87 ms
      per-program infrastructure (q zero-init, prologue/epilogue) should halve.
  V5  SLOT-TAIL GATING — cells are front-loaded (protos/time_forces3.py: live
      probability ~0.07 at slot 48, ~0 at 56), so the [48:64] slot rows of the
      routing dot + pair math + channel reduce skip when all 8 cells of the
      group are short.  Needs a VMEM scratch accumulator per group (placement
      runs once after the chunks).
  V6  both.

Exactness is asserted vs the production v2 kernel (V0).

Usage: python protos/time_splat15.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
CH_SPLIT = 48  # slot-tail gate boundary (3/4 of C)

wt = _round_up(gw, G)
ngroup = wt // G
WP = _round_up((ngroup - 1) * G * sx_px + 128, 128)


def pad_plane(a, fill):
    if wt == gw:
        return a
    padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
    return jnp.concatenate([a, padc], axis=1)


def scal_of(radius_px):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    return jnp.stack([radius_px, inv_w]).astype(jnp.float32)


def consts_v2():
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
    return E8, base, ljc, iy, jnp.asarray(P8)


CONSTS = consts_v2()
CONST_SPECS = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((G, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
               pl.BlockSpec((128, 128), lambda rr: (0, 0))]


# ---------------------------------------------------------------- V0 production
def make_v0():
    kernel = _make_strip_kernel_v2(gh, wt, C, G, rowpad, sx_px, sy_px, margin,
                                   H, WP, PH_PAD, pw, nch=NCH)
    in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))

    def run(px, py, r, gc, radius_px):
        planes = [pad_plane(px, _FAR), pad_plane(py, _FAR), pad_plane(r, 0.0),
                  pad_plane(gc, 0.0), pad_plane(gc, 0.0)]
        return pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=CONST_SPECS + [in_block] * 5,
            out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP),
                                   lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal_of(radius_px), *CONSTS, *planes)

    return run


# ----------------------------------------------------- V4 two rows per program
def make_v4():
    gh2 = gh // 2

    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        b2 = pl.program_id(0)
        q_ref[...] = jnp.zeros((NCH, 2, PH_PAD, WP), jnp.float32)
        for sub in range(2):
            # input row `sub` of this block = grid row 2*b_in + sub where
            # b_in = gh2 - 1 - b2; its strip lands at q slot 1 - sub.
            gr = jnp.float32(2 * (gh2 - 1 - b2) + sub)
            origin_y = H - (gr + 1.0) * sy_px - margin
            qslot = 1 - sub
            for g in range(ngroup):
                sl = slice(g * G, (g + 1) * G)
                pxg = px_ref[sub, sl, :]
                any_live = jnp.max(
                    jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

                @pl.when(any_live)
                def _(g=g, sl=sl, pxg=pxg, sub=sub, qslot=qslot,
                      origin_y=origin_y):
                    chans = [pxg, py_ref[sub, sl, :], r_ref[sub, sl, :],
                             g_ref[sub, sl, :]]
                    planes5 = jnp.stack(chans)
                    lanes5 = jax.lax.dot_general(
                        planes5, e8_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    qxl = lanes5[0] - (base_ref[...]
                                       + jnp.float32(g * G * sx_px))
                    qyl = lanes5[1] - origin_y
                    dxl = ljc_ref[...] - qxl
                    dx2 = dxl * dxl
                    dy = iy_ref[...][None] - qyl[:, None, :]
                    d = jnp.sqrt(dy * dy + dx2[:, None, :])
                    tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                    alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                    alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                    parts = [jnp.sum(lanes5[k][:, None, :] * alpha, axis=0)
                             for k in (2, 3)]
                    parts.append(jnp.sum(alpha, axis=0))
                    accs = jnp.stack(parts)
                    strip = jax.lax.dot_general(
                        accs, p8_ref[...], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    x0 = g * G * sx_px
                    cur = q_ref[:, qslot, :, x0 : x0 + 128]
                    q_ref[:, qslot, :, x0 : x0 + 128] = cur + strip

    in_block = pl.BlockSpec((2, wt, C), lambda b2: (gh // 2 - 1 - b2, 0, 0))

    def run(px, py, r, gc, radius_px):
        planes = [pad_plane(px, _FAR), pad_plane(py, _FAR), pad_plane(r, 0.0),
                  pad_plane(gc, 0.0), pad_plane(gc, 0.0)]
        return pl.pallas_call(
            kernel,
            grid=(gh2,),
            in_specs=CONST_SPECS + [in_block] * 5,
            out_specs=pl.BlockSpec((NCH, 2, PH_PAD, WP),
                                   lambda b2: (0, b2, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal_of(radius_px), *CONSTS, *planes)

    return run


# ------------------------------------------------------- V5 slot-tail gating
def make_v5():
    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref, scr):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        for g in range(ngroup):
            sl = slice(g * G, (g + 1) * G)
            pxg = px_ref[0, sl, :]
            any_live = jnp.max(jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(g=g, sl=sl, pxg=pxg):
                scr[...] = jnp.zeros((NCH, PH_PAD, 128), jnp.float32)
                for (c0, c1) in ((0, CH_SPLIT), (CH_SPLIT, C)):
                    csl = slice(c0, c1)
                    tail_live = jnp.max(jnp.where(
                        pxg[:, csl] < 0.5 * _FAR, 1.0, 0.0)) > 0.5

                    @pl.when(tail_live)
                    def _(csl=csl):
                        chans = [pxg[:, csl], py_ref[0, sl, csl],
                                 r_ref[0, sl, csl], g_ref[0, sl, csl]]
                        planes5 = jnp.stack(chans)      # [4, G, chw]
                        lanes5 = jax.lax.dot_general(
                            planes5, e8_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=HI)
                        qxl = lanes5[0] - (base_ref[...]
                                           + jnp.float32(g * G * sx_px))
                        qyl = lanes5[1] - origin_y
                        dxl = ljc_ref[...] - qxl
                        dx2 = dxl * dxl
                        dy = iy_ref[...][None] - qyl[:, None, :]
                        d = jnp.sqrt(dy * dy + dx2[:, None, :])
                        tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                        alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                        alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                        parts = [jnp.sum(lanes5[k][:, None, :] * alpha, axis=0)
                                 for k in (2, 3)]
                        parts.append(jnp.sum(alpha, axis=0))
                        scr[...] = scr[...] + jnp.stack(parts)

                strip = jax.lax.dot_general(
                    scr[...], p8_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                x0 = g * G * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + 128]
                q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))

    def run(px, py, r, gc, radius_px):
        planes = [pad_plane(px, _FAR), pad_plane(py, _FAR), pad_plane(r, 0.0),
                  pad_plane(gc, 0.0), pad_plane(gc, 0.0)]
        return pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=CONST_SPECS + [in_block] * 5,
            out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP),
                                   lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NCH, PH_PAD, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal_of(radius_px), *CONSTS, *planes)

    return run


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

run0 = make_v0()
q0 = np.asarray(jax.jit(run0)(ppx0, ppy0, rcol, gcol, rpx))
for name, mk in (("V4", make_v4), ("V5", make_v5)):
    runx = mk()
    qx = np.asarray(jax.jit(runx)(ppx0, ppy0, rcol, gcol, rpx))
    err = np.abs(qx - q0).max()
    print(f"exactness {name} vs V0: max |dq| = {err:.2e}", flush=True)

print(f"--- R={R} ---", flush=True)


def body_of(run):
    def body(i, bb):
        ppx, ppy = jostle(i, bb)
        q = run(ppx, ppy, rcol, gcol, rpx)
        return jnp.sum(q[:, ::16, :, ::64])
    return body


timed("V0 production", body_of(run0))
timed("V4 two-rows-per-program", body_of(make_v4()))
timed("V5 slot-tail gating", body_of(make_v5()))
