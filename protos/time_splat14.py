"""Kill-the-routing-dot probes: move routing out of the splat kernel entirely.

splat10-13 pinned the v2 kernel's stage strip at routing 2.9 / pair 1.65 /
accumulate 0.70 / placement 0.67 (+0.87 per-program infra) and showed the 2.9 is
NOT dot-issue overhead (NB batching -0.37) and NOT the lhs relayout alone
(in-kernel transpose + natural-K dot: -0.16).  Two formulations were never
tried because they change the kernel's INPUT layout:

  V0  production    per-group one-hot dot on [4, G, C] blocks (3ch sum-rule)
  V3  XLA pre-route XLA builds routed lanes [gh, 4, C, wt*16] (transpose +
                    16x lane repeat, ~470 MB HBM round-trip at 1M) — the kernel
                    starts at the pair stage.  Bounds the concept: if V3's
                    kernel+XLA total beats V0, routing should leave the kernel.
  V2  roll spread   XLA pre-transposes planes to [gh, 4, C, wt] (cells on
                    lanes); the kernel extracts each 8-cell group with one lane
                    roll and spreads it 16x by 4 roll+select doubling steps —
                    no MXU, no relayout.  Lane map is INTERLEAVED (cell = l%8,
                    j = l//8) so the doubling recurrence S[l] = S[l mod 8]
                    lands each cell's slots on its own lane comb; base/ljc/P8
                    constants absorb the permutation (placement output is
                    identical).

Usage: python protos/time_splat14.py [R]
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

wt = _round_up(gw, G)
ngroup = wt // G
WP = _round_up((ngroup - 1) * G * sx_px + 128, 128)
NL = wt * rowpad  # routed lane count (multiple of 128)


def pad_plane(a, fill):
    if wt == gw:
        return a
    padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
    return jnp.concatenate([a, padc], axis=1)


def scal_of(radius_px):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    return jnp.stack([radius_px, inv_w]).astype(jnp.float32)


# ---------------------------------------------------------------- V0 production
def make_v0():
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
    kernel = _make_strip_kernel_v2(gh, wt, C, G, rowpad, sx_px, sy_px, margin,
                                   H, WP, PH_PAD, pw, nch=NCH)
    consts = (E8, base, ljc, iy, jnp.asarray(P8))
    const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec((G, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((128, 128), lambda rr: (0, 0))]
    in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))

    def run(px, py, r, gc, radius_px):
        planes = [pad_plane(px, _FAR), pad_plane(py, _FAR), pad_plane(r, 0.0),
                  pad_plane(gc, 0.0), pad_plane(gc, 0.0)]  # b unused at nch=3
        return pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=const_specs + [in_block] * 5,
            out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP),
                                   lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal_of(radius_px), *consts, *planes)

    return run


# ------------------------------------------------------------- V3 XLA pre-route
def make_v3():
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

    def kernel(scal_ref, base_ref, ljc_ref, iy_ref, p8_ref, rt_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        for g in range(ngroup):
            lanes4 = rt_ref[0, :, :, g * 128 : (g + 1) * 128]  # [4, C, 128]
            any_live = jnp.max(
                jnp.where(lanes4[0] < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(g=g, lanes4=lanes4):
                qxl = lanes4[0] - (base_ref[...] + jnp.float32(g * G * sx_px))
                qyl = lanes4[1] - origin_y
                dxl = ljc_ref[...] - qxl
                dx2 = dxl * dxl
                dy = iy_ref[...][None] - qyl[:, None, :]
                d = jnp.sqrt(dy * dy + dx2[:, None, :])
                tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                accs = jnp.stack(
                    [jnp.sum(lanes4[2][:, None, :] * alpha, axis=0),
                     jnp.sum(lanes4[3][:, None, :] * alpha, axis=0),
                     jnp.sum(alpha, axis=0)])
                strip = jax.lax.dot_general(
                    accs, p8_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                x0 = g * G * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + 128]
                q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((128, 128), lambda rr: (0, 0))]
    in_block = pl.BlockSpec((1, 4, C, NL), lambda rr: (gh - 1 - rr, 0, 0, 0))

    def route(px, py, r, gc):
        pt = jnp.stack([pad_plane(px, _FAR), pad_plane(py, _FAR),
                        pad_plane(r, 0.0), pad_plane(gc, 0.0)], axis=1)
        pt = jnp.swapaxes(pt, 2, 3)                     # [gh, 4, C, wt]
        return jnp.repeat(pt, rowpad, axis=3)           # [gh, 4, C, NL]

    def run(px, py, r, gc, radius_px):
        routed = route(px, py, r, gc)
        return pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=const_specs + [in_block],
            out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP),
                                   lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal_of(radius_px), base, ljc, iy, P8, routed)

    return run, route


# ------------------------------------------------- V2 pre-transpose + roll spread
def make_v2(spread_sign=+1):
    # Interleaved lane map: lane l <-> (cell = l % G_per... cell = l % 8 within
    # the group, j = l // 8).  pw = 15 <= 16 lanes of j.
    lidx = np.arange(128)
    cellI, ljI = lidx % 8, lidx // 8
    base = jnp.asarray((cellI * sx_px - margin)[None, :], jnp.float32)
    ljc = jnp.asarray(np.where(ljI < pw, ljI + 0.5, -_FAR)[None, :],
                      jnp.float32)
    iy = jnp.asarray(np.broadcast_to(
        (np.arange(PH_PAD) + 0.5)[:, None], (PH_PAD, 128)), jnp.float32)
    P8 = np.zeros((128, 128), np.float32)
    for l in range(128):
        if ljI[l] < pw:
            P8[l, cellI[l] * sx_px + ljI[l]] = 1.0
    P8 = jnp.asarray(P8)
    wtp = _round_up(wt, 128)
    nslab = wtp // 128

    def kernel(scal_ref, base_ref, ljc_ref, iy_ref, p8_ref, rt_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        for k in range(nslab):
            T = rt_ref[0, :, :, k * 128 : (k + 1) * 128]      # [4, C, 128]
            for gs in range(16):
                g = k * 16 + gs
                if g >= ngroup:
                    continue
                A = (T if gs == 0 else
                     pltpu.roll(T, shift=(spread_sign * (-8 * gs)) % 128,
                                axis=2))
                live8 = jnp.where(
                    (A[0] < 0.5 * _FAR) & (lane[0] < 8), 1.0, 0.0)
                any_live = jnp.max(live8) > 0.5

                @pl.when(any_live)
                def _(g=g, A=A):
                    S = A
                    for b in (8, 16, 32, 64):
                        S = jnp.where((lane & b) == 0, S,
                                      pltpu.roll(S,
                                                 shift=(spread_sign * b) % 128,
                                                 axis=2))
                    qxl = S[0] - (base_ref[...]
                                  + jnp.float32(g * G * sx_px))
                    qyl = S[1] - origin_y
                    dxl = ljc_ref[...] - qxl
                    dx2 = dxl * dxl
                    dy = iy_ref[...][None] - qyl[:, None, :]
                    d = jnp.sqrt(dy * dy + dx2[:, None, :])
                    tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                    alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                    alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                    accs = jnp.stack(
                        [jnp.sum(S[2][:, None, :] * alpha, axis=0),
                         jnp.sum(S[3][:, None, :] * alpha, axis=0),
                         jnp.sum(alpha, axis=0)])
                    strip = jax.lax.dot_general(
                        accs, p8_ref[...], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    x0 = g * G * sx_px
                    cur = q_ref[:, 0, :, x0 : x0 + 128]
                    q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
                   pl.BlockSpec((128, 128), lambda rr: (0, 0))]
    in_block = pl.BlockSpec((1, 4, C, wtp), lambda rr: (gh - 1 - rr, 0, 0, 0))

    def pre(px, py, r, gc):
        pt = jnp.stack([pad_plane(px, _FAR), pad_plane(py, _FAR),
                        pad_plane(r, 0.0), pad_plane(gc, 0.0)], axis=1)
        pt = jnp.swapaxes(pt, 2, 3)                     # [gh, 4, C, wt]
        if wtp != wt:
            fills = jnp.stack(
                [jnp.full((gh, C, wtp - wt), _FAR, jnp.float32),
                 jnp.full((gh, C, wtp - wt), _FAR, jnp.float32),
                 jnp.zeros((gh, C, wtp - wt), jnp.float32),
                 jnp.zeros((gh, C, wtp - wt), jnp.float32)], axis=1)
            pt = jnp.concatenate([pt, fills], axis=3)
        return pt

    def run(px, py, r, gc, radius_px):
        pt = pre(px, py, r, gc)
        return pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=const_specs + [in_block],
            out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP),
                                   lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal_of(radius_px), base, ljc, iy, P8, pt)

    return run, pre


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
run3, route3 = make_v3()
q0 = np.asarray(jax.jit(run0)(ppx0, ppy0, rcol, gcol, rpx))
q3 = np.asarray(jax.jit(run3)(ppx0, ppy0, rcol, gcol, rpx))
print(f"exactness V3 vs V0: max |dq| = {np.abs(q3 - q0).max():.2e}",
      flush=True)

q2 = None
for sign in (+1, -1):
    run2, pre2 = make_v2(sign)
    q2 = np.asarray(jax.jit(run2)(ppx0, ppy0, rcol, gcol, rpx))
    err = np.abs(q2 - q0).max()
    print(f"exactness V2(sign={sign:+d}) vs V0: max |dq| = {err:.2e}",
          flush=True)
    if err < 1e-4:
        break

print(f"--- R={R} ---", flush=True)


def body_of(run):
    def body(i, bb):
        ppx, ppy = jostle(i, bb)
        q = run(ppx, ppy, rcol, gcol, rpx)
        return jnp.sum(q[:, ::16, :, ::64])
    return body


timed("V0 production (kernel)", body_of(run0))
timed("V3 route+kernel", body_of(run3))


def body_route_only(i, bb):
    ppx, ppy = jostle(i, bb)
    rt = route3(ppx, ppy, rcol, gcol)
    return jnp.sum(rt[:, :, ::16, ::256])


timed("V3 XLA route alone", body_route_only)
timed("V2 pre-transpose+rolls", body_of(run2 if q2 is not None else run0))


def body_pre_only(i, bb):
    ppx, ppy = jostle(i, bb)
    pt = pre2(ppx, ppy, rcol, gcol)
    return jnp.sum(pt[:, :, ::16, ::64])


timed("V2 XLA transpose alone", body_pre_only)
