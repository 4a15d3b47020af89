"""v2 splat kernel op-diet variants at 1080p/1M (toward the <=5 ms target).

Baseline (time_splat8): kernel 5.97 ms + y-fold 0.73 at margin 3.  Three
candidate reductions, each measured kernel-only against the baseline kernel and
checked for exactness:

  B  op-fold     tt = clamp(d*inv_w - c2) with c2 = 0.8*radius*inv_w hoisted
                 (saves the per-lane subtract if Mosaic wasn't already fusing).
  C  sum-rule    energy_color's ramp satisfies r + g + b = 1 exactly (both
                 segments), so the blue channel reconstructs as a - r - g in
                 the fold: accumulate only 3 channels (drops one broadcast-mul
                 and one C-reduction chain, and shrinks q/placement by 1/4).
  D  dyn-chunk   slots walk in chunks of 8 under a DYNAMIC fori trip count
                 bounded by the group's highest live slot index — dead slot
                 tails (C=64 vs ~39 live at uniform 1M) cost nothing.
                 Exact: excluded slots are sentinel-parked (alpha == 0).

Usage: python protos/time_splat9.py [R]
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
rcol = jnp.where(live, 0.2, 0.0)
gcol = jnp.where(live, 0.5, 0.0)
bcol = jnp.where(live, 0.3, 0.0)  # r+g+b = 1 so the sum rule applies

# --- geometry/consts (replicates splat_from_planes v2) -----------------------
g_ = spec
gh, gw, C = ps.px.shape
x_min, x_max, y_min, y_max = BOUNDS
sx_scale = RS.width / (x_max - x_min)
sy_scale = RS.height / (y_max - y_min)
sx_px = int(round(g_.cell_width * sx_scale))
sy_px = int(round(g_.cell_size * sy_scale))
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

HI = jax.lax.Precision.HIGHEST


def make_variant(nch, opfold, dyn_chunk):
    """nch: 4 (rgba) or 3 (r, g, a; b = a-r-g downstream).  opfold: hoist the
    0.8r subtract into the scalar (NOT parity-safe: one-ULP tt changes flip the
    alpha<0.01 discard at isolated pixels — timing information only).
    dyn_chunk: 0 = whole-C tensors, else chunk size for the dynamic-trip slot
    loop (lanes staged through a VMEM scratch ref; Mosaic has no value-level
    dynamic_slice, but pl.ds ref loads with dynamic sublane starts work)."""
    ngroup = wt // G

    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref, *scr):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        c2 = scal_ref[2]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((nch, 1, PH_PAD, WP), jnp.float32)
        for gg in range(ngroup):
            sl = slice(gg * G, (gg + 1) * G)
            pxg = px_ref[0, sl, :]
            liveg = pxg < 0.5 * _FAR
            any_live = jnp.max(jnp.where(liveg, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(gg=gg, sl=sl, pxg=pxg, liveg=liveg):
                chans = [pxg, py_ref[0, sl, :], r_ref[0, sl, :],
                         g_ref[0, sl, :]]
                if nch == 4:
                    chans.append(b_ref[0, sl, :])
                planesk = jnp.stack(chans)                       # [nch+1,G,C]
                lanes = jax.lax.dot_general(
                    planesk, e8_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                qxl = lanes[0] - (base_ref[...] + jnp.float32(gg * G * sx_px))
                qyl = lanes[1] - origin_y                        # [C, 128]
                dxl = ljc_ref[...] - qxl
                dx2 = dxl * dxl

                def alphas(qy_c, dx2_c):
                    dy = iy_ref[...][None] - qy_c[:, None, :]
                    d = jnp.sqrt(dy * dy + dx2_c[:, None, :])
                    if opfold:
                        tt = jnp.clip(d * inv_w - c2, 0.0, 1.0)
                    else:
                        tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                    alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                    return jnp.where(alpha < 0.01, 0.0, alpha)

                if dyn_chunk:
                    CH = dyn_chunk
                    scr_ref = scr[0]
                    staged = [qyl, dx2] + [lanes[ch]
                                           for ch in range(2, nch + 1)]
                    scr_ref[...] = jnp.stack(staged)   # [nch+1, C, 128]
                    idxc = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
                    cnt = jnp.max(jnp.where(liveg, idxc, -1)) + 1
                    trips = (cnt + CH - 1) // CH

                    def chunk(k, acc):
                        lc = scr_ref[:, pl.ds(k * CH, CH), :]
                        al = alphas(lc[0], lc[1])
                        parts = [jnp.sum(lc[2 + i][:, None, :] * al, axis=0)
                                 for i in range(nch - 1)]
                        parts.append(jnp.sum(al, axis=0))
                        return acc + jnp.stack(parts)

                    accs = jax.lax.fori_loop(
                        0, trips, chunk,
                        jnp.zeros((nch, PH_PAD, 128), jnp.float32))
                else:
                    al = alphas(qyl, dx2)
                    parts = [jnp.sum(lanes[ch][:, None, :] * al, axis=0)
                             for ch in range(2, nch + 1)]
                    parts.append(jnp.sum(al, axis=0))
                    accs = jnp.stack(parts)                      # [nch,PH,128]

                strip = jax.lax.dot_general(
                    accs, p8_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
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


def run_kernel(kernel, nch, px, py, r, gc, b, radius_px, dyn_chunk=0):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([radius_px, inv_w,
                      0.8 * radius_px * inv_w]).astype(jnp.float32)

    def plane(a, fill):
        if wt == gw:
            return a
        padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
        return jnp.concatenate([a, padc], axis=1)

    planes = [plane(px, _FAR), plane(py, _FAR), plane(r, 0.0),
              plane(gc, 0.0), plane(b, 0.0)]
    scratch = ([pltpu.VMEM((nch + 1, C, 128), jnp.float32)]
               if dyn_chunk else [])
    return pl.pallas_call(
        kernel,
        grid=(gh,),
        in_specs=const_specs + [in_block] * 5,
        out_specs=pl.BlockSpec((nch, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, gh, PH_PAD, WP), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(scal, E8, base, ljc, iy, P8, *planes)


kern_base = _make_strip_kernel_v2(gh, wt, C, G, rowpad, sx_px, sy_px,
                                  margin, H, WP, PH_PAD, pw)


def run_base(px, py, r, gc, b, radius_px):
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
        kern_base,
        grid=(gh,),
        in_specs=const_specs[:1] + const_specs[1:] + [in_block] * 5,
        out_specs=pl.BlockSpec((4, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((4, gh, PH_PAD, WP), jnp.float32),
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
    print(f"  {label:32s}: {per:7.2f} ms", flush=True)
    return per


# --- exactness vs baseline ---------------------------------------------------
ppx0, ppy0 = jostle(0, jnp.float32(0.0))
rpx = params.particle_size * sx_scale
q0 = np.asarray(run_base(ppx0, ppy0, rcol, gcol, bcol, rpx))
for label, (nch, opf, dc) in {
    "C sumrule": (3, False, 0),
    "D dyn8": (4, False, 8),
    "CD sumrule+dyn8": (3, False, 8),
}.items():
    k = make_variant(nch, opf, dc)
    qv = np.asarray(jax.jit(
        lambda a, b_, c, d, e, f, k=k, nch=nch, dc=dc: run_kernel(
            k, nch, a, b_, c, d, e, f, dyn_chunk=dc)
    )(ppx0, ppy0, rcol, gcol, bcol, rpx))
    if nch == 4:
        err = np.abs(qv - q0).max()
    else:
        rec_b = qv[2] - qv[0] - qv[1]
        err = max(np.abs(qv[0] - q0[0]).max(), np.abs(qv[1] - q0[1]).max(),
                  np.abs(rec_b - q0[2]).max(), np.abs(qv[2] - q0[3]).max())
    print(f"exactness {label:20s}: max |dq| = {err:.2e}", flush=True)

# --- timings ------------------------------------------------------------------
print(f"--- R={R}, 1M @ 1080p, margin={margin} ---", flush=True)


def body_base(i, bb):
    ppx, ppy = jostle(i, bb)
    q = run_base(ppx, ppy, rcol, gcol, bcol, rpx)
    return jnp.sum(q[:, ::16, :, ::64])


timed("baseline v2 (4ch)", body_base)

for label, (nch, opf, dc) in {
    "B opfold (4ch, info only)": (4, True, 0),
    "C sumrule (3ch)": (3, False, 0),
    "D dyn8 (4ch)": (4, False, 8),
    "D dyn16 (4ch)": (4, False, 16),
    "CD sumrule+dyn8 (3ch)": (3, False, 8),
}.items():
    k = make_variant(nch, opf, dc)

    def body(i, bb, k=k, nch=nch, dc=dc):
        ppx, ppy = jostle(i, bb)
        q = run_kernel(k, nch, ppx, ppy, rcol, gcol, bcol, rpx, dyn_chunk=dc)
        return jnp.sum(q[:, ::16, :, ::64])

    timed(label, body)
