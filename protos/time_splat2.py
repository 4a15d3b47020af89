"""Splat redesign proto: VPU d2 + in-kernel quadrant-strip assembly.

time_splat.py measured the production splat's true decomposition at 1M/1080p:
the pallas kernel is ~9 ms but ``splat_from_planes`` end-to-end is ~57 ms — the
XLA patch reassembly (384->289 lane depad, (17,17) lane split, gwc<->ph
transpose) is ~48 ms of lane-hostile relayouts, and inside the kernel the K=4
quadratic-form matmul is ~7 of the 9 ms (d2only variant).

This proto rebuilds the path around both findings:

* **VPU d2**: ``(qx-lx)^2 + (qy-ly)^2`` as broadcast sublane x lane ops
  (5 VPU ops/pair ~= 0.9 ms at 1M x 256 lanes) instead of the K=4 MXU matmul
  (K=4 wastes 32x of the systolic array).
* **lane16 patch layout**: margin 2 (planes are exact: sprite radius <=
  max_radius_px = 2), patch 13x13 laid out as ``lane = i*16 + j`` so every
  patch row is an aligned 16-lane slice; 256 lanes vs the old 384.
* **in-kernel quadrant strips**: each program emits its TC cells' patches as
  2x2 quadrant row-strips [4ch, sy, TC*sx] placed DIRECTLY at image-block
  positions (block row = gh-1-r absorbs the world->image y flip).  The XLA
  side then just adds 4 statically-shifted full images — no relayouts.
  Two in-kernel placement variants are measured:
    - reshape: jnp.reshape([TC, w] -> [TC*w]) per (quadrant, row) — relies on
      Mosaic's sublane->lane merge;
    - dot: placement matmul C1[ch,j,x] = sum_t acc[t,ch,j] E[t,x] with a
      j == x mod sx mask + sublane reduce — no relayout at all.

Usage: python protos/time_splat2.py [C] [reps] [margin]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_planes import _FAR, splat_from_planes
from rust_particle_system_tpu.runtime.timing import hsync

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
MARGIN = int(sys.argv[3]) if len(sys.argv) > 3 else 2

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
H, W = RS.height, RS.width

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=C)
gh, gw = spec.gh, spec.gw
sx = int(round(spec.cell_width))
sy = int(round(spec.cell_size))
m = MARGIN
ph = sy + 2 * m
pw = sx + 2 * m
assert 2 * m <= min(sx, sy)
ROWPAD = 16 if pw <= 16 else 32
LANES = -(-ph * ROWPAD // 128) * 128
off = gh * sy - H  # world rows extend above the viewport top

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * 1.0e6
print(f"C={C} m={m} grid {gh}x{gw} patch {ph}x{pw} lanes {LANES} "
      f"lost={int(ps.lost)}", flush=True)

x_min, x_max, y_min, y_max = BOUNDS
ppx = jnp.where(live, ps.px - x_min, _FAR)          # 1 world unit = 1 px here
ppy = jnp.where(live, y_max - ps.py, _FAR)
r = jnp.where(live, 0.5, 0.0)
g = jnp.where(live, 0.7, 0.0)
b = jnp.where(live, 0.9, 0.0)
radius_px = 2.0

# lane16 pixel coordinates: lane = i*ROWPAD + j, dead lanes parked far away
lidx = np.arange(LANES)
li = lidx // ROWPAD
lj = lidx % ROWPAD
ldead = (li >= ph) | (lj >= pw)
lx_np = np.where(ldead, -_FAR, lj + 0.5)
ly_np = np.where(ldead, -_FAR, li + 0.5)
apix = jnp.asarray(np.stack([lx_np, ly_np]), jnp.float32)  # [2, LANES]
scal = jnp.stack([jnp.float32(radius_px)])


def alpha_of(d2, radius):
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    edge0 = 0.8 * radius
    tt = jnp.clip((dist - edge0) / jnp.maximum(radius - edge0, 1e-6), 0.0, 1.0)
    a = 1.0 - tt * tt * (3.0 - 2.0 * tt)
    return jnp.where(a < 0.01, 0.0, a)


def make_strip_kernel(tc: int, wt: int, variant: str):
    TCSX = tc * sx
    # placement matmul constants (dot variant)
    E_np = np.zeros((tc, TCSX), np.float32)
    for t in range(tc):
        E_np[t, t * sx : (t + 1) * sx] = 1.0
    # mask[j, x] = 1 iff j == x mod sx   (j < sx)
    Mnp = np.zeros((sx, TCSX), np.float32)
    for x in range(TCSX):
        Mnp[x % sx, x] = 1.0

    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref,
               *q_refs):
        radius = scal_ref[0]
        s = pl.program_id(1)
        cellx = (s * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
                 ).astype(jnp.float32)
        origin_x = cellx * sx - m                      # [tc, 1]
        # block row = gh-1-r handles y; patch-local y origin within this row:
        # global patch top = H - (r+1)*sy - m; qy below uses patch-local i.
        r_id = pl.program_id(0)
        origin_y = (H - (jnp.float32(r_id) + 1.0) * sy - m)

        qx = px_ref[0] - origin_x                      # [tc, C]
        qy = py_ref[0] - origin_y
        lx = apix_ref[0]                               # [LANES]
        ly = apix_ref[1]
        dx = qx[:, :, None] - lx[None, None, :]
        dy = qy[:, :, None] - ly[None, None, :]
        d2 = dx * dx + dy * dy                         # [tc, C, LANES] on VPU
        alpha = alpha_of(d2, radius)

        cols = jnp.stack(
            [r_ref[0], g_ref[0], b_ref[0], jnp.ones_like(r_ref[0])], axis=1
        )                                              # [tc, 4, C]
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                              # [tc, 4, LANES]

        E = jnp.asarray(E_np)
        Mk = jnp.asarray(Mnp)
        for qy_i in range(2):
            for qx_i in range(2):
                qref = q_refs[qy_i * 2 + qx_i]
                rows = sy if qy_i == 0 else ph - sy
                wcols = sx if qx_i == 0 else pw - sx
                for ii in range(rows):
                    lane0 = (qy_i * sy + ii) * ROWPAD + qx_i * sx
                    sl = acc[:, :, lane0 : lane0 + wcols]   # [tc, 4, w]
                    if wcols < sx:
                        sl = jnp.concatenate(
                            [sl, jnp.zeros((tc, 4, sx - wcols), jnp.float32)],
                            axis=-1)
                    if variant == "reshape":
                        row = sl.transpose(1, 0, 2).reshape(4, TCSX)
                    else:
                        # C1[ch, j, x] = sum_t sl[t, ch, j] * E[t, x]
                        c1 = jax.lax.dot_general(
                            sl, E, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )                               # [4, sx, TCSX]
                        row = jnp.sum(c1 * Mk[None], axis=1)  # [4, TCSX]
                    qref[:, ii, :] = row
                if rows < sy:
                    for ii in range(rows, sy):
                        qref[:, ii, :] = jnp.zeros((4, TCSX), jnp.float32)

    return kernel


def run_strips(tc: int, variant: str, check=False):
    wt = -(-gw // tc) * tc
    TCSX = tc * sx

    def plane(a, fill):
        out = jnp.full((gh, wt, C), fill, jnp.float32)
        return out.at[:, :gw, :].set(a)

    planes = [plane(ppx, _FAR), plane(ppy, _FAR), plane(r, 0.0),
              plane(g, 0.0), plane(b, 0.0)]
    in_block = pl.BlockSpec((1, tc, C), lambda rr, ss: (gh - 1 - rr, ss, 0))
    q_block = pl.BlockSpec((4, sy, TCSX), lambda rr, ss: (0, rr, ss))
    q_shape = jax.ShapeDtypeStruct((4, gh * sy, wt * sx), jnp.float32)

    @jax.jit
    def go(planes):
        qs = pl.pallas_call(
            make_strip_kernel(tc, wt, variant),
            grid=(gh, wt // tc),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, LANES), lambda rr, ss: (0, 0))]
            + [in_block] * 5,
            out_specs=tuple([q_block] * 4),
            out_shape=tuple([q_shape] * 4),
            interpret=False,
        )(scal, apix, *planes)
        # final: img[Y, X] = sum_q Q[Y - dy_q, X - dx_q]
        img = jnp.zeros((4, H, W), jnp.float32)
        for qy_i in range(2):
            for qx_i in range(2):
                dy_q = qy_i * sy - m - off
                dx_q = qx_i * sx - m
                y0 = max(0, dy_q)
                y1 = min(H, gh * sy + dy_q)
                x0 = max(0, dx_q)
                x1 = min(W, wt * sx + dx_q)
                img = img.at[:, y0:y1, x0:x1].add(
                    qs[qy_i * 2 + qx_i][:, y0 - dy_q : y1 - dy_q,
                                        x0 - dx_q : x1 - dx_q])
        return img

    out = go(planes).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = go(planes)
    hsync(s)
    per = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  strips tc={tc:3d} {variant:8s}: {per:7.2f} ms", flush=True)
    if check:
        rgb_ref, a_ref = splat_from_planes(
            ps.px, ps.py, ps.vx, ps.vy, live, 2.0, 300.0,
            bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
            interpret=False, margin=m, resolve=False,
            colors=(r, g, b))
        ref = jnp.concatenate(
            [jnp.moveaxis(rgb_ref, -1, 0), a_ref[None]], axis=0)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"    max |strips - splat_from_planes| = {err:.2e}", flush=True)
    return per


def run_vpud2_patches(tc: int):
    """Kernel-only: VPU d2 with patch outputs (isolate the d2 gain)."""
    nc = gh * gw
    nc_pad = -(-nc // tc) * tc

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    planes = [flat(ppx, _FAR), flat(ppy, _FAR), flat(r, 0.0), flat(g, 0.0),
              flat(b, 0.0)]

    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref, *outs):
        radius = scal_ref[0]
        t = pl.program_id(0)
        cell = (t * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
                ).astype(jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        origin_x = cx * sx - m
        origin_y = H - (cy + 1.0) * sy - m
        qx = px_ref[:] - origin_x
        qy = py_ref[:] - origin_y
        dx = qx[:, :, None] - apix_ref[0][None, None, :]
        dy = qy[:, :, None] - apix_ref[1][None, None, :]
        alpha = alpha_of(dx * dx + dy * dy, radius)
        cols = jnp.stack(
            [r_ref[:], g_ref[:], b_ref[:], jnp.ones_like(r_ref[:])], axis=1)
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        for c in range(4):
            outs[c][:] = acc[:, c, :]

    block = pl.BlockSpec((tc, C), lambda t: (t, 0))
    out_block = pl.BlockSpec((tc, LANES), lambda t: (t, 0))

    @jax.jit
    def go(planes):
        res = pl.pallas_call(
            kernel,
            grid=(nc_pad // tc,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, LANES), lambda t: (0, 0))] + [block] * 5,
            out_specs=tuple([out_block] * 4),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nc_pad, LANES), jnp.float32)] * 4),
            interpret=False,
        )(scal, apix, *planes)
        return sum(jnp.sum(x[::64, ::64]) for x in res)

    go(planes).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = go(planes)
    hsync(s)
    per = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  vpud2-patches tc={tc:3d}: {per:7.2f} ms (kernel only)", flush=True)
    return per


def run_lane16_full(tc: int, check=False):
    """End-to-end: vpud2 lane16 patches + ALIGNED XLA assembly (256 = 16x16
    lane split is layout-friendly, unlike the old 384->289->(17,17) path)."""
    nc = gh * gw
    nc_pad = -(-nc // tc) * tc

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    planes = [flat(ppx, _FAR), flat(ppy, _FAR), flat(r, 0.0), flat(g, 0.0),
              flat(b, 0.0)]

    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref, *outs):
        radius = scal_ref[0]
        t = pl.program_id(0)
        cell = (t * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
                ).astype(jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        origin_x = cx * sx - m
        origin_y = H - (cy + 1.0) * sy - m
        qx = px_ref[:] - origin_x
        qy = py_ref[:] - origin_y
        dx = qx[:, :, None] - apix_ref[0][None, None, :]
        dy = qy[:, :, None] - apix_ref[1][None, None, :]
        alpha = alpha_of(dx * dx + dy * dy, radius)
        cols = jnp.stack(
            [r_ref[:], g_ref[:], b_ref[:], jnp.ones_like(r_ref[:])], axis=1)
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        for c in range(4):
            outs[c][:] = acc[:, c, :]

    block = pl.BlockSpec((tc, C), lambda t: (t, 0))
    out_block = pl.BlockSpec((tc, LANES), lambda t: (t, 0))

    def assemble(p):
        # [nc, 256] -> [gh, gw, 16, 16], flip rows, quadrant shifted-adds
        P = p[:nc].reshape(gh, gw, 16, 16)[::-1]
        img = jnp.zeros((H, W), jnp.float32)
        for qy_i in range(2):
            for qx_i in range(2):
                ri = slice(0, sy) if qy_i == 0 else slice(sy, ph)
                ci = slice(0, sx) if qx_i == 0 else slice(sx, pw)
                blockq = P[:, :, ri, ci]
                hh, wwq = blockq.shape[2], blockq.shape[3]
                blockq = jnp.pad(
                    blockq, ((0, 0), (0, 0), (0, sy - hh), (0, sx - wwq)))
                quad = blockq.transpose(0, 2, 1, 3).reshape(gh * sy, gw * sx)
                dy_q = qy_i * sy - m - off
                dx_q = qx_i * sx - m
                y0, y1 = max(0, dy_q), min(H, gh * sy + dy_q)
                x0, x1 = max(0, dx_q), min(W, gw * sx + dx_q)
                img = img.at[y0:y1, x0:x1].add(
                    quad[y0 - dy_q : y1 - dy_q, x0 - dx_q : x1 - dx_q])
        return img

    @jax.jit
    def go(planes):
        res = pl.pallas_call(
            kernel,
            grid=(nc_pad // tc,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, LANES), lambda t: (0, 0))] + [block] * 5,
            out_specs=tuple([out_block] * 4),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nc_pad, LANES), jnp.float32)] * 4),
            interpret=False,
        )(scal, apix, *planes)
        return jnp.stack([assemble(x) for x in res])

    out = go(planes).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = go(planes)
    hsync(s)
    per = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  lane16-full tc={tc:3d}: {per:7.2f} ms (end-to-end)", flush=True)
    if check:
        rgb_ref, a_ref = splat_from_planes(
            ps.px, ps.py, ps.vx, ps.vy, live, 2.0, 300.0,
            bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
            interpret=False, margin=m, resolve=False,
            colors=(r, g, b))
        ref = jnp.concatenate(
            [jnp.moveaxis(rgb_ref, -1, 0), a_ref[None]], axis=0)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"    max |lane16 - splat_from_planes| = {err:.2e}", flush=True)
    return per


def run_rowstrip(tcs: int, check=False, gate: int = 0):
    """End-to-end: one program per cell row; sub-tiles of ``tcs`` cells place
    their patches into a row strip IN-KERNEL via two one-hot matmuls
    (cells->lanes without any relayout), RMW-accumulating x-overlap seams.
    The XLA side folds only the y-overlap: two static shifted adds.

    ``gate``: if nonzero, own slots are processed in lane-chunks of this width
    and all-empty chunks skip their pair math (pl.when on an in-kernel
    occupancy reduction) — air cells in settled states cost ~nothing.
    """
    wt = -(-gw // tcs) * tcs
    nsub = wt // tcs
    SPAN = tcs * sx + pw - sx          # strip cols touched by one sub-tile
    SPAN_PAD = -(-SPAN // 128) * 128   # padded to lane tile
    K = tcs * 16
    assert K <= 512
    WP = -(-((nsub - 1) * tcs * sx + SPAN_PAD) // 128) * 128

    # E1[t, k] = 1 iff k//16 == t  (cells -> K)
    E1_np = np.zeros((tcs, K), np.float32)
    for t in range(tcs):
        E1_np[t, t * 16 : (t + 1) * 16] = 1.0
    # maskj[l, k] = 1 iff l % 16 == k % 16  (select patch row's j lane)
    mj_np = np.zeros((LANES, K), np.float32)
    for l in range(LANES):
        for k in range(l % 16, K, 16):
            mj_np[l, k] = 1.0
    # P[k, x] = 1 iff x == (k//16)*sx + (k%16), k%16 < pw  (placement + overlap)
    P_np = np.zeros((K, SPAN_PAD), np.float32)
    for k in range(K):
        j = k % 16
        if j < pw:
            P_np[k, (k // 16) * sx + j] = 1.0
    E1 = jnp.asarray(E1_np)
    mj = jnp.asarray(mj_np)
    Pm = jnp.asarray(P_np)

    def plane(a, fill):
        out = jnp.full((gh, wt, C), fill, jnp.float32)
        return out.at[:, :gw, :].set(a)

    planes = [plane(ppx, _FAR), plane(ppy, _FAR), plane(r, 0.0),
              plane(g, 0.0), plane(b, 0.0)]

    def kernel(scal_ref, apix_ref, e1_ref, mj_ref, p_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))  # input cell row
        origin_y = H - (rr + 1.0) * sy - m
        q_ref[...] = jnp.zeros((4, 1, 16, WP), jnp.float32)

        # Unrolled: the seam RMW needs STATIC lane offsets (dynamic lane-dim
        # slices are restricted in Mosaic).
        for t in range(nsub):
            cellx = (t * tcs
                     + jax.lax.broadcasted_iota(jnp.int32, (tcs, 1), 0)
                     ).astype(jnp.float32)
            origin_x = cellx * sx - m
            qx = px_ref[0, t * tcs : (t + 1) * tcs, :] - origin_x  # [tcs, C]
            qy = py_ref[0, t * tcs : (t + 1) * tcs, :] - origin_y
            cols = jnp.stack(
                [r_ref[0, t * tcs : (t + 1) * tcs, :],
                 g_ref[0, t * tcs : (t + 1) * tcs, :],
                 b_ref[0, t * tcs : (t + 1) * tcs, :],
                 jnp.ones((tcs, C), jnp.float32)], axis=1)         # [tcs, 4, C]
            dx = qx[:, :, None] - apix_ref[0][None, None, :]
            dy = qy[:, :, None] - apix_ref[1][None, None, :]
            alpha = alpha_of(dx * dx + dy * dy, radius)           # [tcs, C, LN]
            acc = jax.lax.dot_general(
                cols, alpha, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # [tcs, 4, LN]
            # cells -> K lanes (one-hot contract over t), keep (i, j) rows
            y = jax.lax.dot_general(
                acc, e1_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # [4, LN, K]
            z = (y * mj_ref[...][None]).reshape(4, LANES // 16, 16, K)
            zi = jnp.sum(z, axis=2)                               # [4, 16i, K]
            s = jax.lax.dot_general(
                zi, p_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # [4, 16, SPAN]
            x0 = t * tcs * sx
            cur = q_ref[:, 0, :, x0 : x0 + SPAN_PAD]
            q_ref[:, 0, :, x0 : x0 + SPAN_PAD] = cur + s

        del radius

    in_block = pl.BlockSpec((1, wt, C), lambda rrr: (gh - 1 - rrr, 0, 0))
    q_block = pl.BlockSpec((4, 1, 16, WP), lambda rrr: (0, rrr, 0, 0))

    @jax.jit
    def go(planes):
        q = pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, LANES), lambda rrr: (0, 0)),
                      pl.BlockSpec((tcs, K), lambda rrr: (0, 0)),
                      pl.BlockSpec((LANES, K), lambda rrr: (0, 0)),
                      pl.BlockSpec((K, SPAN_PAD), lambda rrr: (0, 0))]
            + [in_block] * 5,
            out_specs=q_block,
            out_shape=jax.ShapeDtypeStruct((4, gh, 16, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=False,
        )(scal, apix, E1, mj, Pm, *planes)
        # y-overlap fold: patch row i of strip row R' lands at image row
        # R'*sy + i - m - off.  Part A (i < sy) and part B (i in [sy, ph)).
        img = jnp.zeros((4, H, W), jnp.float32)
        a = q[:, :, :sy, :].reshape(4, gh * sy, WP)
        shift_a = -m - off
        y0, y1 = max(0, shift_a), min(H, gh * sy + shift_a)
        img = img.at[:, y0:y1, :].add(
            a[:, y0 - shift_a : y1 - shift_a, m : m + W])
        nb = ph - sy
        bpart = q[:, :, sy:ph, :]
        bpart = jnp.concatenate(
            [bpart, jnp.zeros((4, gh, sy - nb, WP), jnp.float32)], axis=2)
        bpart = bpart.reshape(4, gh * sy, WP)
        shift_b = sy - m - off
        y0, y1 = max(0, shift_b), min(H, gh * sy + shift_b)
        img = img.at[:, y0:y1, :].add(
            bpart[:, y0 - shift_b : y1 - shift_b, m : m + W])
        return img

    out = go(planes).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = go(planes)
    hsync(s)
    per = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  rowstrip tcs={tcs:3d} gate={gate}: {per:7.2f} ms (end-to-end)",
          flush=True)
    if check:
        rgb_ref, a_ref = splat_from_planes(
            ps.px, ps.py, ps.vx, ps.vy, live, 2.0, 300.0,
            bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
            interpret=False, margin=m, resolve=False,
            colors=(r, g, b))
        ref = jnp.concatenate(
            [jnp.moveaxis(rgb_ref, -1, 0), a_ref[None]], axis=0)
        # ground-truth scatter oracle from the same planes
        from rust_particle_system_tpu.render.splat_jax import splat_accumulate
        lm = np.asarray(live).reshape(-1)
        posw = np.stack([np.asarray(ps.px).reshape(-1)[lm],
                         np.asarray(ps.py).reshape(-1)[lm]], axis=-1)
        colw = np.broadcast_to(np.array([0.5, 0.7, 0.9, 1.0], np.float32),
                               (posw.shape[0], 4))
        orgb, oa = jax.jit(splat_accumulate, static_argnames=("spec",))(
            jnp.asarray(posw), jnp.asarray(colw), 2.0,
            jnp.asarray(BOUNDS), spec=RS)
        oracle = jnp.concatenate(
            [jnp.moveaxis(orgb, -1, 0), oa[None]], axis=0)
        for name, refi in (("splat_from_planes", ref), ("oracle", oracle)):
            d = jnp.abs(out - refi)
            err = float(jnp.max(d))
            idx = jnp.unravel_index(jnp.argmax(d), d.shape)
            ch, yy, xx = int(idx[0]), int(idx[1]), int(idx[2])
            print(f"    vs {name}: max={err:.2e} at ch={ch} y={yy} x={xx}; "
                  f"n>1e-3: {int(jnp.sum(d > 1e-3))}  "
                  f"out={float(out[ch, yy, xx]):.3f} "
                  f"ref={float(refi[ch, yy, xx]):.3f}", flush=True)
        dro = jnp.abs(ref - oracle)
        print(f"    |splat_from_planes - oracle| max={float(jnp.max(dro)):.2e} "
              f"n>1e-3: {int(jnp.sum(dro > 1e-3))}", flush=True)
    return per


def run_rowstrip_rs(tcs: int, check=False):
    """rowstrip with RESHAPE placement: acc [tcs,4,LANES] -> [tcs,4,16,16]
    (lane split relayout) then tcs tiny RMW adds at static offsets — no
    placement matmuls at all."""
    wt = -(-gw // tcs) * tcs
    nsub = wt // tcs
    WP = -(-(wt * sx + 2 * m + 128) // 128) * 128

    def plane(a, fill):
        out = jnp.full((gh, wt, C), fill, jnp.float32)
        return out.at[:, :gw, :].set(a)

    planes = [plane(ppx, _FAR), plane(ppy, _FAR), plane(r, 0.0),
              plane(g, 0.0), plane(b, 0.0)]

    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy - m
        q_ref[...] = jnp.zeros((4, 1, 16, WP), jnp.float32)
        for t in range(nsub):
            cellx = (t * tcs + jax.lax.broadcasted_iota(jnp.int32, (tcs, 1), 0)
                     ).astype(jnp.float32)
            origin_x = cellx * sx - m
            qx = px_ref[0, t * tcs : (t + 1) * tcs, :] - origin_x
            qy = py_ref[0, t * tcs : (t + 1) * tcs, :] - origin_y
            cols = jnp.stack(
                [r_ref[0, t * tcs : (t + 1) * tcs, :],
                 g_ref[0, t * tcs : (t + 1) * tcs, :],
                 b_ref[0, t * tcs : (t + 1) * tcs, :],
                 jnp.ones((tcs, C), jnp.float32)], axis=1)
            dx = qx[:, :, None] - apix_ref[0][None, None, :]
            dy = qy[:, :, None] - apix_ref[1][None, None, :]
            alpha = alpha_of(dx * dx + dy * dy, radius)
            acc = jax.lax.dot_general(
                cols, alpha, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # [tcs, 4, LANES]
            accr = acc.reshape(tcs, 4, LANES // ROWPAD, ROWPAD)
            for tl in range(tcs):
                x0 = (t * tcs + tl) * sx
                cur = q_ref[:, 0, :, x0 : x0 + ROWPAD]
                q_ref[:, 0, :, x0 : x0 + ROWPAD] = cur + accr[tl, :, :16, :]

    in_block = pl.BlockSpec((1, wt, C), lambda rrr: (gh - 1 - rrr, 0, 0))
    q_block = pl.BlockSpec((4, 1, 16, WP), lambda rrr: (0, rrr, 0, 0))

    @jax.jit
    def go(planes):
        q = pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, LANES), lambda rrr: (0, 0))]
            + [in_block] * 5,
            out_specs=q_block,
            out_shape=jax.ShapeDtypeStruct((4, gh, 16, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=False,
        )(scal, apix, *planes)
        img = jnp.zeros((4, H, W), jnp.float32)
        a = q[:, :, :sy, :].reshape(4, gh * sy, WP)
        shift_a = -m - off
        y0, y1 = max(0, shift_a), min(H, gh * sy + shift_a)
        img = img.at[:, y0:y1, :].add(
            a[:, y0 - shift_a : y1 - shift_a, m : m + W])
        nb = ph - sy
        bpart = q[:, :, sy:ph, :]
        bpart = jnp.concatenate(
            [bpart, jnp.zeros((4, gh, sy - nb, WP), jnp.float32)], axis=2)
        bpart = bpart.reshape(4, gh * sy, WP)
        shift_b = sy - m - off
        y0, y1 = max(0, shift_b), min(H, gh * sy + shift_b)
        img = img.at[:, y0:y1, :].add(
            bpart[:, y0 - shift_b : y1 - shift_b, m : m + W])
        return img

    try:
        out = go(planes).block_until_ready()
    except Exception as e:
        print(f"  rowstrip-rs tcs={tcs}: FAILED {type(e).__name__}: {e}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = go(planes)
    hsync(s)
    per = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  rowstrip-rs tcs={tcs:3d}: {per:7.2f} ms (end-to-end)", flush=True)
    if check:
        from rust_particle_system_tpu.render.splat_jax import splat_accumulate
        lm = np.asarray(live).reshape(-1)
        posw = np.stack([np.asarray(ps.px).reshape(-1)[lm],
                         np.asarray(ps.py).reshape(-1)[lm]], axis=-1)
        colw = np.broadcast_to(np.array([0.5, 0.7, 0.9, 1.0], np.float32),
                               (posw.shape[0], 4))
        orgb, oa = jax.jit(splat_accumulate, static_argnames=("spec",))(
            jnp.asarray(posw), jnp.asarray(colw), 2.0,
            jnp.asarray(BOUNDS), spec=RS)
        oracle = jnp.concatenate(
            [jnp.moveaxis(orgb, -1, 0), oa[None]], axis=0)
        d = jnp.abs(out - oracle)
        print(f"    vs oracle: max={float(jnp.max(d)):.2e} "
              f"n>1e-3: {int(jnp.sum(d > 1e-3))}", flush=True)
    return per


run_rowstrip_rs(16, check=True)
run_rowstrip_rs(32)
run_rowstrip(16, check=False)
