"""HONEST splat timings (in-jit repetition over distinct inputs, one host pull).

time_splat2.py's naive dispatch loops showed 4x run-to-run variance (9.8 vs 41 ms
for identical code) — the runtime memoizes identical-input executions and its
block_until_ready is not a true barrier (see runtime/timing.py).  This proto
re-measures the three candidate paths under the bench protocol: R=6 distinct
input sets, fori_loop in ONE jit with a checksum accumulator, single host pull.

  old    splat_from_planes (production round-2: K=4 MXU quadratic form +
         XLA patch assembly), margin 2
  vpu    vpud2 lane16 patch kernel ONLY (no assembly) — the pair-math floor
  row    rowstrip-dot end-to-end (vpud2 + in-kernel one-hot placement to row
         strips + 2 shifted adds) — the candidate production path

Usage: python protos/time_splat3.py [C] [tcs]
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
from rust_particle_system_tpu.runtime.timing import hsync_one

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TCS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

N = 1_000_000
R = 6
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
H, W = RS.height, RS.width
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=C)
gh, gw = spec.gh, spec.gw
sx = int(round(spec.cell_width))
sy = int(round(spec.cell_size))
m = 2
ph = pw = sx + 2 * m
ROWPAD = 16
LANES = -(-ph * ROWPAD // 128) * 128
off = gh * sy - H
radius_px = 2.0

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * 1.0e6
print(f"C={C} tcs={TCS} grid {gh}x{gw}", flush=True)

x_min, x_max, y_min, y_max = BOUNDS


def pix_planes(i):
    """Distinct input set i: positions jittered by 0.003*i pixels."""
    jit_px = 0.003 * i
    ppx = jnp.where(live, ps.px - x_min + jit_px, _FAR)
    ppy = jnp.where(live, y_max - ps.py + jit_px, _FAR)
    r = jnp.where(live, 0.5, 0.0)
    g = jnp.where(live, 0.7, 0.0)
    b = jnp.where(live, 0.9, 0.0)
    return ppx, ppy, r, g, b


lidx = np.arange(LANES)
li, lj = lidx // ROWPAD, lidx % ROWPAD
ldead = (li >= ph) | (lj >= pw)
apix = jnp.asarray(np.stack([np.where(ldead, -_FAR, lj + 0.5),
                             np.where(ldead, -_FAR, li + 0.5)]), jnp.float32)
scal = jnp.stack([jnp.float32(radius_px)])


def alpha_of(d2, radius):
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    edge0 = 0.8 * radius
    tt = jnp.clip((dist - edge0) / jnp.maximum(radius - edge0, 1e-6), 0.0, 1.0)
    a = 1.0 - tt * tt * (3.0 - 2.0 * tt)
    return jnp.where(a < 0.01, 0.0, a)


def timeit(name, fn, sets):
    """fn(set) -> array; times an in-jit R-rep loop with checksum."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)

    @jax.jit
    def loop(stacked):
        def body(i, acc):
            out = fn(jax.tree.map(lambda x: x[i], stacked))
            return acc + jnp.sum(out[..., ::97, ::101])

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    hsync_one(loop(stacked))
    t0 = time.perf_counter()
    hsync_one(loop(stacked))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {name}: {per:7.2f} ms", flush=True)
    return per


# ---------------- old production path ----------------
def old_path(planes):
    ppx, ppy, r, g, b = planes
    rgb_acc, a_acc = splat_from_planes(
        ppx * 1.0 + x_min, jnp.zeros_like(ppx), jnp.zeros_like(ppx),
        jnp.zeros_like(ppx), ppx < 0.5 * _FAR, 2.0, 300.0,
        bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
        interpret=False, margin=m, resolve=False, colors=(r, g, b))
    return a_acc


def old_path_real(planes):
    # honest: feed world coords derived from the pixel planes
    ppx, ppy, r, g, b = planes
    pxw = jnp.where(ppx < 0.5 * _FAR, ppx + x_min, 1.0e6)
    pyw = jnp.where(ppy < 0.5 * _FAR, y_max - ppy, 1.0e6)
    rgb_acc, a_acc = splat_from_planes(
        pxw, pyw, jnp.zeros_like(ppx), jnp.zeros_like(ppx),
        ppx < 0.5 * _FAR, 2.0, 300.0,
        bounds_static=BOUNDS, grid_spec=spec, render_spec=RS,
        interpret=False, margin=m, resolve=False, colors=(r, g, b))
    return a_acc


# ---------------- vpud2 patch kernel only ----------------
def make_vpu_kernel(tc):
    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref, *outs):
        radius = scal_ref[0]
        t = pl.program_id(0)
        cell = (t * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
                ).astype(jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        qx = px_ref[:] - (cx * sx - m)
        qy = py_ref[:] - (H - (cy + 1.0) * sy - m)
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
    return kernel


def vpu_kernel_only(planes, tc=32):
    ppx, ppy, r, g, b = planes
    nc = gh * gw
    nc_pad = -(-nc // tc) * tc

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    block = pl.BlockSpec((tc, C), lambda t: (t, 0))
    out_block = pl.BlockSpec((tc, LANES), lambda t: (t, 0))
    res = pl.pallas_call(
        make_vpu_kernel(tc),
        grid=(nc_pad // tc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2, LANES), lambda t: (0, 0))] + [block] * 5,
        out_specs=tuple([out_block] * 4),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nc_pad, LANES), jnp.float32)] * 4),
        interpret=False,
    )(scal, apix, flat(ppx, _FAR), flat(ppy, _FAR), flat(r, 0.0),
      flat(g, 0.0), flat(b, 0.0))
    return res[3]


# ---------------- rowstrip-dot end-to-end ----------------
def build_rowstrip(tcs):
    wt = -(-gw // tcs) * tcs
    nsub = wt // tcs
    SPAN = tcs * sx + pw - sx
    SPAN_PAD = -(-SPAN // 128) * 128
    K = tcs * 16
    WP = -(-((nsub - 1) * tcs * sx + SPAN_PAD) // 128) * 128

    E1_np = np.zeros((tcs, K), np.float32)
    for t in range(tcs):
        E1_np[t, t * 16 : (t + 1) * 16] = 1.0
    mj_np = np.zeros((LANES, K), np.float32)
    for l in range(LANES):
        for k in range(l % 16, K, 16):
            mj_np[l, k] = 1.0
    P_np = np.zeros((K, SPAN_PAD), np.float32)
    for k in range(K):
        j = k % 16
        if j < pw:
            P_np[k, (k // 16) * sx + j] = 1.0
    E1, mj, Pm = jnp.asarray(E1_np), jnp.asarray(mj_np), jnp.asarray(P_np)

    def kernel(scal_ref, apix_ref, e1_ref, mj_ref, p_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy - m
        q_ref[...] = jnp.zeros((4, 1, 16, WP), jnp.float32)
        for t in range(nsub):
            cellx = (t * tcs
                     + jax.lax.broadcasted_iota(jnp.int32, (tcs, 1), 0)
                     ).astype(jnp.float32)
            qx = px_ref[0, t * tcs : (t + 1) * tcs, :] - (cellx * sx - m)
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
                precision=jax.lax.Precision.HIGHEST)
            y = jax.lax.dot_general(
                acc, e1_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            z = (y * mj_ref[...][None]).reshape(4, LANES // 16, 16, K)
            zi = jnp.sum(z, axis=2)
            s = jax.lax.dot_general(
                zi, p_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            x0 = t * tcs * sx
            cur = q_ref[:, 0, :, x0 : x0 + SPAN_PAD]
            q_ref[:, 0, :, x0 : x0 + SPAN_PAD] = cur + s

    in_block = pl.BlockSpec((1, wt, C), lambda rrr: (gh - 1 - rrr, 0, 0))
    q_block = pl.BlockSpec((4, 1, 16, WP), lambda rrr: (0, rrr, 0, 0))

    def run(planes):
        ppx, ppy, r, g, b = planes

        def plane(a, fill):
            out = jnp.full((gh, wt, C), fill, jnp.float32)
            return out.at[:, :gw, :].set(a)

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
        )(scal, apix, E1, mj, Pm, plane(ppx, _FAR), plane(ppy, _FAR),
          plane(r, 0.0), plane(g, 0.0), plane(b, 0.0))
        img = jnp.zeros((4, H, W), jnp.float32)
        a = q[:, :, :sy, :].reshape(4, gh * sy, WP)
        sa = -m - off
        y0, y1 = max(0, sa), min(H, gh * sy + sa)
        img = img.at[:, y0:y1, :].add(a[:, y0 - sa : y1 - sa, m : m + W])
        nb = ph - sy
        bp = q[:, :, sy:ph, :]
        bp = jnp.concatenate(
            [bp, jnp.zeros((4, gh, sy - nb, WP), jnp.float32)], axis=2)
        bp = bp.reshape(4, gh * sy, WP)
        sb = sy - m - off
        y0, y1 = max(0, sb), min(H, gh * sy + sb)
        img = img.at[:, y0:y1, :].add(bp[:, y0 - sb : y1 - sb, m : m + W])
        return img

    return run


def timeit_dispatch(name, fn, nsets=12):
    """Pipelined-dispatch timing: nsets DISTINCT pre-staged inputs, one jitted
    fn, single end barrier.  Distinct inputs defeat the runtime's
    identical-input memoization; pipelined dispatch measures device time."""
    dsets = [jax.tree.map(jnp.asarray, pix_planes(i + 17)) for i in range(nsets)]
    jfn = jax.jit(fn)
    hsync_one(jfn(dsets[0]))   # warm
    outs = None
    t0 = time.perf_counter()
    for s in dsets:
        outs = jfn(s)
    hsync_one(outs)
    per = (time.perf_counter() - t0) / nsets * 1e3
    print(f"  {name} [dispatch]: {per:7.2f} ms", flush=True)
    return per


sets = [pix_planes(i) for i in range(R)]
import os
which = os.environ.get("SPLAT_WHICH", "vpu,row16,row32").split(",")
if "old" in which:
    timeit("old splat_from_planes (margin 2)", old_path_real, sets)
if "vpu" in which:
    timeit("vpud2 patch kernel only (tc=32) ", lambda p: vpu_kernel_only(p, 32),
           sets)
if "vpud" in which:
    timeit_dispatch("vpud2 patch kernel only (tc=32) ",
                    lambda p: vpu_kernel_only(p, 32))
if "row8" in which:
    timeit_dispatch("rowstrip-dot e2e (tcs=8)      ", build_rowstrip(8))
if "row16" in which:
    timeit_dispatch("rowstrip-dot e2e (tcs=16)     ", build_rowstrip(16))
if "row32" in which:
    timeit_dispatch("rowstrip-dot e2e (tcs=32)     ", build_rowstrip(32))
