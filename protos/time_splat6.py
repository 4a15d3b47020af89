"""Stage-split probe for the row-strip rasterizer at the 1080p sim-grid geometry.

time_splat5 established the cost is ~dot-issue-bound.  This probe isolates WHICH
stage dominates by running kernel variants with later stages lopped off (outputs
consume earlier stages' values so nothing dead-code-eliminates):

  pair   — distances + alpha only (the VPU pair math)
  acc    — + the cols x alpha dot (batched over tcs -> possibly tcs separate
           M=4 MXU issues; also measured as ONE block-diagonal dot: variant
           'accbd' builds cols_bd [4*tcs, tcs*C] by lane-tiling + a constant
           block mask, turning 32 mini-dots into one M=128/K=2048/N=256 dot)
  spread — + the E1 cells->K-lanes dot
  fold   — + the mj mask + rowpad-group sum (VPU)
  place  — + the P strip-placement dot + seam RMW (= the full kernel)

Usage: python protos/time_splat6.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rust_particle_system_tpu.render.splat_planes as sp
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
MARGIN = 3
HI = jax.lax.Precision.HIGHEST

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * sp._FAR
vx = jnp.where(live, 30.0, 0.0)
vy = jnp.where(live, -12.0, 0.0)


def build(stage: str, tcs: int):
    """A splat_from_planes clone whose kernel stops after `stage`."""
    g, rs = spec, RS
    gh, gw, C = ps.px.shape
    margin = MARGIN
    x_min, x_max, y_min, y_max = (float(b) for b in BOUNDS)
    sx_scale = rs.width / (x_max - x_min)
    sy_scale = rs.height / (y_max - y_min)
    sx_px = int(round(g.cell_width * sx_scale))
    sy_px = int(round(g.cell_size * sy_scale))
    H, W = rs.height, rs.width
    ph = sy_px + 2 * margin
    pw = sx_px + 2 * margin
    rowpad = 16 if pw <= 16 else 32
    lanes = sp._round_up(ph * rowpad, 128)
    wt = sp._round_up(gw, tcs)
    nsub = wt // tcs
    E1, mj, P, K, span_pad = sp._placement_consts(tcs, rowpad, lanes, sx_px, pw)
    WP = sp._round_up((nsub - 1) * tcs * sx_px + span_pad, 128)
    PH_PAD = sp._round_up(ph, 8)

    lidx = np.arange(lanes)
    li, lj = lidx // rowpad, lidx % rowpad
    ldead = (li >= ph) | (lj >= pw)
    apix = jnp.asarray(
        np.stack([np.where(ldead, -sp._FAR, lj + 0.5),
                  np.where(ldead, -sp._FAR, li + 0.5)]), jnp.float32)

    # constant block mask for the 'accbd' variant: [(t,c) rows, (t',s) lanes]
    rr_ = np.arange(4 * tcs)[:, None]
    qq_ = np.arange(tcs * C)[None, :]
    bd_mask = jnp.asarray((rr_ // 4 == qq_ // C).astype(np.float32))

    def kernel(scal_ref, apix_ref, e1_ref, mj_ref, p_ref, bd_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rrow = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rrow + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((4, 1, PH_PAD, WP), jnp.float32)
        for t in range(nsub):
            sl = slice(t * tcs, (t + 1) * tcs)
            pxs = px_ref[0, sl, :]
            any_live = jnp.max(jnp.where(pxs < 0.5 * sp._FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(t=t, sl=sl, pxs=pxs):
                cellx = (t * tcs
                         + jax.lax.broadcasted_iota(jnp.int32, (tcs, 1), 0)
                         ).astype(jnp.float32)
                qx = pxs - (cellx * sx_px - margin)
                qy = py_ref[0, sl, :] - origin_y
                cols = jnp.stack(
                    [r_ref[0, sl, :], g_ref[0, sl, :], b_ref[0, sl, :],
                     jnp.ones((tcs, C), jnp.float32)], axis=1)
                dx = qx[:, :, None] - apix_ref[0][None, None, :]
                dy = qy[:, :, None] - apix_ref[1][None, None, :]
                dist = jnp.sqrt(dx * dx + dy * dy)
                tt = jnp.clip((dist - 0.8 * radius) * inv_w, 0.0, 1.0)
                alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                def sink(slot, val2d):
                    # 2-D RMW accumulate (rank-1 stores crash Mosaic's layout
                    # inference on this toolchain)
                    rr_ = val2d.shape[0]
                    cur = q_ref[slot, 0, 0:rr_, 0:128]
                    q_ref[slot, 0, 0:rr_, 0:128] = cur + val2d

                if stage == "pair":
                    # consume alpha + cols without any dot
                    v = (jnp.sum(alpha, axis=(0, 1))[None, :]
                         + jnp.sum(cols) * jnp.ones((1, lanes), jnp.float32))
                    sink(0, v.reshape(lanes // 128, 128)[:8])
                    return
                if stage == "accbd":
                    cols2 = cols.reshape(4 * tcs, C)  # (t,c) rows
                    cols_bd = jnp.tile(cols2, (1, tcs)) * bd_ref[...]
                    accb = jax.lax.dot_general(
                        cols_bd, alpha.reshape(tcs * C, lanes),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    # accb[(t,c), l] == acc[t, c, l]
                    sink(1, jnp.sum(accb.reshape(4 * tcs, lanes // 128, 128),
                                    axis=0)[:8])
                    return
                acc = jax.lax.dot_general(
                    cols, alpha, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=HI)
                if stage == "acc":
                    sink(2, jnp.sum(acc.reshape(4 * tcs, lanes // 128, 128),
                                    axis=0)[:8])
                    return
                y = jax.lax.dot_general(
                    acc, e1_ref[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                if stage == "spread":
                    sink(3, jnp.sum(y.reshape(4 * lanes, K // 128, 128),
                                    axis=0)[:8])
                    return
                z = (y * mj_ref[...][None]).reshape(
                    4, lanes // rowpad, rowpad, K)
                zi = jnp.sum(z, axis=2)
                r0 = zi.shape[1]
                if r0 < PH_PAD:
                    zi = jnp.concatenate(
                        [zi, jnp.zeros((4, PH_PAD - r0, K), jnp.float32)],
                        axis=1)
                if stage == "fold":
                    sink(0, jnp.sum(zi.reshape(4 * PH_PAD, K // 128, 128),
                                    axis=0))
                    return
                strip = jax.lax.dot_general(
                    zi[:, :PH_PAD, :], p_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                x0 = t * tcs * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + span_pad]
                q_ref[:, 0, :, x0 : x0 + span_pad] = cur + strip

    def run(px, py, rr, gg, bb, radius_px):
        def plane(a, fill):
            if wt == gw:
                return a
            padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
            return jnp.concatenate([a, padc], axis=1)

        planes = [plane(px, sp._FAR), plane(py, sp._FAR), plane(rr, 0.0),
                  plane(gg, 0.0), plane(bb, 0.0)]
        inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
        scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)
        in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))
        q = pl.pallas_call(
            kernel,
            grid=(gh,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((2, lanes), lambda rr: (0, 0)),
                      pl.BlockSpec((tcs, K), lambda rr: (0, 0)),
                      pl.BlockSpec((lanes, K), lambda rr: (0, 0)),
                      pl.BlockSpec((K, span_pad), lambda rr: (0, 0)),
                      pl.BlockSpec((4 * tcs, tcs * C), lambda rr: (0, 0))]
            + [in_block] * 5,
            out_specs=pl.BlockSpec((4, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((4, gh, PH_PAD, WP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )(scal, apix, E1, mj, P, bd_mask, *planes)
        return q

    return run


def timed(label, body):
    loop = jax.jit(lambda: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i), jnp.float32(0)))
    hsync_one(loop())
    t0 = time.perf_counter()
    hsync_one(loop())
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:32s}: {per:7.2f} ms", flush=True)
    return per


rgb_r = jnp.where(live, 0.2, 0.0)
rgb_g = jnp.where(live, 0.5, 0.0)
rgb_b = jnp.where(live, 0.9, 0.0)

for tcs in (32,):
    print(f"--- tcs={tcs} (R={R}) ---", flush=True)
    for stage in ("pair", "acc", "accbd", "spread", "fold", "place"):
        runf = build(stage, tcs)

        def body(i, runf=runf):
            d = 0.003 * jnp.float32(i)
            px = jnp.where(live, ps.px + d, sp._FAR)
            py = jnp.where(live, ps.py + d, sp._FAR)
            q = runf(px, py, rgb_r, rgb_g, rgb_b, jnp.float32(2.0))
            return jnp.sum(q[0, ::37, ::5, ::101])

        timed(stage, body)
