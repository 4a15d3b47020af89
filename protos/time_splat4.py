"""Honest production-splat timing at LARGE in-jit R (the R=8 protocol carries a
~26 ms fixed dispatch overhead -> +3.3 ms/iter bias; R=64 here).

Splits the margin-3 production path (render_plane_state geometry: 15x15 patch,
16-lane rows, 256 lanes) into:
  pair-only   alpha math + acc dot, patches written out (no placement)
  full        splat_from_planes e2e (kernel + y-fold XLA adds)

Usage: python protos/time_splat4.py [R]
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

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
H, W = RS.height, RS.width
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)
gh, gw, C = spec.gh, spec.gw, spec.capacity
m = 3
sx = sy = 9
ph = pw = sx + 2 * m
ROWPAD = 16
LANES = -(-ph * ROWPAD // 128) * 128

kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * _FAR
vx = jnp.where(live, 30.0, 0.0)
vy = jnp.where(live, -12.0, 0.0)
print(f"grid {gh}x{gw} C={C} margin={m} lanes={LANES}", flush=True)


def timed(label, body):
    """body(i) -> scalar; in-jit fori over R jittered iterations, one pull."""
    loop = jax.jit(lambda: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body(i), jnp.float32(0)))
    hsync_one(loop())
    t0 = time.perf_counter()
    hsync_one(loop())
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:40s}: {per:7.2f} ms", flush=True)
    return per


def jostle(i):
    d = 0.003 * jnp.float32(i)
    px = jnp.where(live, ps.px + d, _FAR)
    py = jnp.where(live, ps.py + d, _FAR)
    return px, py


def full(i):
    px, py = jostle(i)
    img = splat_from_planes(
        px, py, vx, vy, live, 2.0, 300.0, bounds_static=BOUNDS, grid_spec=spec,
        render_spec=RS, interpret=False, margin=m)
    return jnp.sum(img[::97, ::101, 0])


# ---- pair math + acc dot only (patches out, no placement) ----
x_min, x_max, y_min, y_max = BOUNDS
lidx = np.arange(LANES)
li, lj = lidx // ROWPAD, lidx % ROWPAD
ldead = (li >= ph) | (lj >= pw)
apix = jnp.asarray(np.stack([np.where(ldead, -_FAR, lj + 0.5),
                             np.where(ldead, -_FAR, li + 0.5)]), jnp.float32)


def make_pair_kernel(tc):
    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref, out_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        t = pl.program_id(0)
        cell = (t * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
                ).astype(jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        qx = px_ref[:] - (cx * sx - m)
        qy = py_ref[:] - (H - (cy + 1.0) * sy - m)
        dx = qx[:, :, None] - apix_ref[0][None, None, :]
        dy = qy[:, :, None] - apix_ref[1][None, None, :]
        dist = jnp.sqrt(dx * dx + dy * dy)
        tt = jnp.clip((dist - 0.8 * radius) * inv_w, 0.0, 1.0)
        alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
        alpha = jnp.where(alpha < 0.01, 0.0, alpha)
        cols = jnp.stack([r_ref[:], g_ref[:], b_ref[:],
                          jnp.ones_like(r_ref[:])], axis=1)
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[...] = acc

    return kernel


def pair_only(i, tc=16, do_acc=True):
    px, py = jostle(i)
    ppx = jnp.where(live, (px - x_min) * 1.0, _FAR)
    ppy = jnp.where(live, (y_max - py) * 1.0, _FAR)
    r = jnp.where(live, 0.5, 0.0)
    nc = gh * gw
    nc_pad = -(-nc // tc) * tc

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    radius_px = 2.0
    inv_w = 1.0 / max(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([jnp.float32(radius_px), jnp.float32(inv_w)])
    block = pl.BlockSpec((tc, C), lambda t: (t, 0))
    res = pl.pallas_call(
        make_pair_kernel(tc),
        grid=(nc_pad // tc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2, LANES), lambda t: (0, 0))] + [block] * 5,
        out_specs=pl.BlockSpec((tc, 4, LANES), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nc_pad, 4, LANES), jnp.float32),
        interpret=False,
    )(scal, apix, flat(ppx, _FAR), flat(ppy, _FAR), flat(r, 0.0),
      flat(r, 0.0), flat(r, 0.0))
    return jnp.sum(res[::31, 3, ::17])


timed("production splat_from_planes m=3", full)
timed("pair+acc only (tc=16)", lambda i: pair_only(i, 16))
timed("pair+acc only (tc=32)", lambda i: pair_only(i, 32))
