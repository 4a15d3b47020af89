"""Time rebin v4 (separable hole-fill) on TPU at 1M scale, vs v3 and the 19.1 ms
stream pipeline it replaces.

Usage: python protos/time_rebin_v4.py [C] [variant] [drift]
Defaults C=64, variant=4, drift=1.3 (units; CFL-scale per-frame movement).
"""

import sys
import time

import jax
import jax.numpy as jnp

from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL, rebin_planes
from rust_particle_system_tpu.runtime.timing import hsync

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
variant = int(sys.argv[2]) if len(sys.argv) > 2 else 4
drift_amp = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

import rust_particle_system_tpu.ops.pallas.rebin as rb

if len(sys.argv) > 4:  # suba,bc,prec e.g. 16,256,high
    suba, bc, prec = sys.argv[4].split(",")
    rb.V4_SUBA = int(suba)
    rb.V4_BC = int(bc)
    rb.V4_PRECISION = {"high": jax.lax.Precision.HIGH,
                       "highest": jax.lax.Precision.HIGHEST,
                       "default": jax.lax.Precision.DEFAULT}[prec]
print(f"knobs: suba={rb.V4_SUBA} bc={rb.V4_BC} prec={rb.V4_PRECISION}", flush=True)

spec = GridSpec(x_min=-960.0, y_min=-540.0, cell_size=9.0, gw=214, gh=121,
                capacity=C)
gh, gw = spec.gh, spec.gw
nc = gh * gw
k = 5  # (x, y, vx, vy, ids)
frac = min(1_000_000 / (nc * C), 1.0)

kx, ky = jax.random.split(jax.random.key(0))
base_x = jax.random.uniform(kx, (gh, gw, C), minval=0.0, maxval=9.0)
base_y = jax.random.uniform(ky, (gh, gw, C), minval=0.0, maxval=9.0)
ox = spec.x_min + jnp.arange(gw)[None, :, None] * 9.0
oy = spec.y_min + jnp.arange(gh)[:, None, None] * 9.0
live = jax.random.uniform(jax.random.key(2), (gh, gw, C)) < frac
drift = jax.random.uniform(jax.random.key(3), (2, gh, gw, C),
                           minval=-drift_amp, maxval=drift_amp)
px = jnp.where(live, base_x + ox + drift[0], SENTINEL)
py = jnp.where(live, base_y + oy + drift[1], SENTINEL)
extra = [jax.random.normal(jax.random.key(10 + i), (gh, gw, C))
         for i in range(k - 2)]
planes = [px, py] + extra
moved = jnp.sum(live & ((jnp.abs(drift[0] + base_x - 4.5) > 4.5)
                        | (jnp.abs(drift[1] + base_y - 4.5) > 4.5)))
print(f"grid {gh}x{gw} C={C} live={int(live.sum())} movers~{int(moved)} "
      f"variant={variant}", flush=True)

fn = jax.jit(lambda ps: rebin_planes(ps, spec, interpret=False,
                                     variant=variant)[0][0])
t0 = time.perf_counter()
hsync(fn(planes))
print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

R = 8
ps8 = [jnp.stack([p + (0.001 * i if c >= 2 else 0.0) for i in range(R)])
       for c, p in enumerate(planes)]
loop = jax.jit(lambda ps8: jax.lax.fori_loop(
    0, R,
    lambda i, acc: acc + jnp.sum(
        rebin_planes([p[i] for p in ps8], spec, interpret=False,
                     variant=variant)[0][0][::32, ::32]),
    jnp.float32(0)))
hsync(loop(ps8))
t0 = time.perf_counter()
hsync(loop(ps8))
per = (time.perf_counter() - t0) / R * 1e3
print(f"v{variant} rebin @ {nc} cells / C={C} / k={k}: {per:.2f} ms "
      f"(v3: 20.85; replaces stream glue 19.1)", flush=True)
