"""bf16 pair-math probe — the round-2 lever, unblocked by a toolchain update.

Round-2/3 recorded: the force walks are ISSUE-bound (a 7-op minimal body times
at 8.6 ms vs 33 for the ~30-op full body), so bf16 — half the vregs per op —
is the recorded ~2x lever, but Mosaic rejected tpu.reshape of bf16 broadcast
vectors.  Round-4 retest: protos/bf16_repro.py now COMPILES.  This probe
measures what bf16 actually buys inside the production pair bodies.

Numerically safe split: dx/dy/d2 stay f32 (world-scale coords — bf16 ulp at
x~1000 is 8 units, and the subtraction is catastrophic-cancellation
territory), the POLYNOMIAL tail (v, vv, u3, mag, pair products — most of the
ops) runs in bf16, and the deferred accumulators stay f32 (the bf16->f32
widen rides the per-offset fold).  Variants:

    f32      production bodies (baseline)
    bf16v1   poly tail bf16, accumulate f32
    bf16v2   like v1 but accumulate bf16 partials per offset (error bound probe)

Reports walk time AND max abs/rel deviation of (nvx, nvy) vs the f32 walk on
the same state — the accuracy budget for an opt-in reduced-precision mode.

Usage: python protos/time_forces5.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import rust_particle_system_tpu.ops.pallas.sph as sphmod
from rust_particle_system_tpu.core.params import make_params
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
)
from rust_particle_system_tpu.ops.pallas.sph_step import _forces_from_cells
from rust_particle_system_tpu.runtime.timing import hsync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
R = 32

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1, pack2=True)
params = make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)

BF = jnp.bfloat16

# ---------------------------------------------------------------------------
# bf16 pair bodies (structure mirrors ops/pallas/sph.py).
# ---------------------------------------------------------------------------

_f32_density = sphmod._density_update
_f32_force = sphmod._force_update


def density_bf16(scal, own, nbrs, accs):
    h = scal[0]
    (ox, oy), (nx, ny) = own, nbrs
    dx = nx[:, None, :] - ox[:, :, None]
    dy = ny[:, None, :] - oy[:, :, None]
    d2 = dx * dx + dy * dy
    d = jnp.sqrt(d2).astype(BF)
    v = jnp.maximum(h.astype(BF) - d, BF(0.0))
    vv = v * v
    s2, s3 = accs
    if s2.ndim == 3:
        return s2 + vv.astype(jnp.float32), s3 + (vv * v).astype(jnp.float32)
    return (s2 + jnp.sum(vv.astype(jnp.float32), axis=-1),
            s3 + jnp.sum((vv * v).astype(jnp.float32), axis=-1))


def force_bf16(scal, own, nbrs, accs):
    h, eps2 = scal[0], scal[1]
    ox, oy, oP1, _ovx, _ovy, oNPo = own[0], own[1], own[2], own[4], own[5], own[6]
    nx, ny, nP1, nNPn, nvx, nvy = nbrs

    dxf = nx[:, None, :] - ox[:, :, None]
    dyf = ny[:, None, :] - oy[:, :, None]
    d2 = dxf * dxf + dyf * dyf
    near0 = d2 <= eps2
    inv_d = jnp.where(near0, 0.0, jax.lax.rsqrt(d2)).astype(BF)
    dx = dxf.astype(BF)
    dy = dyf.astype(BF)
    d = (d2 * jnp.where(near0, 0.0, jax.lax.rsqrt(d2))).astype(BF)
    hb = h.astype(BF)
    v = jnp.maximum(hb - d, BF(0.0))
    vv = v * v

    # TOOLCHAIN RULE (round-4 bisect, /tmp/bf16_shape2.py): adding an axis to
    # an ALREADY-bf16 array crashes the compile helper (the round-2/3
    # bf16-reshape bug class, now a subprocess crash instead of a graceful
    # reject); newaxis FIRST in f32, THEN cast, compiles fine.
    pt = oP1[:, :, None].astype(BF) + nP1[:, None, :].astype(BF)
    nt = oNPo[:, :, None].astype(BF) + nNPn[:, None, :].astype(BF)
    mag = pt * v + nt * vv
    m = mag * inv_d

    u = jnp.maximum((h * h).astype(BF) - d2.astype(BF), BF(0.0))
    u3 = u * u * u

    fx, fy, S, Sx, Sy = accs
    f32 = lambda t: t.astype(jnp.float32)
    if fx.ndim == 3:
        fx = fx + f32(dx * m)
        fy = fy + f32(dy * m + jnp.where(near0, mag, BF(0.0)))
        S = S + f32(u3)
        Sx = Sx + f32(nvx[:, None, :].astype(BF) * u3)
        Sy = Sy + f32(nvy[:, None, :].astype(BF) * u3)
        return fx, fy, S, Sx, Sy
    fx = fx + jnp.sum(f32(dx * m), axis=-1)
    fy = fy + jnp.sum(f32(dy * m + jnp.where(near0, mag, BF(0.0))), axis=-1)
    S = S + jnp.sum(f32(u3), axis=-1)
    Sx = Sx + jnp.sum(f32(nvx[:, None, :].astype(BF) * u3), axis=-1)
    Sy = Sy + jnp.sum(f32(nvy[:, None, :].astype(BF) * u3), axis=-1)
    return fx, fy, S, Sx, Sy


def uniform_init(key, n, bounds):
    x_min, x_max, y_min, y_max = bounds
    kx, ky = jax.random.split(key)
    pos = jnp.stack(
        [jax.random.uniform(kx, (n,), minval=x_min, maxval=x_max),
         jax.random.uniform(ky, (n,), minval=y_min, maxval=y_max)], axis=-1)
    return make_state(pos)


hsync(jnp.zeros((8,)) + 1.0)
ps0 = plane_state_from_particles(uniform_init(jax.random.key(0), N, BOUNDS),
                                 spec)
live = ps0.px < 0.5 * SENTINEL
px8, py8, vx8, vy8 = ps0.px, ps0.py, ps0.vx, ps0.vy


def run_once():
    fn = jax.jit(lambda: _forces_from_cells(px8, py8, vx8, vy8, spec, params,
                                            False))
    nvx, nvy = fn()
    return np.asarray(nvx), np.asarray(nvy)


def time_walks(label):
    def body(base):
        def one(i, acc):
            eps = 0.003 * jnp.float32(i) + base
            fpx = jnp.where(live, px8 + eps, SENTINEL)
            fpy = jnp.where(live, py8 + eps, SENTINEL)
            nvx, nvy = _forces_from_cells(fpx, fpy, vx8, vy8, spec, params,
                                          False)
            return acc + jnp.sum(nvx[::16, ::16, 0])
        return one

    fn = jax.jit(lambda base: jax.lax.fori_loop(0, R, body(base),
                                                jnp.float32(0)))
    hsync(fn(jnp.float32(0.0)))
    t0 = time.perf_counter()
    hsync(fn(jnp.float32(0.0101)))
    print(f"  {label}: {(time.perf_counter() - t0) / R * 1e3:.2f} ms",
          flush=True)


print(f"n={N} grid {spec.gh}x{spec.gw} C=64 pack2 "
      f"CHUNK_SPLITS={sphmod.CHUNK_SPLITS}", flush=True)

print("f32 (production)", flush=True)
nvx0, nvy0 = run_once()
time_walks("f32")

sphmod._density_update = density_bf16
sphmod._force_update = force_bf16
print("bf16v1 (poly tail bf16, f32 accs)", flush=True)
try:
    nvx1, nvy1 = run_once()
    lv = np.asarray(live)
    scale = np.abs(nvx0[lv]).max()
    err = max(np.abs(nvx1[lv] - nvx0[lv]).max(),
              np.abs(nvy1[lv] - nvy0[lv]).max())
    print(f"  max |dv| = {err:.4g}  (vmax {scale:.4g}, rel {err/scale:.2e})",
          flush=True)
    time_walks("bf16v1")
except Exception as e:  # noqa: BLE001
    print(f"  FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
finally:
    sphmod._density_update = _f32_density
    sphmod._force_update = _f32_force
