"""Fast-mode stages A/C as plain XLA — can the compiler beat the Pallas mini-matmuls?

protos/mxu_fast_forces.py measured the first-cut Pallas pipeline at 84 ms/1M
(A 21 / B 7.7 / C 23.8 ms) — stages A and C are latency-bound TC=8 batched
[13,C]x[C,13] mini-matmuls.  Their true FLOPs are ~2 G MAC, so the fix is
layout, not math.  Before hand-writing row-major Mosaic kernels, this proto
measures XLA-only formulations where the per-cell contraction is expressed as
an elementwise product + axis reduce (XLA fuses the Chebyshev feature build
into the reduce, so the [nc, C, B] feature tensor is never materialized):

  A  M[n, w, a, b] = sum_c W[n, c, w] * Tu[n, c, a] * Tv[n, c, b]
  C  out[n, c, p]  = sum_{a,b} Tu[n, c, a] * Tv[n, c, b] * L[n, p, a, b]

Variants per stage: 'reduce' (broadcast multiply + .sum) and 'einsum'
(batched contraction over slots / basis).  Run on the real chip:

  python protos/fastmode_xla.py [deg]

MEASURED (2026-08-18, TPU v5 lite, deg 12, 1M particles, C=64 planes, in-jit
x6 protocol):

  A reduce  :  9.16 ms      A einsum  :  8.33 ms
  C reduce  : 13.18 ms      C einsum  :  7.23 ms
  (Pallas TC=8 mini-matmul baseline: A 21.0 ms, C 23.8 ms)

XLA's batched einsums beat the TC=8 Pallas mini-matmuls ~2.5-3x, but ~8 ms per
stage-instance is still ~10x above the arithmetic (the [nc, C, NB] feature
tensors get materialized to HBM between build and contraction).  A full
XLA-only pipeline would be ~30+ ms — no better than the VPU walks.  The
justified next step is the TRANSPOSED row-major Pallas kernel: basis on
sublanes ([256, 512] feature blocks built in VMEM by sublane-broadcast
recurrences), rows = (cell, slot) on lanes, and the per-cell contraction done
as ONE one-hot matmul per 512-row group ([256, 512] x [512, cells*ch] with
K=512 fully used) — FLOPs say ~1-2 ms per stage-instance.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.runtime.timing import hsync_one

DEG = int(sys.argv[1]) if len(sys.argv) > 1 else 12
NB = DEG + 1
SENT = 1.0e6
N = 1_000_000
R = 6
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
H = 9.0


def cheb_feats(t):
    """[..., NB] Chebyshev features of t in [-1, 1] (recurrence, XLA-fused)."""
    cols = [jnp.ones_like(t), t]
    for _ in range(2, NB):
        cols.append(2.0 * t * cols[-1] - cols[-2])
    return jnp.stack(cols[:NB], axis=-1)


def local_uv(px, py, spec):
    gh, gw, C = px.shape
    cy = jnp.arange(gh, dtype=jnp.float32)[:, None, None]
    cx = jnp.arange(gw, dtype=jnp.float32)[None, :, None]
    live = px < 0.5 * SENT
    u = jnp.where(live, 2.0 * (px - spec.x_min - cx * H) / H - 1.0, 0.0)
    v = jnp.where(live, 2.0 * (py - spec.y_min - cy * H) / H - 1.0, 0.0)
    return u, v, live


def main():
    spec = GridSpec.from_bounds(BOUNDS, H, capacity=64)
    kx, ky = jax.random.split(jax.random.key(0))
    pos = jnp.stack(
        [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
         jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
        axis=-1)
    ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
    gh, gw, C = ps.px.shape
    nc = gh * gw
    vx = jnp.where(ps.live, 1.0, 0.0)
    vy = jnp.where(ps.live, -1.0, 0.0)
    one = jnp.where(ps.live, 1.0, 0.0)
    W4 = jnp.stack([one, one, vx, vy], axis=-1)  # [gh, gw, C, 4]
    L = jax.random.normal(jax.random.key(5), (nc, 8, NB, NB), jnp.float32)

    px6 = jnp.stack([ps.px + 0.001 * i for i in range(R)])
    py6 = jnp.stack([ps.py + 0.001 * i for i in range(R)])

    def timed(body, label):
        fn = jax.jit(lambda: jax.lax.fori_loop(0, R, body, jnp.float32(0.0)))
        hsync_one(fn())
        t0 = time.perf_counter()
        hsync_one(fn())
        per = (time.perf_counter() - t0) / R * 1e3
        print(f"  {label:10s}: {per:7.2f} ms", flush=True)

    def feats(i):
        u, v, _ = local_uv(px6[i], py6[i], spec)
        return cheb_feats(u).reshape(nc, C, NB), cheb_feats(v).reshape(nc, C, NB)

    # ---- stage A: moments, 4 weight channels ----
    def a_reduce(i, acc):
        Tu, Tv = feats(i)
        w = W4.reshape(nc, C, 4)
        # [nc, C, 4, NB, NB] product fused into the c-reduce (if XLA cooperates)
        M = jnp.sum(
            w[:, :, :, None, None]
            * Tu[:, :, None, :, None] * Tv[:, :, None, None, :],
            axis=1)
        return acc + jnp.sum(M[::16, :, 0, 0])

    def a_einsum(i, acc):
        Tu, Tv = feats(i)
        w = W4.reshape(nc, C, 4)
        M = jnp.einsum("ncw,nca,ncb->nwab", w, Tu, Tv, optimize=True)
        return acc + jnp.sum(M[::16, :, 0, 0])

    # ---- stage C: eval, 8 output channels ----
    def c_reduce(i, acc):
        Tu, Tv = feats(i)
        out = jnp.sum(
            L[:, None, :, :, :]
            * Tu[:, :, None, :, None] * Tv[:, :, None, None, :],
            axis=(3, 4))  # [nc, C, 8]
        return acc + jnp.sum(out[::16, ::16, 0])

    def c_einsum(i, acc):
        Tu, Tv = feats(i)
        out = jnp.einsum("nca,ncb,npab->ncp", Tu, Tv, L, optimize=True)
        return acc + jnp.sum(out[::16, ::16, 0])

    timed(a_reduce, "A reduce")
    timed(a_einsum, "A einsum")
    timed(c_reduce, "C reduce")
    timed(c_einsum, "C einsum")


if __name__ == "__main__":
    main()
