"""Row-major (transposed) Pallas kernels for fast-mode stages A and C.

The per-cell basis contractions are the fast-mode bottleneck: TC=8 batched
mini-matmuls run at 21-24 ms/stage (protos/mxu_fast_forces.py) and XLA einsums
at 7-9 ms (protos/fastmode_xla.py), both >= 5x above the arithmetic.  This
kernel family fixes the SHAPE:

* rows = (cell, slot) ride the LANES, 512 per group (8 cells x C=64 slots) —
  the flat plane stream reshaped [nrows/512, 512], no gathers;
* the Chebyshev feature matrix PHI^T [256 basis-sublanes, 512 row-lanes] is
  built in VMEM by sublane-broadcast recurrences (13 fmas of [1, 512] for
  Tu/Tv, then 13 [16, 512] products — no lane expansions, no transposes);
* stage A contracts slots-to-cells as ONE dot per group:
  PHI^T [256, 512] x W_onehot [32 = 4ch x 8cells, 512] contracted on lanes
  -> M [256, 32].  K = 512 fully used; the cell routing rides the one-hot.
* stage C is the mirror image: L_g [64 = 8cells x 8out, 256] x PHI^T
  [256, 512] -> Y [64, 512], then 8 masked fmas fold each row's own cell.

Run: python protos/fastmode_rowmajor.py [check|time|both] [deg]

MEASURED (2026-08-18, TPU v5 lite, deg 12, 1M particles, C=64):

  A rowmajor vs einsum rel-max:  5.01e-04
  C rowmajor vs einsum rel-max:  2.29e-03
  A rowmajor (4ch)        :    8.92 ms   (mini-matmul 21.0, XLA einsum 7-9)
  C rowmajor (8 out)      :    7.89 ms   (mini-matmul 23.8)

C is a genuine 3x; A only ties the XLA einsum.  The residual cost is
structural, not schedule: per 512-row group the one-hot cell routing pads the
dot's N dimension with cpg=8 zero-blocks (each row's weight is live in 4 of 32
output columns), and stacking groups on K to widen N burns the same MACs in
zeros — the MXU does ~12x padded work per useful MAC (256/169 basis pad x 8x
cell routing).  Best-known fast-mode end-to-end is now A 8.9 + B 7.7 + C 7.9
~= 24.5 ms vs 28 ms for the exact production VPU walks: ~1.15x for a lossy
kernel family — NOT shippable.  A winning stage A/C needs a formulation whose
cell routing is free (e.g. segmented lane reductions at dot rates, which
Mosaic has no primitive for today).  Recorded as the round-3 fast-mode
conclusion in BASELINE.md.
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
from rust_particle_system_tpu.runtime.timing import hsync_one

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 12
NB = DEG + 1
BPAD = 16  # basis lane-group stride: phi row 16a+b
PHI = 256  # phi sublanes (16 x 16)
LANES = 512  # rows per group = 8 cells x C slots
RG = 8  # groups per program (64 cells)
SENT = 1.0e6
HI = jax.lax.Precision.HIGHEST

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
H = 9.0


def _round_up(x, m):
    return -(-x // m) * m


def _build_phi(u, v):
    """PHI^T [PHI, LANES] from u, v [1, LANES]: row 16a+b = T_a(u) T_b(v)."""
    tu = [jnp.ones_like(u), u]
    tv = [jnp.ones_like(v), v]
    for _ in range(2, NB):
        tu.append(2.0 * u * tu[-1] - tu[-2])
        tv.append(2.0 * v * tv[-1] - tv[-2])
    TvT = jnp.concatenate(tv[:NB], axis=0)  # [NB, LANES]
    zpad3 = jnp.zeros((BPAD - NB, LANES), jnp.float32)
    blocks = []
    for a in range(NB):
        blocks.append(tu[a] * TvT)  # [NB, LANES] sublane-broadcast fma
        blocks.append(zpad3)
    blocks.append(jnp.zeros((PHI - BPAD * NB, LANES), jnp.float32))
    return jnp.concatenate(blocks, axis=0)


def _cell_masks(cpg, C):
    """[cpg, LANES] f32: row c = 1 on the lanes of local cell c."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (cpg, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (cpg, LANES), 0)
    return jnp.where(lane // C == row, 1.0, 0.0)


def _make_a_kernel(nw, C):
    cpg = LANES // C

    def kernel(u_ref, v_ref, *rest):
        w_refs = rest[:nw]
        m_ref = rest[nw]
        maskm = _cell_masks(cpg, C)
        for g in range(RG):
            phi = _build_phi(u_ref[g : g + 1, :], v_ref[g : g + 1, :])
            w_oh = jnp.concatenate(
                [maskm * w_refs[ch][g : g + 1, :] for ch in range(nw)], axis=0
            )  # [nw*cpg, LANES]
            M = jax.lax.dot_general(
                phi, w_oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )  # [PHI, nw*cpg]
            m_ref[:, g * (nw * cpg) : (g + 1) * (nw * cpg)] = M

    return kernel


def _make_c_kernel(npair, C):
    cpg = LANES // C
    lrows = cpg * npair

    def kernel(u_ref, v_ref, l_ref, out_ref):
        maskm = _cell_masks(cpg, C)
        for g in range(RG):
            phi = _build_phi(u_ref[g : g + 1, :], v_ref[g : g + 1, :])
            Lg = l_ref[g * lrows : (g + 1) * lrows, :]  # [cpg*npair, PHI]
            Y = jax.lax.dot_general(
                Lg, phi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )  # [cpg*npair, LANES]
            acc = jnp.zeros((npair, LANES), jnp.float32)
            for c in range(cpg):
                acc = acc + Y[c * npair : (c + 1) * npair, :] * maskm[c : c + 1, :]
            out_ref[g * npair : (g + 1) * npair, :] = acc

    return kernel


def _flat_uv(px, py, spec):
    """u, v, live as flat [nrows_pad] row streams (row = cell*C + slot)."""
    gh, gw, C = px.shape
    nc = gh * gw
    cy = jnp.arange(gh, dtype=jnp.float32)[:, None, None]
    cx = jnp.arange(gw, dtype=jnp.float32)[None, :, None]
    live = px < 0.5 * SENT
    u = jnp.where(live, 2.0 * (px - spec.x_min - cx * H) / H - 1.0, 0.0)
    v = jnp.where(live, 2.0 * (py - spec.y_min - cy * H) / H - 1.0, 0.0)
    return u.reshape(nc * C), v.reshape(nc * C), live.reshape(nc * C)


def _blocked(flat, nrows_pad):
    n = flat.shape[0]
    if nrows_pad > n:
        flat = jnp.concatenate([flat, jnp.zeros((nrows_pad - n,), jnp.float32)])
    return flat.reshape(nrows_pad // LANES, LANES)


def moments_rowmajor(u, v, weights, C, interpret=False):
    """M [nc_pad, nw, PHI] from flat u/v/w rows.  nc_pad = 64-cell multiple."""
    nw = len(weights)
    cpg = LANES // C
    nrows = u.shape[0]
    nrows_pad = _round_up(nrows, RG * LANES)
    nblk = nrows_pad // (RG * LANES)
    ins = [_blocked(x, nrows_pad) for x in (u, v, *weights)]
    blk = pl.BlockSpec((RG, LANES), lambda b: (b, 0))
    ncols = nw * cpg * RG
    m = pl.pallas_call(
        _make_a_kernel(nw, C),
        grid=(nblk,),
        in_specs=[blk] * (2 + nw),
        out_specs=pl.BlockSpec((PHI, ncols), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * PHI, ncols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*ins)
    # columns: g*(nw*cpg) + ch*cpg + c ; cell = blk*RG*cpg + g*cpg + c
    m = m.reshape(nblk, PHI, RG, nw, cpg)
    m = jnp.transpose(m, (0, 2, 4, 3, 1))  # [nblk, RG, cpg, nw, PHI]
    return m.reshape(nblk * RG * cpg, nw, PHI)


def evaluate_rowmajor(u, v, L, C, interpret=False):
    """out [npair, nrows_pad] from flat u/v and L [nc_pad, npair, PHI]."""
    nc_pad, npair, _ = L.shape
    cpg = LANES // C
    nrows = u.shape[0]
    nrows_pad = _round_up(nrows, RG * LANES)
    nblk = nrows_pad // (RG * LANES)
    assert nc_pad == nblk * RG * cpg
    ub, vb = _blocked(u, nrows_pad), _blocked(v, nrows_pad)
    lrows_per_prog = RG * cpg * npair
    Lb = L.reshape(nblk * lrows_per_prog, PHI)
    blk = pl.BlockSpec((RG, LANES), lambda b: (b, 0))
    out = pl.pallas_call(
        _make_c_kernel(npair, C),
        grid=(nblk,),
        in_specs=[blk, blk,
                  pl.BlockSpec((lrows_per_prog, PHI), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((RG * npair, LANES), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * RG * npair, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ub, vb, Lb)
    # rows: blk*(RG*npair) + g*npair + p ; row-group lane base blk*RG*LANES + g*LANES
    out = out.reshape(nblk, RG, npair, LANES)
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(npair, nrows_pad)
    return out


# ---------------------------------------------------------------------------


def cheb_feats(t):
    cols = [jnp.ones_like(t), t]
    for _ in range(2, NB):
        cols.append(2.0 * t * cols[-1] - cols[-2])
    return jnp.stack(cols[:NB], axis=-1)


def main():
    spec = GridSpec.from_bounds(BOUNDS, H, capacity=64)
    C = spec.capacity
    kx, ky = jax.random.split(jax.random.key(0))
    pos = jnp.stack(
        [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
         jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
        axis=-1)
    ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
    gh, gw, _ = ps.px.shape
    nc = gh * gw
    u, v, live = _flat_uv(ps.px, ps.py, spec)
    lf = jnp.where(live, 1.0, 0.0)
    vxf = jnp.where(live, 1.0, 0.0)
    vyf = jnp.where(live, -1.0, 0.0)
    weights = [lf, lf * 0.5, vxf, vyf]
    nw = len(weights)
    npair = 8
    nrows = nc * C
    nrows_pad = _round_up(nrows, RG * LANES)
    nc_pad = nrows_pad // C
    key = jax.random.key(5)
    L = jax.random.normal(key, (nc_pad, npair, PHI), jnp.float32)
    # zero the padded basis rows so the reference (which only sums NB x NB)
    # and the kernel (which hits all 256 phi rows, padded rows = 0) agree
    mask = np.zeros((PHI,), np.float32)
    for a in range(NB):
        mask[a * BPAD : a * BPAD + NB] = 1.0
    L = L * jnp.asarray(mask)[None, None, :]

    if MODE in ("check", "both"):
        M = jax.jit(lambda u, v: moments_rowmajor(u, v, weights, C))(u, v)
        # einsum reference
        Tu = cheb_feats(u.reshape(nc, C))
        Tv = cheb_feats(v.reshape(nc, C))
        Wr = jnp.stack([w.reshape(nc, C) for w in weights], axis=-1)
        Mref = jnp.einsum("ncw,nca,ncb->nwab", Wr, Tu, Tv)
        Mk = M[:nc].reshape(nc, nw, BPAD, BPAD)[:, :, :NB, :NB]
        err = float(jnp.max(jnp.abs(Mk - Mref)) / jnp.max(jnp.abs(Mref)))
        print(f"  A rowmajor vs einsum rel-max: {err:9.2e}", flush=True)

        out = jax.jit(lambda u, v: evaluate_rowmajor(u, v, L, C))(u, v)
        Lr = L[:nc].reshape(nc, npair, BPAD, BPAD)[:, :, :NB, :NB]
        oref = jnp.einsum("nca,ncb,npab->npc", Tu, Tv, Lr)
        ok = out[:, :nrows].reshape(npair, nc, C)
        err = float(jnp.max(jnp.abs(ok - oref.transpose(1, 0, 2)))
                    / jnp.max(jnp.abs(oref)))
        print(f"  C rowmajor vs einsum rel-max: {err:9.2e}", flush=True)

    if MODE in ("time", "both"):
        R = 6
        u6 = jnp.stack([u + 1e-4 * i for i in range(R)])
        v6 = jnp.stack([v + 1e-4 * i for i in range(R)])

        def timed(body, label):
            fn = jax.jit(
                lambda: jax.lax.fori_loop(0, R, body, jnp.float32(0.0)))
            hsync_one(fn())
            t0 = time.perf_counter()
            hsync_one(fn())
            per = (time.perf_counter() - t0) / R * 1e3
            print(f"  {label:24s}: {per:7.2f} ms", flush=True)

        def a_body(i, acc):
            M = moments_rowmajor(u6[i], v6[i], weights, C)
            return acc + jnp.sum(M[::64, 0, ::64])

        def c_body(i, acc):
            out = evaluate_rowmajor(u6[i], v6[i], c_body.L, C)
            return acc + jnp.sum(out[:, ::1024])

        def timed_c():
            # L must be a jit ARGUMENT: closed over, its 200+ MB becomes an
            # HLO literal and the remote compile request 413s.
            def fn(Larg):
                def body(i, acc):
                    out = evaluate_rowmajor(u6[i], v6[i], Larg, C)
                    return acc + jnp.sum(out[:, ::1024])
                return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
            jfn = jax.jit(fn)
            hsync_one(jfn(L))
            t0 = time.perf_counter()
            hsync_one(jfn(L))
            per = (time.perf_counter() - t0) / R * 1e3
            print(f"  {'C rowmajor (8 out)':24s}: {per:7.2f} ms", flush=True)

        timed(a_body, "A rowmajor (4ch)")
        timed_c()


if __name__ == "__main__":
    main()
