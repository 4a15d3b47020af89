"""MXU poly-kernel fast-mode prototype (the GO branch of the round-2 go/no-go).

The moment-transfer (FMM M2L) pipeline for the OPT-IN poly-kernel SPH family
(kernel-spec freedom recorded in BASELINE.md): pair functions polynomial in d^2
factor through a tensor-Chebyshev basis to fit error ~3.6e-3 at degree 12
(protos/mxu_moments_fit.py), turning the O(n*768) VPU pair walks into:

  A. moments   M_c[cell, a, b] = sum_slots w_c * T_a(u) T_b(v)
               — per tile this is a batched [13, C] x [C, 13] mini-matmul per
               weight channel; the Chebyshev recurrences are 13 [tc, C] fmas.
  B. transfers L = sum_offsets C_o @ M_shift(o)
               — 9 dense [169, 169] matmuls per cell per (function, channel):
               the MXU FLOP body, pure XLA einsum (no pallas needed).
  C. eval      E[slot] = Phi(slot)^T L[cell]
               — contract b with a batched [13,13] x [C,13] dot, then 13 fmas
               against the cached T_a(u) columns.

Fast family (Muller-style poly6; h = cell size):
  u3  = (h^2-d^2)+^3         density kernel AND viscosity weight
  dxu2 = dx*(h^2-d^2)+^2     pressure gradient x (dyu2 likewise)
  rho_i = sum_j u3;  P~_i = k*(rho_i - rho0)/rho_i^2
  fpress_i = sum_j (P~_i + P~_j) * (dx, dy) * u2   (self-pair contributes 0)
  fvisc_i  = nu * (sum_j v_j u3 - v_i sum_j u3)    (self cancels exactly)

(f, c) transfer channels: pass 1: (u3, 1) -> rho.
pass 2: (u3, vx), (u3, vy), (u3, 1), (dxu2, 1), (dxu2, P~), (dyu2, 1),
(dyu2, P~) -> 7.

THIS SCRIPT measures (a) per-stage + end-to-end ms at 1M on the real chip vs
the production VPU walks, (b) force accuracy vs a dense plane-walk oracle of
the SAME family at 30k.  Trajectory divergence over frames is the round-4
integration step.

Usage: python protos/mxu_fast_forces.py [check|time|both|stages] [deg]

MEASURED (2026-08-18, TPU v5 lite, deg 12, 1M particles, C=64 planes):

  check (30k, vs the dense plane-walk oracle of the same poly family):
    rho : rel-max 1.4e-04   fx/fy : rel-max 3.0e-3/3.3e-3   fvx/fvy : ~1.1e-4
    — matches the fit study (protos/mxu_moments_fit.py): pressure error is the
    degree-12 side-offset fit floor; density/viscosity ride the 2e-5-by-deg-20
    family and are limited here by degree 12.

  time: fast-mode forces @1M: 84.4 ms END-TO-END (production VPU walks: ~28 ms)
  stages (pass 2 = 4 moment channels, 7 transfer pairs, 7 eval outputs):
    A moments 21.0 ms | B transfers 7.7 ms | C evals 23.8 ms
    — A and C are LATENCY-bound, not FLOP-bound: TC=8 cells/program of
    [13, C] x [C, 13] batched mini-matmuls is the round-2 "batched small-k MXU
    reductions" trap all over again (total stage FLOPs are ~2 G MAC, <1 ms of
    MXU at v5e rates).  B's 63 [nc,256]x[256,256] einsums at HIGHEST are ~14
    T-MAC/s — acceptable, relaxable (coefficient passthrough may not need
    HIGHEST).  CONCLUSION: the formulation stands (B, the only stage whose cost
    scales with basis^2, is cheap); stages A/C need a row-major reformulation
    with basis on lanes and (cell, slot) rows on sublanes — elementwise
    multiply + lane reduce, no per-cell mini-matmuls.  That is the follow-up
    kernel (fastmode row-major), not a go/no-go change.
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
BPAD = 16  # (a, b) stored as [16, 16] sublane x lane blocks; lanes 16*16=256
SENT = 1.0e6
TC = 8

# ---------------------------------------------------------------------------
# transfer-matrix setup (numpy Chebyshev interpolation, once)
# ---------------------------------------------------------------------------


def cheb_nodes(n):
    return np.cos(np.pi * (np.arange(n) + 0.5) / n)


def dct_coeffs(vals):
    from scipy.fft import dct

    c = vals
    for ax in range(vals.ndim):
        c = dct(c, type=2, axis=ax) / vals.shape[ax]
    for ax in range(vals.ndim):
        sl = [slice(None)] * vals.ndim
        sl[ax] = 0
        c[tuple(sl)] *= 0.5
    return c


def build_transfers(h: float):
    """C_pad[f, o, 256, 256]: 4D Cheb coefficient tensors, padded to the
    [16a+b] lane layout.  f in (u3, dxu2, dyu2); o enumerates the 3x3 offsets."""
    g = cheb_nodes(NB)
    loc = 0.5 * (g + 1.0)  # cell-local in [0, 1] (units of h)
    out = np.zeros((3, 9, 256, 256), np.float32)
    for oi, (oy, ox) in enumerate([(dy, dx) for dy in (-1, 0, 1)
                                   for dx in (-1, 0, 1)]):
        XI, YI, XJ, YJ = np.meshgrid(loc, loc, ox + loc, oy + loc,
                                     indexing="ij")
        dx = (XJ - XI) * h
        dy = (YJ - YI) * h
        u = np.maximum(h * h - dx * dx - dy * dy, 0.0)
        vals = {0: u ** 3, 1: dx * u * u, 2: dy * u * u}
        for f, v in vals.items():
            c = dct_coeffs(v.copy())  # [a, b, ce...] = [NB, NB, NB, NB]
            cp = np.zeros((16, 16, 16, 16), np.float32)
            cp[:NB, :NB, :NB, :NB] = c
            out[f, oi] = cp.reshape(256, 256)
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# Stage A: moments (pallas)
# ---------------------------------------------------------------------------


def _cheb_cols(t):
    """List of NB Chebyshev columns T_k(t), each [tc, C] (t in [-1, 1])."""
    cols = [jnp.ones_like(t), t]
    for _ in range(2, NB):
        cols.append(2.0 * t * cols[-1] - cols[-2])
    return cols[:NB]


def make_moment_kernel(gw, h, x_min, y_min, n_w):
    def kernel(px_ref, py_ref, *rest):
        w_refs = rest[:n_w]
        m_ref = rest[n_w]
        t = pl.program_id(0)
        cell = (t * TC + jax.lax.broadcasted_iota(jnp.int32, (TC, 1), 0)
                ).astype(jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        px = px_ref[...]
        py = py_ref[...]
        live = px < 0.5 * SENT
        u = jnp.where(live, 2.0 * (px - x_min - cx * h) / h - 1.0, 0.0)
        v = jnp.where(live, 2.0 * (py - y_min - cy * h) / h - 1.0, 0.0)
        Tu = _cheb_cols(u)  # NB x [TC, C]
        Tv = jnp.stack(_cheb_cols(v), axis=-1)  # [TC, C, NB]
        m_ref[...] = jnp.zeros((TC, n_w, BPAD, BPAD), jnp.float32)
        for c in range(n_w):
            w = jnp.where(live, w_refs[c][...], 0.0)
            A = jnp.stack([w * tk for tk in Tu], axis=1)  # [TC, NB, C]
            M = jax.lax.dot_general(
                A, Tv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [TC, NB, NB]
            m_ref[:, c, :NB, :NB] = M

    return kernel


def moments(px, py, weights, spec, h):
    gh, gw, C = px.shape
    nc = gh * gw
    nc_pad = -(-nc // TC) * TC
    n_w = len(weights)

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    block = pl.BlockSpec((TC, C), lambda t: (t, 0))
    out_spec = pl.BlockSpec((TC, n_w, BPAD, BPAD), lambda t: (t, 0, 0, 0))
    m = pl.pallas_call(
        make_moment_kernel(gw, h, float(spec.x_min), float(spec.y_min), n_w),
        grid=(nc_pad // TC,),
        in_specs=[block] * (2 + n_w),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nc_pad, n_w, BPAD, BPAD), jnp.float32),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(flat(px, SENT), flat(py, SENT), *[flat(w, 0.0) for w in weights])
    return m[:nc].reshape(gh, gw, n_w, BPAD * BPAD)


# ---------------------------------------------------------------------------
# Stage B: transfers (XLA einsum over shifted moment planes)
# ---------------------------------------------------------------------------


def transfers(M, pairs, Cs):
    """M [gh, gw, n_w, 256]; pairs = list of (f, c) output channels.
    Returns L [gh, gw, n_pairs, 256]."""
    gh, gw = M.shape[:2]
    padded = jnp.pad(M, ((1, 1), (1, 1), (0, 0), (0, 0)))
    L = jnp.zeros((gh, gw, len(pairs), 256), jnp.float32)
    for oi, (oy, ox) in enumerate([(dy, dx) for dy in (-1, 0, 1)
                                   for dx in (-1, 0, 1)]):
        Mo = padded[1 + oy : 1 + oy + gh, 1 + ox : 1 + ox + gw]
        for pi, (f, c) in enumerate(pairs):
            L = L.at[:, :, pi, :].add(
                jnp.einsum("gwB,aB->gwa", Mo[:, :, c, :], Cs[f, oi],
                           precision=jax.lax.Precision.HIGHEST))
    return L


# ---------------------------------------------------------------------------
# Stage C: eval (pallas)
# ---------------------------------------------------------------------------


def make_eval_kernel(gw, h, x_min, y_min, n_pairs):
    def kernel(px_ref, py_ref, l_ref, *outs):
        t = pl.program_id(0)
        cell = (t * TC + jax.lax.broadcasted_iota(jnp.int32, (TC, 1), 0)
                ).astype(jnp.float32)
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        px = px_ref[...]
        py = py_ref[...]
        live = px < 0.5 * SENT
        u = jnp.where(live, 2.0 * (px - x_min - cx * h) / h - 1.0, 0.0)
        v = jnp.where(live, 2.0 * (py - y_min - cy * h) / h - 1.0, 0.0)
        Tu = _cheb_cols(u)
        Tv = jnp.stack(_cheb_cols(v), axis=-1)  # [TC, C, NB]
        for pi in range(n_pairs):
            Lp = l_ref[:, pi, :NB, :NB]  # [TC, NB(a), NB(b)]
            Y = jax.lax.dot_general(
                Lp, Tv, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [TC, NB(a), C]
            acc = jnp.zeros_like(px)
            for a in range(NB):
                acc = acc + Tu[a] * Y[:, a, :]
            outs[pi][...] = jnp.where(live, acc, 0.0)

    return kernel


def evaluate(px, py, L, spec, h, n_pairs):
    gh, gw, C = px.shape
    nc = gh * gw
    nc_pad = -(-nc // TC) * TC

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    Lr = L.reshape(nc, n_pairs, BPAD, BPAD)
    if nc_pad > nc:
        Lr = jnp.concatenate(
            [Lr, jnp.zeros((nc_pad - nc, n_pairs, BPAD, BPAD), jnp.float32)])
    block = pl.BlockSpec((TC, C), lambda t: (t, 0))
    lblock = pl.BlockSpec((TC, n_pairs, BPAD, BPAD), lambda t: (t, 0, 0, 0))
    outs = pl.pallas_call(
        make_eval_kernel(gw, h, float(spec.x_min), float(spec.y_min), n_pairs),
        grid=(nc_pad // TC,),
        in_specs=[block, block, lblock],
        out_specs=tuple([block] * n_pairs),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nc_pad, C), jnp.float32)] * n_pairs),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(flat(px, SENT), flat(py, SENT), Lr)
    return tuple(o[:nc].reshape(gh, gw, C) for o in outs)


# ---------------------------------------------------------------------------
# Full fast-mode force pass
# ---------------------------------------------------------------------------

K_PRESS = 800.0
RHO0 = 8.0
NU = 0.5


def fast_forces(px, py, vx, vy, spec, h, Cs):
    live = px < 0.5 * SENT
    one = jnp.where(live, 1.0, 0.0)
    # pass 1: density
    M1 = moments(px, py, [one], spec, h)
    L1 = transfers(M1, [(0, 0)], Cs)
    (rho,) = evaluate(px, py, L1, spec, h, 1)
    rho = jnp.maximum(rho, 1e-6)
    pt = jnp.where(live, K_PRESS * (rho - RHO0) / (rho * rho), 0.0)
    # pass 2: forces
    M2 = moments(px, py, [one, pt, vx, vy], spec, h)
    pairs = [(1, 0), (1, 1), (2, 0), (2, 1), (0, 0), (0, 2), (0, 3)]
    L2 = transfers(M2, pairs, Cs)
    ex1, exp_, ey1, eyp, eu1, euvx, euvy = evaluate(px, py, L2, spec, h, 7)
    fx = pt * ex1 + exp_
    fy = pt * ey1 + eyp
    fvx = NU * (euvx - vx * eu1)
    fvy = NU * (euvy - vy * eu1)
    return rho, fx, fy, fvx, fvy


# ---------------------------------------------------------------------------
# dense plane-walk oracle (same poly family, exact)
# ---------------------------------------------------------------------------


def oracle_forces(px, py, vx, vy, h):
    gh, gw, C = px.shape
    live = px < 0.5 * SENT
    pxp = jnp.pad(px, ((1, 1), (1, 1), (0, 0)), constant_values=SENT)
    pyp = jnp.pad(py, ((1, 1), (1, 1), (0, 0)), constant_values=SENT)
    vxp = jnp.pad(vx, ((1, 1), (1, 1), (0, 0)))
    vyp = jnp.pad(vy, ((1, 1), (1, 1), (0, 0)))

    def neigh(pl_):
        return [pl_[1 + dy : 1 + dy + gh, 1 + dx : 1 + dx + gw]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def accum(weight_fn):
        acc = 0.0
        for nx, ny, nvx, nvy in zip(neigh(pxp), neigh(pyp), neigh(vxp),
                                    neigh(vyp)):
            dx = nx[:, :, None, :] - px[:, :, :, None]
            dy = ny[:, :, None, :] - py[:, :, :, None]
            u = jnp.maximum(h * h - dx * dx - dy * dy, 0.0)
            u = jnp.where(jnp.abs(dx) > 2 * h, 0.0, u)  # sentinel guard
            acc = acc + weight_fn(dx, dy, u, nvx[:, :, None, :],
                                  nvy[:, :, None, :]).sum(-1)
        return acc

    rho = accum(lambda dx, dy, u, nvx, nvy: u ** 3)
    rho = jnp.maximum(rho, 1e-6)
    pt = jnp.where(live, K_PRESS * (rho - RHO0) / (rho * rho), 0.0)
    ptp = jnp.pad(pt, ((1, 1), (1, 1), (0, 0)))
    ptn = neigh(ptp)

    def f_press(axis):
        acc = 0.0
        for i, (nx, ny) in enumerate(zip(neigh(pxp), neigh(pyp))):
            dx = nx[:, :, None, :] - px[:, :, :, None]
            dy = ny[:, :, None, :] - py[:, :, :, None]
            u = jnp.maximum(h * h - dx * dx - dy * dy, 0.0)
            u = jnp.where(jnp.abs(dx) > 2 * h, 0.0, u)
            d = dx if axis == 0 else dy
            acc = acc + (d * u * u
                         * (pt[:, :, :, None] + ptn[i][:, :, None, :])).sum(-1)
        return acc

    fx = f_press(0)
    fy = f_press(1)
    su = accum(lambda dx, dy, u, nvx, nvy: u ** 3)
    svx = accum(lambda dx, dy, u, nvx, nvy: nvx * u ** 3)
    svy = accum(lambda dx, dy, u, nvx, nvy: nvy * u ** 3)
    fvx = NU * (svx - vx * su)
    fvy = NU * (svy - vy * su)
    return rho, fx, fy, fvx, fvy


# ---------------------------------------------------------------------------


def main():
    h = 9.0
    if MODE in ("check", "both"):
        N = 30_000
        BOUNDS = (-96.0 * 2, 96.0 * 2, -54.0 * 2, 54.0 * 2)
        spec = GridSpec.from_bounds(BOUNDS, h, capacity=64)
        kx, ky, kv = jax.random.split(jax.random.key(0), 3)
        pos = jnp.stack(
            [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
             jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
            axis=-1)
        ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
        vstd = 30.0
        vx = jnp.where(ps.live, vstd * jax.random.normal(
            kv, ps.px.shape), 0.0)
        vy = jnp.where(ps.live, -vstd * jnp.abs(jax.random.normal(
            jax.random.key(9), ps.px.shape)), 0.0)
        Cs = build_transfers(h)
        got = jax.jit(lambda a, b, c, d: fast_forces(a, b, c, d, spec, h, Cs)
                      )(ps.px, ps.py, vx, vy)
        want = jax.jit(lambda a, b, c, d: oracle_forces(a, b, c, d, h)
                       )(ps.px, ps.py, vx, vy)
        live = np.asarray(ps.live)
        for name, g, w in zip(("rho", "fx", "fy", "fvx", "fvy"), got, want):
            g = np.asarray(g)[live]
            w = np.asarray(w)[live]
            scale = max(np.abs(w).max(), 1e-12)
            err = np.abs(g - w)
            print(f"  {name:4s}: rel-max {err.max() / scale:9.2e}  "
                  f"rel-rms {np.sqrt((err ** 2).mean()) / scale:9.2e}  "
                  f"(scale {scale:9.3e})", flush=True)

    if MODE in ("time", "both", "stages"):
        N = 1_000_000
        BOUNDS = (-960.0, 960.0, -540.0, 540.0)
        spec = GridSpec.from_bounds(BOUNDS, h, capacity=64)
        kx, ky = jax.random.split(jax.random.key(0))
        pos = jnp.stack(
            [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
             jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
            axis=-1)
        ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
        vx = jnp.where(ps.live, 1.0, 0.0)
        vy = jnp.where(ps.live, -1.0, 0.0)
        Cs = build_transfers(h)
        R = 6

        px6 = jnp.stack([ps.px + 0.001 * i for i in range(R)])
        py6 = jnp.stack([ps.py + 0.001 * i for i in range(R)])

        def timed(body, label):
            fn = jax.jit(
                lambda: jax.lax.fori_loop(0, R, body, jnp.float32(0.0)))
            hsync_one(fn())
            t0 = time.perf_counter()
            hsync_one(fn())
            per = (time.perf_counter() - t0) / R * 1e3
            print(f"  {label:28s}: {per:7.2f} ms", flush=True)
            return per

        if MODE == "stages":
            # Per-stage split of pass 2 (the heavy pass: 4 moment channels,
            # 7 transfer pairs, 7 eval outputs).
            one = jnp.where(ps.live, 1.0, 0.0)
            pairs = [(1, 0), (1, 1), (2, 0), (2, 1), (0, 0), (0, 2), (0, 3)]

            def a_only(i, acc):
                M = moments(px6[i], py6[i], [one, one, vx, vy], spec, h)
                return acc + jnp.sum(M[::16, ::16, 0, ::64])

            def ab(i, acc):
                M = moments(px6[i], py6[i], [one, one, vx, vy], spec, h)
                L = transfers(M, pairs, Cs)
                return acc + jnp.sum(L[::16, ::16, 0, ::64])

            def abc(i, acc):
                M = moments(px6[i], py6[i], [one, one, vx, vy], spec, h)
                L = transfers(M, pairs, Cs)
                outs = evaluate(px6[i], py6[i], L, spec, h, 7)
                return acc + sum(jnp.sum(o[::16, ::16, 0]) for o in outs)

            ta = timed(a_only, "A moments (4ch)")
            tab = timed(ab, "A+B (+7 transfers)")
            tabc = timed(abc, "A+B+C (+7 evals)")
            print(f"  => B ~{tab - ta:.2f} ms, C ~{tabc - tab:.2f} ms",
                  flush=True)
        else:
            def body(i, acc):
                outs = fast_forces(px6[i], py6[i], vx, vy, spec, h, Cs)
                return acc + sum(jnp.sum(o[::16, ::16, 0]) for o in outs)

            per = timed(body, f"fast-mode forces @1M deg{DEG}")
            print(f"  (production VPU walks: ~28 ms)", flush=True)


if __name__ == "__main__":
    main()
