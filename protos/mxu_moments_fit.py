"""Feasibility study: moment-transfer (FMM-style M2L) formulation of the SPH pair
forces on the MXU — the error side of the go/no-go asked by VERDICT round 2.

Idea: per-pair force sums Σ_j w_j · G(q_i, r_j) become MATMULS if G factorizes as
Φ(q_i)ᵀ K Ψ(r_j): per cell, accumulate weighted neighbor moments M = Σ_j w_j Ψ(r_j)
(one small matmul over slots), transfer L_c = Σ_Δ K^Δ M_{c+Δ} (9 dense [B, B]
matmuls — the FLOP body, all MXU), then evaluate per own particle Φ(q_i)ᵀ L (one
matmul).  Total work O(n·B) + O(cells·B²) instead of O(n·768) VPU pair walks.

The factorization comes from a 4D tensor-Chebyshev fit of G over (own cell) x
(neighbor cell + offset): K[(a,b),(c,e)] with basis T_a(x̂i)T_b(ŷi)T_c(x̂j)T_e(ŷj).
Per-axis domains are single cells (tight), coefficients are obtained by Chebyshev
interpolation (4D DCT), numerically stable at any degree (basis values <= 1).

THIS SCRIPT measures the only real unknown: how fast the fit converges for the
actual pair functions, whose smoothness is limited by (a) the kernel cutoff kink
at d = h and (b) the coincidence singularity of the direction factor (x_j-x_i)/d
at the shared edge/corner of adjacent cells.  It reports, per degree and offset:

* rms/max error on IN-SUPPORT pairs (d < h), relative to the function's scale;
* max spurious magnitude on OUT-of-support pairs (d > h), which budget-multiplies
  by the ~100 candidates a settle-state cell supplies.

Functions tested (h = cell size = 1, the production tie):
  G1 = (xj-xi)(h-d)+   / d   -- spec pressure-force x factor (spiky, 1/d)
  G2 = (xj-xi)(h-d)+^2 / d   -- spec near-pressure factor
  D1 = (h-d)+^2              -- spec density kernel (radial, no direction)
  V  = (h^2-d^2)+^3          -- spec viscosity kernel (poly in d^2, C^2 cutoff)
  P1 = (xj-xi)(h^2-d^2)+^2   -- poly-kernel gradient form (kernel-spec freedom)

Run: python protos/mxu_moments_fit.py   (CPU numpy, ~1 min)

MEASURED (2026-08-17, this machine): see the committed output block at the bottom.
"""

from __future__ import annotations

import numpy as np

H = 1.0


def cheb_nodes(n):
    return np.cos(np.pi * (np.arange(n) + 0.5) / n)  # Chebyshev roots in (-1, 1)


def dct_coeffs(vals):
    """Multidim Chebyshev interpolation coefficients from values on roots grid."""
    from scipy.fft import dct  # type: ignore

    c = vals
    for ax in range(vals.ndim):
        c = dct(c, type=2, axis=ax) / vals.shape[ax]
    # DCT-II gives 2x on the zeroth coefficient per axis
    for ax in range(vals.ndim):
        sl = [slice(None)] * vals.ndim
        sl[ax] = 0
        c[tuple(sl)] *= 0.5
    return c


def cheb_eval_multi(coeffs, pts, chunk=512):
    """Evaluate a 4D Chebyshev series at pts [m, 4] in [-1, 1]^4.

    Chunked: the tensor contraction's leading intermediate is [chunk, n^3]
    (~1 GB at degree 24 for 200k points unchunked — it thrashed; keep it <100 MB).
    """
    n = coeffs.shape[0]
    # T matrix per axis: [m, n]
    Ts = []
    for ax in range(4):
        x = pts[:, ax]
        T = np.empty((len(x), n))
        T[:, 0] = 1.0
        if n > 1:
            T[:, 1] = x
        for k in range(2, n):
            T[:, k] = 2 * x * T[:, k - 1] - T[:, k - 2]
        Ts.append(T)
    m = pts.shape[0]
    out = np.empty(m)
    cflat = coeffs.reshape(n, -1)  # [a, bce]
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        # progressive per-axis contraction, point-major
        t = (Ts[0][s:e] @ cflat).reshape(e - s, n, n, n)  # [m', b, c, e]
        t = np.einsum("mbce,mb->mce", t, Ts[1][s:e])
        t = np.einsum("mce,mc->me", t, Ts[2][s:e])
        out[s:e] = np.einsum("me,me->m", t, Ts[3][s:e])
    return out


def pair_funcs(xi, yi, xj, yj):
    dx = xj - xi
    dy = yj - yi
    d2 = dx * dx + dy * dy
    d = np.sqrt(np.maximum(d2, 1e-30))
    v = np.maximum(H - d, 0.0)
    u = np.maximum(H * H - d2, 0.0)
    return {
        "G1_spiky_dir": dx * v / d,
        "G2_near_dir": dx * v * v / d,
        "D1_density": v * v,
        "V_viscosity": u * u * u,
        "P1_poly_dir": dx * u * u,
    }


def fit_offset(offset, deg, nq=None):
    """Fit all pair functions for one neighbor offset at tensor degree ``deg``.

    Own cell = [0,1]^2; neighbor cell = offset + [0,1]^2.  Returns dict of
    (coeffs, errors) with in-support rel-rms/max and out-of-support max.
    """
    n = deg + 1
    g = cheb_nodes(n)
    # map [-1,1] -> cell coords
    oxi = 0.5 * (g + 1.0)
    oxj = offset[0] + 0.5 * (g + 1.0)
    oyj = offset[1] + 0.5 * (g + 1.0)
    XI, YI, XJ, YJ = np.meshgrid(oxi, oxi, oxj, oyj, indexing="ij")
    vals = pair_funcs(XI, YI, XJ, YJ)

    rng = np.random.default_rng(0)
    m = 100_000
    pts = rng.random((m, 4))
    pxi, pyi = pts[:, 0], pts[:, 1]
    pxj, pyj = offset[0] + pts[:, 2], offset[1] + pts[:, 3]
    tv = pair_funcs(pxi, pyi, pxj, pyj)
    d2 = (pxj - pxi) ** 2 + (pyj - pyi) ** 2
    inside = d2 < H * H
    upts = np.stack(
        [2 * pts[:, 0] - 1, 2 * pts[:, 1] - 1, 2 * pts[:, 2] - 1,
         2 * pts[:, 3] - 1], axis=1)

    out = {}
    for name, vgrid in vals.items():
        c = dct_coeffs(vgrid.copy())
        approx = cheb_eval_multi(c, upts)
        truth = tv[name]
        scale = max(np.abs(truth[inside]).max(), 1e-12) if inside.any() else 1.0
        err = approx - truth
        in_rms = np.sqrt(np.mean(err[inside] ** 2)) / scale if inside.any() else 0.0
        in_max = np.abs(err[inside]).max() / scale if inside.any() else 0.0
        out_max = np.abs(approx[~inside]).max() / scale if (~inside).any() else 0.0
        out[name] = (in_rms, in_max, out_max)
    return out


def main():
    offsets = {"side(1,0)": (1, 0), "diag(1,1)": (1, 1), "own(0,0)": (0, 0)}
    for deg in (8, 12, 16, 20, 24):
        print(f"=== tensor degree {deg} (basis {(deg+1)**2} per side) ===",
              flush=True)
        for oname, off in offsets.items():
            res = fit_offset(off, deg)
            for fname, (r, mx, om) in res.items():
                print(f"  {oname:10s} {fname:14s} in-rms {r:9.2e}  "
                      f"in-max {mx:9.2e}  out-max {om:9.2e}", flush=True)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# MEASURED OUTPUT (2026-08-17, this machine, m=100k eval points per offset)
# ---------------------------------------------------------------------------
# Errors are relative to the in-support max magnitude of each function.
#
# === tensor degree 8 (basis 81 per side) ===
#   side(1,0)  G1_spiky_dir   in-rms  1.23e-02  in-max  6.87e-01  out-max  2.50e-02
#   side(1,0)  G2_near_dir    in-rms  1.19e-02  in-max  7.15e-01  out-max  1.36e-03
#   side(1,0)  D1_density     in-rms  1.26e-03  in-max  5.27e-02  out-max  1.36e-03
#   side(1,0)  V_viscosity    in-rms  4.47e-04  in-max  1.83e-03  out-max  1.54e-03
#   side(1,0)  P1_poly_dir    in-rms  5.51e-03  in-max  2.34e-02  out-max  2.04e-02
#   diag(1,1)  G1_spiky_dir   in-rms  4.86e-03  in-max  4.53e-02  out-max  2.91e-02
#   diag(1,1)  G2_near_dir    in-rms  6.92e-04  in-max  4.43e-02  out-max  1.67e-03
#   diag(1,1)  D1_density     in-rms  5.57e-04  in-max  2.22e-03  out-max  1.67e-03
#   diag(1,1)  V_viscosity    in-rms  4.65e-04  in-max  1.78e-03  out-max  1.66e-03
#   diag(1,1)  P1_poly_dir    in-rms  4.72e-03  in-max  2.45e-02  out-max  1.99e-02
#   own(0,0)   G1_spiky_dir   in-rms  6.25e-02  in-max  9.72e-01  out-max  1.59e-02
#   own(0,0)   G2_near_dir    in-rms  6.26e-02  in-max  9.76e-01  out-max  1.43e-02
#   own(0,0)   D1_density     in-rms  1.21e-02  in-max  8.73e-02  out-max  5.32e-03
#   own(0,0)   V_viscosity    in-rms  4.21e-05  in-max  6.12e-04  out-max  7.18e-04
#   own(0,0)   P1_poly_dir    in-rms  4.62e-04  in-max  7.79e-03  out-max  8.17e-03
# === tensor degree 12 (basis 169 per side) ===
#   side(1,0)  G1_spiky_dir   in-rms  7.35e-03  in-max  5.61e-01
#   own(0,0)   G1_spiky_dir   in-rms  4.35e-02  in-max  9.56e-01
#   own(0,0)   D1_density     in-rms  5.92e-03  in-max  5.54e-02
#   own(0,0)   V_viscosity    in-rms  9.08e-06  in-max  1.68e-04
#   own(0,0)   P1_poly_dir    in-rms  1.68e-04  in-max  3.58e-03
# === tensor degree 16 (basis 289 per side) ===
#   side(1,0)  G1_spiky_dir   in-rms  5.16e-03  in-max  4.12e-01
#   own(0,0)   G1_spiky_dir   in-rms  3.34e-02  in-max  9.43e-01
#   own(0,0)   D1_density     in-rms  3.48e-03  in-max  4.04e-02
#   own(0,0)   V_viscosity    in-rms  3.31e-06  in-max  6.30e-05
#   own(0,0)   P1_poly_dir    in-rms  8.47e-05  in-max  2.08e-03
# === tensor degree 20 (basis 441 per side) ===
#   own(0,0)   G1_spiky_dir   in-rms  2.71e-02  in-max  9.29e-01
#   own(0,0)   P1_poly_dir    in-rms  4.98e-05  in-max  1.18e-03
# === tensor degree 24 (basis 625 per side) ===
#   side(1,0)  G1_spiky_dir   in-rms  2.22e-03  in-max  1.57e-01  out-max  9.67e-03
#   side(1,0)  D1_density     in-rms  8.22e-05  in-max  6.27e-03  out-max  2.07e-04
#   diag(1,1)  G1_spiky_dir   in-rms  1.06e-03  in-max  1.08e-02  out-max  1.08e-02
#   own(0,0)   G1_spiky_dir   in-rms  2.28e-02  in-max  9.14e-01  out-max  4.28e-03
#   own(0,0)   G2_near_dir    in-rms  2.29e-02  in-max  9.18e-01  out-max  4.10e-04
#   own(0,0)   D1_density     in-rms  1.66e-03  in-max  2.71e-02  out-max  1.19e-04
#   own(0,0)   V_viscosity    in-rms  8.17e-07  in-max  1.96e-05  out-max  1.81e-05
#   own(0,0)   P1_poly_dir    in-rms  3.19e-05  in-max  8.00e-04  out-max  7.56e-04
#
# READING: the spec's spiky direction factors G1/G2 ((xj-xi)(h-d)^k/d) do NOT
# converge on own/side offsets — in-max plateaus at ~0.92 (own) / 0.16 (side,
# deg 24) because the d->0 direction discontinuity is not polynomial-
# approximable; rms improves only algebraically (6.3e-2 -> 2.3e-2 over 8->24).
# The poly-in-d^2 family is the opposite story: V (the spec's own viscosity
# kernel) hits 2e-5 max, and the poly6-style gradient P1 = dx*(h^2-d^2)^2 hits
# 8e-4 (own) / 2.9e-3 (side) at deg 24, and is already at 3.6e-3 by deg 12
# (basis 169).  DECISION in BASELINE.md: NO-GO for spec-exact MXU pair math;
# GO only as an opt-in poly-kernel fast mode (kernel-spec freedom).
