"""Fast-mode (MXU M2L) stage-A/C re-probe under the C=128 cell-per-lane-row
layout — the round-3 parking condition (BASELINE.md:146-148).

Round-3 verdict: the M2L formulation is sound (stage B's 9 dense [B,B]
transfer matmuls are cheap), but stages A (per-cell moments
``M[b] = Σ_slot Φ_b(r_slot)·w_slot``) and C (per-particle evals
``Φ(q)ᵀ·L_cell``) need CELL-SEGMENTED contractions, and with cpg=8 cells
sharing a lane group the one-hot routing padded ~12x.  With C=128 (one cell
per 128-lane row) the segmentation becomes trivial — each lane row IS a cell —
and the contraction has exactly two native forms.  This probe times BOTH at
the 1M-particle geometry (cell 15.36 world units ≈ 114 avg occupancy,
nc = 125x70 = 8750 cells, deg-12 basis: 13 per axis, 169 2-D), with synthetic
Φ data (building Φ by Chebyshev recurrence adds ~26 vreg-ops/cell — small vs
what is probed here):

  A-dot    batched mini dot_general  [8, 13, 128] x [8, 128, 13] per program
           (the known latency trap, re-measured at K=128)
  A-vpu    elementwise mul + LANE-reduce of [176, 128] per cell
           (176 = 169 padded to sublane tile)
  C-vpu    elementwise mul + SUBLANE-reduce of [176, 128] per cell

Decision input: fast-mode end-to-end ≈ A + B(7.7 measured r3) + C + rebin of
the coarser grid.  If A+C lower-bounds above ~8 ms, the 1e9 route through M2L
stays parked and BASELINE.md records the revised ceiling.

Usage: python protos/fastmode_c128.py [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NC = 8750          # cells at 1M / occ-114 geometry (125 x 70)
NCP = 8768         # padded to a multiple of 8 programs-to-rows
B1 = 13            # deg-12 1-D basis
B2 = 169           # 2-D basis
B2P = 176          # padded to sublane multiple
CP = 128
HI = jax.lax.Precision.HIGHEST

key = jax.random.key(0)
k1, k2, k3 = jax.random.split(key, 3)
# Synthetic per-(cell, slot) basis rows and weights.
# Per-(cell, slot) weights; the basis tiles are SYNTHESIZED IN-KERNEL from
# these (as the real stages would build Chebyshev rows from positions) so the
# probe measures arithmetic, not a 790 MB HBM stream of precomputed basis.
W = jax.random.normal(k2, (NCP, CP), jnp.float32)


def timed(label, fn, *args):
    loop = jax.jit(lambda b, *a: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + fn(0.003 * jnp.float32(i) + b, *a),
        jnp.float32(0)))
    hsync_one(loop(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    hsync_one(loop(jnp.float32(0.0101), *args))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:34s}: {per:7.3f} ms", flush=True)
    return per


# ---------------------------------------------------------- A-dot (mini dots)
def make_a_dot():
    BCELL = 8  # cells per program

    def kernel(w_ref, o_ref):
        w = w_ref[...]                           # [BCELL, CP]
        it = jax.lax.broadcasted_iota(jnp.int32, (BCELL, B1, CP), 1).astype(jnp.float32)
        phi = w[:, None, :] * it + it            # synthetic basis tile
        pw = phi * w[:, None, :]
        # batched mini-matmul: [BCELL, B1, CP] x [BCELL, CP, B1] -> [.., B1, B1]
        m = jax.lax.dot_general(
            pw, jnp.swapaxes(phi, 1, 2), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=HI)
        o_ref[...] = m

    call = pl.pallas_call(
        kernel,
        grid=(NCP // BCELL,),
        in_specs=[pl.BlockSpec((BCELL, CP), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((BCELL, B1, B1), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NCP, B1, B1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def fn(eps, w):
        out = call(w + eps)
        return jnp.sum(out[::64, 0, 0])

    return fn


# ------------------------------------------------- A-vpu (mul + lane-reduce)
def make_a_vpu():
    GC = 8  # cells per program; full B2P rows per cell

    def kernel(w_ref, o_ref):
        it = jax.lax.broadcasted_iota(jnp.int32, (B2P, CP), 0).astype(jnp.float32)
        for c in range(GC):
            p = w_ref[c : c + 1, :] * it + it     # synthetic [B2P, CP] basis
            pw = p * w_ref[c : c + 1, :]          # broadcast over sublanes
            o_ref[c, :, 0] = jnp.sum(pw, axis=1)  # lane reduce -> [B2P]

    call = pl.pallas_call(
        kernel,
        grid=(NCP // GC,),
        in_specs=[pl.BlockSpec((GC, CP), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((GC, B2P, 1), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NCP, B2P, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def fn(eps, w):
        out = call(w + eps)
        return jnp.sum(out[::64, 0, 0])

    return fn


# ---------------------------------------------- C-vpu (mul + sublane-reduce)
def make_c_vpu():
    GC = 8

    def kernel(w_ref, l_ref, o_ref):
        it = jax.lax.broadcasted_iota(jnp.int32, (B2P, CP), 0).astype(jnp.float32)
        for c in range(GC):
            p = w_ref[c : c + 1, :] * it + it     # synthetic [B2P, CP] basis
            pl_ = p * l_ref[c]                    # * per-cell moments [B2P, 1]
            o_ref[c, 0, :] = jnp.sum(pl_, axis=0)  # sublane reduce -> [CP]

    call = pl.pallas_call(
        kernel,
        grid=(NCP // GC,),
        in_specs=[pl.BlockSpec((GC, CP), lambda t: (t, 0)),
                  pl.BlockSpec((GC, B2P, 1), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((GC, 1, CP), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NCP, 1, CP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    L = jax.random.normal(jax.random.key(9), (NCP, B2P, 1), jnp.float32)

    def fn(eps, w):
        out = call(w + eps, L)
        return jnp.sum(out[::64, 0, ::64])

    return fn


hsync_one(jnp.zeros((4,)) + 1.0)
print(f"nc={NC} (padded {NCP})  B1={B1} B2={B2}->{B2P}  CP={CP}  R={R}",
      flush=True)
timed("A-dot  batched [13,128]x[128,13]", make_a_dot(), W)
timed("A-vpu  [176,128] mul+lane-reduce", make_a_vpu(), W)
timed("C-vpu  [176,128] mul+subl-reduce", make_c_vpu(), W)
