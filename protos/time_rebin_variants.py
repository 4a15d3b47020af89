"""Component timing for the rebin kernel: where do v2/v3's ~19 ms go?

Variants timed at production scale (26k cells, C=64, k=5, ~1M live):
  v3        : MXU prefix-rank + one-hot apply           (module, 20.8 ms measured)
  v2        : roll-chain rank + one-hot apply           (module, ~18.5 ms r2)
  s1        : v3 stage 1 ONLY (rank+counts, no apply)   -> isolates the apply cost
  v2i       : v2 with TWO suba batches interleaved      -> tests the latency thesis
  win       : window build only (XLA concats, no kernel)

Run: python protos/time_rebin_variants.py s1 v2i win   (each arg = one variant)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas import rebin as R
from rust_particle_system_tpu.runtime.timing import hsync

BC, SUBA, SENT = R.BC, R.SUBA, R.SENTINEL


def _make_kernel_s1(C, k, gw, gh, x_min, y_min, cell_w, cell_h, fills):
    """v3 stage 1 only: rank via MXU prefix; outputs rank plane + counts."""
    W9 = 9 * C

    def kernel(ut_ref, *refs):
        wins = refs[: 3 * k]
        outs = refs[3 * k : 3 * k + k]
        cnt_ref = refs[3 * k + k]
        t = pl.program_id(0)
        cat = lambda c: jnp.concatenate(
            [wins[dy * k + c][:] for dy in range(3)], axis=1)
        x9, y9 = cat(0), cat(1)
        cell = t * BC + jax.lax.broadcasted_iota(jnp.int32, (BC, 1), 0)
        cy_dest = cell // gw
        cx_dest = cell - cy_dest * gw
        kx = jnp.clip(jnp.floor((x9 - x_min) / cell_w).astype(jnp.int32), 0,
                      gw - 1)
        ky = jnp.clip(jnp.floor((y9 - y_min) / cell_h).astype(jnp.int32), 0,
                      gh - 1)
        keep = (x9 < 0.5 * SENT) & (kx == cx_dest) & (ky == cy_dest)
        psum = jax.lax.dot_general(
            jnp.where(keep, 1.0, 0.0), ut_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rank = psum.astype(jnp.int32) - 1
        total = psum[:, W9 - 1 : W9].astype(jnp.int32)
        for c in range(k):
            outs[c][:] = rank[:, c * C : (c + 1) * C].astype(jnp.float32)
        cnt_ref[:] = total

    return kernel


def _make_kernel_v2i(C, k, gw, gh, x_min, y_min, cell_w, cell_h, fills):
    """v2 with two suba batches interleaved per loop iteration."""
    W9 = 9 * C
    nbits = max(1, (W9 - 1).bit_length())

    def kernel(*refs):
        wins = refs[: 3 * k]
        outs = refs[3 * k : 3 * k + k]
        cnt_ref = refs[3 * k + k]
        t = pl.program_id(0)
        lane9 = jax.lax.broadcasted_iota(jnp.int32, (SUBA, W9), 1)
        laneC = jax.lax.broadcasted_iota(jnp.int32, (SUBA, C), 1)

        def half(r0):
            cell = t * BC + r0 + jax.lax.broadcasted_iota(
                jnp.int32, (SUBA, 1), 0)
            cy_dest = cell // gw
            cx_dest = cell - cy_dest * gw
            cat = lambda c: jnp.concatenate(
                [wins[dy * k + c][pl.ds(r0, SUBA), :] for dy in range(3)],
                axis=1)
            x9, y9 = cat(0), cat(1)
            kx = jnp.clip(jnp.floor((x9 - x_min) / cell_w).astype(jnp.int32),
                          0, gw - 1)
            ky = jnp.clip(jnp.floor((y9 - y_min) / cell_h).astype(jnp.int32),
                          0, gh - 1)
            keep = (x9 < 0.5 * SENT) & (kx == cx_dest) & (ky == cy_dest)
            return cat, keep

        def body(i, _):
            r0a = (2 * i) * SUBA
            r0b = (2 * i + 1) * SUBA
            cata, keepa = half(r0a)
            catb, keepb = half(r0b)

            # interleaved prefix sums
            pa = jnp.where(keepa, 0, 1)
            pb = jnp.where(keepb, 0, 1)
            holesa, holesb = pa, pb
            for j in range(nbits):
                s = 1 << j
                if s >= W9:
                    break
                pa = pa + jnp.where(lane9 < s, 0, pltpu.roll(pa, shift=s, axis=1))
                pb = pb + jnp.where(lane9 < s, 0, pltpu.roll(pb, shift=s, axis=1))
            da = jnp.where(keepa, pa - holesa, 0)
            db = jnp.where(keepb, pb - holesb, 0)
            kpa = jnp.where(keepa, 1, 0)
            kpb = jnp.where(keepb, 1, 0)
            idxa = lane9
            idxb = lane9
            for j in range(nbits):
                s = 1 << j
                if s >= W9:
                    break
                sh = W9 - s
                dsa = pltpu.roll(da, shift=sh, axis=1)
                dsb = pltpu.roll(db, shift=sh, axis=1)
                ksa = pltpu.roll(kpa, shift=sh, axis=1)
                ksb = pltpu.roll(kpb, shift=sh, axis=1)
                ta = (ksa == 1) & (((dsa >> j) & 1) == 1)
                tb = (ksb == 1) & (((dsb >> j) & 1) == 1)
                sa = (kpa == 1) & (((da >> j) & 1) == 0)
                sb = (kpb == 1) & (((db >> j) & 1) == 0)
                idxa = jnp.where(ta, pltpu.roll(idxa, shift=sh, axis=1), idxa)
                idxb = jnp.where(tb, pltpu.roll(idxb, shift=sh, axis=1), idxb)
                da = jnp.where(ta, dsa & ~s, jnp.where(sa, da, 0))
                db = jnp.where(tb, dsb & ~s, jnp.where(sb, db, 0))
                kpa = jnp.where(ta | sa, 1, 0)
                kpb = jnp.where(tb | sb, 1, 0)
            tota = jnp.sum(holesa == 0, axis=1, keepdims=True).astype(jnp.int32)
            totb = jnp.sum(holesb == 0, axis=1, keepdims=True).astype(jnp.int32)

            for (r0, idx, tot, cat) in ((r0a, idxa, tota, cata),
                                        (r0b, idxb, totb, catb)):
                cidx = idx[:, :C]
                onehot = (
                    (lane9[:, :, None] == cidx[:, None, :])
                    & (laneC[:, None, :] < tot[:, :, None])
                ).astype(jnp.float32)
                vals = jnp.stack([cat(c) for c in range(k)], axis=1)
                outv = jax.lax.dot_general(
                    vals, onehot, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                for c in range(k):
                    outs[c][pl.ds(r0, SUBA), :] = jnp.where(
                        laneC < tot, outv[:, c, :], jnp.float32(fills[c]))
                cnt_ref[pl.ds(r0, SUBA), :] = tot
            return 0

        jax.lax.fori_loop(0, BC // (2 * SUBA), body, 0)

    return kernel


def run_variant(name, planes, spec, k):
    gh, gw, C = planes[0].shape
    nc = gh * gw
    fills = tuple(SENT if c < 2 else 0.0 for c in range(k))
    nc_pad = R._round_up(nc, BC)

    if name in ("v2", "v3"):
        variant = int(name[1])
        fn = jax.jit(lambda ps: R.rebin_planes(ps, spec, interpret=False,
                                               variant=variant)[0][0])
    elif name == "win":
        def win_only(ps):
            outs = []
            for dy in (-1, 0, 1):
                for c in range(k):
                    p = ps[c].reshape(nc, C)
                    shift = dy * gw
                    if shift == 0:
                        src = p
                    elif shift < 0:
                        src = jnp.concatenate(
                            [jnp.full((-shift, C), fills[c], p.dtype),
                             p[:shift]])
                    else:
                        src = jnp.concatenate(
                            [p[shift:],
                             jnp.full((shift, C), fills[c], p.dtype)])
                    flat = src
                    if nc_pad > nc:
                        flat = jnp.concatenate(
                            [flat, jnp.full((nc_pad - nc, C), fills[c])])
                    ghost = jnp.full((1, C), fills[c])
                    g2 = jnp.concatenate([ghost, flat, ghost])
                    outs.append(jnp.concatenate([g2[:-2], g2[1:-1], g2[2:]],
                                                axis=1))
            return sum(jnp.sum(o[::64, ::64]) for o in outs)

        fn = jax.jit(win_only)
    else:
        maker = _make_kernel_s1 if name == "s1" else _make_kernel_v2i
        geom = (C, k, gw, gh, float(spec.x_min), float(spec.y_min),
                float(spec.cell_width), float(spec.cell_size), fills)
        kern = maker(*geom)
        win_spec = pl.BlockSpec((BC, 3 * C), lambda t: (t, 0))
        out_specs = tuple([pl.BlockSpec((BC, C), lambda t: (t, 0))] * k
                          + [pl.BlockSpec((BC, 1), lambda t: (t, 0))])
        out_shape = tuple(
            [jax.ShapeDtypeStruct((nc_pad, C), jnp.float32)] * k
            + [jax.ShapeDtypeStruct((nc_pad, 1), jnp.int32)])

        def call(ps):
            outs = []
            for dy in (-1, 0, 1):
                for c in range(k):
                    p = ps[c].reshape(nc, C)
                    shift = dy * gw
                    if shift == 0:
                        src = p
                    elif shift < 0:
                        src = jnp.concatenate(
                            [jnp.full((-shift, C), fills[c], p.dtype),
                             p[:shift]])
                    else:
                        src = jnp.concatenate(
                            [p[shift:],
                             jnp.full((shift, C), fills[c], p.dtype)])
                    flat = src
                    if nc_pad > nc:
                        flat = jnp.concatenate(
                            [flat, jnp.full((nc_pad - nc, C), fills[c])])
                    ghost = jnp.full((1, C), fills[c])
                    g2 = jnp.concatenate([ghost, flat, ghost])
                    outs.append(jnp.concatenate([g2[:-2], g2[1:-1], g2[2:]],
                                                axis=1))
            if name == "s1":
                W9 = 9 * C
                ut = jnp.triu(jnp.ones((W9, W9), jnp.float32))
                res = pl.pallas_call(
                    kern, grid=(nc_pad // BC,),
                    in_specs=[pl.BlockSpec((W9, W9), lambda t: (0, 0))]
                    + [win_spec] * (3 * k),
                    out_specs=out_specs, out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                        vmem_limit_bytes=100 * 1024 * 1024),
                    interpret=False)(ut, *outs)
            else:
                res = pl.pallas_call(
                    kern, grid=(nc_pad // BC,),
                    in_specs=[win_spec] * (3 * k),
                    out_specs=out_specs, out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                        vmem_limit_bytes=100 * 1024 * 1024),
                    interpret=False)(*outs)
            return res[0][::32, ::32]

        fn = jax.jit(lambda ps: jnp.sum(call(ps)))

    t0 = time.perf_counter()
    hsync(fn(planes))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s", flush=True)
    Rr = 8
    ps8 = [jnp.stack([p + (0.001 * i if c >= 2 else 0.0) for i in range(Rr)])
           for c, p in enumerate(planes)]
    loop = jax.jit(lambda ps8: jax.lax.fori_loop(
        0, Rr,
        lambda i, acc: acc + jnp.sum(fn([p[i] for p in ps8])),
        jnp.float32(0)))
    hsync(loop(ps8))
    t0 = time.perf_counter()
    hsync(loop(ps8))
    per = (time.perf_counter() - t0) / Rr * 1e3
    print(f"{name}: {per:.2f} ms", flush=True)


def main():
    names = sys.argv[1:] or ["win", "s1", "v2i"]
    C = 64
    spec = GridSpec(x_min=-960.0, y_min=-540.0, cell_size=9.0, gw=214, gh=121,
                    capacity=C)
    gh, gw = spec.gh, spec.gw
    nc = gh * gw
    k = 5
    frac = min(1_000_000 / (nc * C), 1.0)
    kx, ky = jax.random.split(jax.random.key(0))
    base_x = jax.random.uniform(kx, (gh, gw, C), minval=0.0, maxval=9.0)
    base_y = jax.random.uniform(ky, (gh, gw, C), minval=0.0, maxval=9.0)
    ox = spec.x_min + jnp.arange(gw)[None, :, None] * 9.0
    oy = spec.y_min + jnp.arange(gh)[:, None, None] * 9.0
    live = jax.random.uniform(jax.random.key(2), (gh, gw, C)) < frac
    drift = jax.random.uniform(jax.random.key(3), (2, gh, gw, C),
                               minval=-1.3, maxval=1.3)
    px = jnp.where(live, base_x + ox + drift[0], SENT)
    py = jnp.where(live, base_y + oy + drift[1], SENT)
    extra = [jax.random.normal(jax.random.key(10 + i), (gh, gw, C))
             for i in range(k - 2)]
    planes = [px, py] + extra
    print(f"live={int(live.sum())}", flush=True)
    for name in names:
        run_variant(name, planes, spec, k)


if __name__ == "__main__":
    main()
