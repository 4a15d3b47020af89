"""Decompose the 7 ms v6 rebin at the 1M pack2/C=64 geometry (VERDICT r4 #2).

The one-hot value applies were named (round-4 notes) as the suspected
latency trap — batched [suba, 5, 2C] x [suba, 2C, C] mini-dots with M=5.  But
the kernel also runs ~8 per-program [GWP, C] x [C, C] prefix dots, the
retention re-derivations, and the in-register pass X.  This proto times v6
with pieces ablated so the restructure attacks the right stage:

  full        the production kernel (copy)
  no_onehot   both applies skip the one-hot construction AND the dot
              (outputs = stayers only) — isolates the apply cost
  no_dot      applies build the one-hot but skip the dot — splits the
              construction (VPU) from the matmul (MXU latency)
  no_retent   skip the pass-Y retention re-derivation (and its 2 extra
              prefix dots + rows r-2 reads)
  no_passx    pass X replaced by a copy of the pass-Y result
  bpref       CANDIDATE: batch the pass-Y/pass-X prefix dots (4 masks
              concatenated on sublanes -> ONE [4*GWP, C] x [C, C] dot per
              pass instead of 3+) — tests the prefix-latency hypothesis

Usage: python protos/time_rebin_v6split.py [ablation] [R]
Run on TPU (axon).  R=32 in-jit varied-input protocol.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import (
    SENTINEL,
    V4_PRECISION,
    V6_SUBA,
    _round_up,
)
from rust_particle_system_tpu.runtime.timing import hsync

ABL = sys.argv[1] if len(sys.argv) > 1 else "full"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SUBA_OVERRIDE = int(sys.argv[3]) if len(sys.argv) > 3 else 0

NO_ONEHOT = ABL == "no_onehot"
NO_DOT = ABL in ("no_onehot", "no_dot")
NO_RETENT = ABL == "no_retent"
NO_PASSX = ABL == "no_passx"
BPREF = ABL == "bpref"
# pfac: factor the one-hot through rank space — OH[w,s] = keep[w]·hole[s]·
# (arank[w]==hr[s]) = Σ_j P_a[j,w]·P_h[j,s] with P_a[j,w] = keep[w]&(arank[w]==j)
# and P_h[j,s] = filled-hole[s]&(hr[s]==j).  BOTH factors build in NATIVE
# layout (rank values stay on lanes; the j axis broadcasts on sublanes), so the
# [suba, W2, C] eq-compare's lane->sublane relayout of arank — measured ~5.4 of
# the 7 ms (no_dot vs no_onehot) — disappears.  The apply becomes two exact
# matmuls: M1 = vals·P_aᵀ ([k,W2]x[W2,C]), out = M1·P_h ([k,C]x[C,C]); every
# filled slot receives exactly one nonzero term, so pass-through stays
# bit-exact at HIGHEST precision.
PFAC = ABL == "pfac"


def _make_kernel_v6_abl(C, k, gw, gh, GWP, x_min, y_min, cell_w, cell_h,
                        fills, suba):
    W2 = 2 * C
    HI = V4_PRECISION

    def kernel(off_ref, ut_ref, *refs):
        pxm2, pxm1, px0, pxp1 = (refs[i][0] for i in range(4))
        pym2, pym1, py0, pyp1 = (refs[4 + i][0] for i in range(4))
        valm1 = [refs[8 + 3 * c][0] for c in range(k - 2)]
        val0 = [refs[8 + 3 * c + 1][0] for c in range(k - 2)]
        valp1 = [refs[8 + 3 * c + 2][0] for c in range(k - 2)]
        outs = refs[8 + 3 * (k - 2) : 8 + 3 * (k - 2) + k]
        cnt_ref = refs[8 + 3 * (k - 2) + k]
        scr = refs[8 + 3 * (k - 2) + k + 1 :]
        assert len(scr) == k

        rr = pl.program_id(0) + off_ref[0]
        rv = jnp.zeros((GWP, 1), jnp.int32) + rr
        colv = jax.lax.broadcasted_iota(jnp.int32, (GWP, 1), 0)
        f32 = lambda m: jnp.where(m, 1.0, 0.0)

        def destxy(x, y):
            kx = jnp.clip(jnp.floor((x - x_min) / cell_w).astype(jnp.int32),
                          0, gw - 1)
            ky = jnp.clip(jnp.floor((y - y_min) / cell_h).astype(jnp.int32),
                          0, gh - 1)
            return kx, ky

        live = lambda x: x < 0.5 * SENTINEL

        def prefix(maskf):
            return jax.lax.dot_general(
                maskf, ut_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def prefix_many(*maskfs):
            """BPREF candidate: one [n*GWP, C] x [C, C] dot for n masks."""
            if not BPREF or len(maskfs) == 1:
                return [prefix(m) for m in maskfs]
            big = jnp.concatenate(maskfs, axis=0)
            out = jax.lax.dot_general(
                big, ut_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return [out[i * GWP : (i + 1) * GWP] for i in range(len(maskfs))]

        def rowsum(maskf):
            return jnp.sum(maskf, axis=1, keepdims=True)

        own_ch = [px0, py0] + val0
        up_ch = [pxm1, pym1] + valm1
        dn_ch = [pxp1, pyp1] + valp1

        # ---------------- pass Y ----------------
        kx0, ky0 = destxy(px0, py0)
        live0 = live(px0)
        _, kym1 = destxy(pxm1, pym1)
        _, kyp1 = destxy(pxp1, pyp1)
        livem1 = live(pxm1) & (rv >= 1)
        livep1 = live(pxp1) & (rv <= gh - 2)
        keep_m1 = livem1 & (kym1 >= rv)
        keep_p1 = livep1 & (kyp1 <= rv)
        deadY = jnp.logical_not(live0)
        stayY = live0 & (ky0 == rv)

        kpf_m1, kpf_p1 = f32(keep_m1), f32(keep_p1)
        hdf = f32(deadY)
        pr_m1, pr_p1, hps = prefix_many(kpf_m1, kpf_p1, hdf)
        n_m1 = pr_m1[:, C - 1 : C]
        arank_m1 = pr_m1.astype(jnp.int32) - 1
        arank_p1 = (n_m1 + pr_p1).astype(jnp.int32) - 1
        hrank = hps.astype(jnp.int32) - 1
        narr = (n_m1 + pr_p1[:, C - 1 : C]).astype(jnp.int32)

        keepW = jnp.concatenate([kpf_m1, kpf_p1], axis=1)
        arankW = jnp.concatenate([arank_m1, arank_p1], axis=1)
        winY = [jnp.concatenate([u, d], axis=1) for u, d in zip(up_ch, dn_ch)]

        def apply_pass(keepWf, arankWi, hrk, deadf, nar, win_ch, stay_mask,
                       own_vals, out_write):
            for i in range(GWP // suba):
                sl = slice(i * suba, (i + 1) * suba)
                if PFAC:
                    jio = jax.lax.broadcasted_iota(
                        jnp.int32, (suba, C, W2), 1)  # j on sublanes
                    pa = jnp.where(
                        (jio == arankWi[sl][:, None, :])
                        & (keepWf[sl][:, None, :] > 0.5), 1.0, 0.0)
                    jioC = jio[:, :, :C]
                    ph = jnp.where(
                        (jioC == hrk[sl][:, None, :])
                        & (deadf[sl][:, None, :] > 0.5)
                        & (hrk[sl][:, None, :] < nar[sl][:, :, None]),
                        1.0, 0.0)  # [suba, C(j), C(s)]
                    vals = jnp.stack([w[sl] for w in win_ch], axis=1)
                    m1 = jax.lax.dot_general(
                        vals, pa, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32, precision=HI)
                    app = jax.lax.dot_general(
                        m1, ph, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32, precision=HI)
                    filled = (deadf[sl] > 0.5) & (hrk[sl] < nar[sl])
                    stays = stay_mask[sl]
                    out_write(sl, [
                        jnp.where(stays, own_vals[c][sl],
                                  jnp.where(filled, app[:, c, :],
                                            jnp.float32(fills[c])))
                        for c in range(k)
                    ])
                    continue
                if NO_ONEHOT:
                    out_write(sl, [
                        jnp.where(stay_mask[sl], own_vals[c][sl],
                                  jnp.float32(fills[c])) for c in range(k)])
                    continue
                rk = arankWi[sl]
                hr = hrk[sl]
                eq = rk[:, :, None] == hr[:, None, :]
                onehot = jnp.where(
                    eq, keepWf[sl][:, :, None] * deadf[sl][:, None, :], 0.0)
                vals = jnp.stack([w[sl] for w in win_ch], axis=1)
                if NO_DOT:
                    app = jnp.broadcast_to(
                        jnp.sum(onehot, axis=1)[:, None, :], (
                            suba, k, C))  # keep onehot live, skip the dot
                else:
                    app = jax.lax.dot_general(
                        vals, onehot, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32, precision=HI)
                filled = (deadf[sl] > 0.5) & (hr < nar[sl])
                stays = stay_mask[sl]
                out_write(sl, [
                    jnp.where(stays, own_vals[c][sl],
                              jnp.where(filled, app[:, c, :],
                                        jnp.float32(fills[c])))
                    for c in range(k)
                ])

        def write_scr(sl, vals):
            for c in range(k):
                scr[c][sl, :] = vals[c]

        apply_pass(keepW, arankW, hrank, hdf, narr, winY, stayY, own_ch,
                   write_scr)

        # ----- Y retention -----
        if NO_RETENT:
            mid = [scr[c][...] for c in range(k)]
        else:
            moverY = live0 & (ky0 != rv)
            _, kym2 = destxy(pxm2, pym2)
            livem2 = live(pxm2) & (rv >= 2)
            keep_up_into_m1 = livem2 & (kym2 >= rv - 1)
            keep_r_into_m1 = live0 & (ky0 <= rv - 1) & (rv >= 1)
            keep_r_into_p1 = live0 & (ky0 >= rv + 1) & (rv <= gh - 2)
            pr_a, pr_b = prefix_many(f32(keep_r_into_m1), f32(keep_r_into_p1))
            arank_r_in_m1 = (rowsum(f32(keep_up_into_m1))
                             + pr_a).astype(jnp.int32) - 1
            nholes_m1 = rowsum(f32(jnp.logical_not(live(pxm1)))).astype(
                jnp.int32)
            adopted_up = keep_r_into_m1 & (arank_r_in_m1 < nholes_m1)
            arank_r_in_p1 = pr_b.astype(jnp.int32) - 1
            nholes_p1 = rowsum(f32(jnp.logical_not(live(pxp1)))).astype(
                jnp.int32)
            adopted_dn = keep_r_into_p1 & (arank_r_in_p1 < nholes_p1)
            retainY = moverY & jnp.logical_not(adopted_up | adopted_dn)
            mid = [jnp.where(retainY, own_ch[c], scr[c][...])
                   for c in range(k)]

        if NO_PASSX:
            for c in range(k):
                outs[c][0, :, :] = mid[c]
            cnt_ref[0, :, :] = jnp.sum(
                jnp.where(outs[0][0] < 0.5 * SENTINEL, 1, 0),
                axis=1, keepdims=True).astype(jnp.int32)
            return

        # ---------------- pass X ----------------
        mkx, mky = destxy(mid[0], mid[1])
        liveM = live(mid[0])

        def shift_dn(a, fill):
            top = jnp.full((1, a.shape[1]), fill, a.dtype)
            return jnp.concatenate([top, a[:-1]], axis=0)

        def shift_up(a, fill):
            bot = jnp.full((1, a.shape[1]), fill, a.dtype)
            return jnp.concatenate([a[1:], bot], axis=0)

        up_live = shift_dn(f32(liveM), 0.0) > 0.5
        dn_live = shift_up(f32(liveM), 0.0) > 0.5
        up_kx = shift_dn(mkx, 0)
        dn_kx = shift_up(mkx, 0)
        up_ky = shift_dn(mky, -1)
        dn_ky = shift_up(mky, -1)
        kg0 = up_live & (up_ky == rv) & (up_kx >= colv) & (colv > 0)
        kg1 = dn_live & (dn_ky == rv) & (dn_kx <= colv) & (colv < gw - 1)
        deadX = jnp.logical_not(liveM)
        stayX = liveM & ((mky != rv) | (mkx == colv))

        kg0f, kg1f = f32(kg0), f32(kg1)
        hdfX = f32(deadX)
        pr_g0, pr_g1, hpsX = prefix_many(kg0f, kg1f, hdfX)
        ng0 = pr_g0[:, C - 1 : C]
        arank_g0 = pr_g0.astype(jnp.int32) - 1
        arank_g1 = (ng0 + pr_g1).astype(jnp.int32) - 1
        hrankX = hpsX.astype(jnp.int32) - 1
        nholesX = hpsX[:, C - 1 : C].astype(jnp.int32)
        narrX = (ng0 + pr_g1[:, C - 1 : C]).astype(jnp.int32)

        keepX = jnp.concatenate([kg0f, kg1f], axis=1)
        arankX = jnp.concatenate([arank_g0, arank_g1], axis=1)
        winX = [jnp.concatenate([shift_dn(m, fills[c]),
                                 shift_up(m, fills[c])], axis=1)
                for c, m in enumerate(mid)]

        adopted_g0 = f32(kg0 & (arank_g0 < nholesX))
        adopted_g1 = f32(kg1 & (arank_g1 < nholesX))
        adopted_by_left = shift_dn(adopted_g1, 0.0) > 0.5
        adopted_by_right = shift_up(adopted_g0, 0.0) > 0.5
        moverX = liveM & (mky == rv) & (mkx != colv)
        retainX = moverX & jnp.logical_not(adopted_by_left | adopted_by_right)

        def write_out(sl, vals):
            for c in range(k):
                outs[c][0, sl, :] = jnp.where(retainX[sl], mid[c][sl], vals[c])

        apply_pass(keepX, arankX, hrankX, hdfX, narrX, winX, stayX, mid,
                   write_out)

        cnt_ref[0, :, :] = jnp.sum(
            jnp.where(outs[0][0] < 0.5 * SENTINEL, 1, 0),
            axis=1, keepdims=True).astype(jnp.int32)

    return kernel


def rebin_v6_abl(planes, spec, fills):
    gh, gw, C = planes[0].shape
    k = len(planes)
    GWP = _round_up(gw, 8)
    suba = SUBA_OVERRIDE or V6_SUBA
    while GWP % suba != 0 or suba % 8 != 0:
        suba -= 8 if suba > 8 else 1
        if suba < 1:
            suba = GWP
            break

    def padw(p, f):
        if GWP == gw:
            return p
        return jnp.concatenate(
            [p, jnp.full((gh, GWP - gw, C), f, jnp.float32)], axis=1)

    pp = [padw(p, f) for p, f in zip(planes, fills)]
    ut = jnp.triu(jnp.ones((C, C), jnp.float32))

    def view(dy):
        return pl.BlockSpec((1, GWP, C),
                            lambda r, dy=dy: (jnp.clip(r + dy, 0, gh - 1), 0, 0))

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((C, C), lambda r: (0, 0))]
    operands = [jnp.zeros((1,), jnp.int32), ut]
    for ch in (0, 1):
        for dy in (-2, -1, 0, 1):
            in_specs.append(view(dy))
            operands.append(pp[ch])
    for c in range(2, k):
        for dy in (-1, 0, 1):
            in_specs.append(view(dy))
            operands.append(pp[c])

    out_specs = [pl.BlockSpec((1, GWP, C), lambda r: (r, 0, 0))] * k + [
        pl.BlockSpec((1, GWP, 1), lambda r: (r, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((gh, GWP, C), jnp.float32)] * k + [
        jax.ShapeDtypeStruct((gh, GWP, 1), jnp.int32)]

    res = pl.pallas_call(
        _make_kernel_v6_abl(C, k, gw, gh, GWP, float(spec.x_min),
                            float(spec.y_min), float(spec.cell_width),
                            float(spec.cell_size), fills, suba),
        grid=(gh,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((GWP, C), jnp.float32)] * k,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)
    return [r[:, :gw, :] for r in res[:k]], res[k][:, :gw, 0].reshape(gh * gw)


def main():
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
    px = jnp.where(live, base_x + ox + drift[0], SENTINEL)
    py = jnp.where(live, base_y + oy + drift[1], SENTINEL)
    extra = [jax.random.normal(jax.random.key(10 + i), (gh, gw, C))
             for i in range(k - 2)]
    planes = [px, py] + extra
    fills = tuple(SENTINEL if c < 2 else 0.0 for c in range(k))
    print(f"grid {gh}x{gw} C={C} live={int(live.sum())} abl={ABL}", flush=True)

    # correctness guard vs production v6 for non-lossy ablations
    if ABL in ("full", "bpref", "pfac"):
        from rust_particle_system_tpu.ops.pallas.rebin import rebin_planes
        import numpy as np
        want, wcnt = rebin_planes(planes, spec, variant=6)
        got, gcnt = rebin_v6_abl(planes, spec, fills)
        for c in range(k):
            np.testing.assert_array_equal(np.asarray(got[c]),
                                          np.asarray(want[c]))
        np.testing.assert_array_equal(np.asarray(gcnt), np.asarray(wcnt))
        print("exactness vs production v6: OK", flush=True)

    ps8 = [jnp.stack([p + (0.001 * i if c >= 2 else 0.0) for i in range(R)])
           for c, p in enumerate(planes)]
    loop = jax.jit(lambda ps8: jax.lax.fori_loop(
        0, R,
        lambda i, acc: acc + jnp.sum(
            rebin_v6_abl([p[i] for p in ps8], spec, fills)[0][0][::32, ::32]),
        jnp.float32(0)))
    t0 = time.perf_counter()
    hsync(loop(ps8))
    print(f"compile+warm: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    hsync(loop(ps8))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"v6[{ABL}] @ {nc} cells / C={C}: {per:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
