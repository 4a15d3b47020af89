"""Splat routing precision probe (VERDICT r4 #4 — formulation attack).

The v2 kernel's stage strip (time_splat10): routing 2.9 / pair 1.65 /
acc 0.70 / place 0.67 / infra 0.87 of ~5.9 ms.  Round-5's rebin work showed
MXU f32 one-hot applies at HIGHEST pay a 3-pass bf16 penalty AND that
lane<->sublane relayouts dominate "small" stages; the routing dot both
transposes C from lanes to sublanes and runs at HIGHEST.  Two levers, each
measured here against the production kernel:

  S0          production 3ch kernel (baseline; exact)
  splitprec   positions pre-localized (cell base subtracted BEFORE routing,
              a native sublane broadcast) and routed at HIGHEST; colors
              routed at DEFAULT (1-pass bf16).  Color error is bounded by
              2^-8 relative ~ the u8 quantizer's 1/255 — quality-gated
              opt-in candidate.
  alldefault  everything routed at DEFAULT with patch-local coords — NOT
              shippable (bf16 position quantum 1/16 px -> alpha error ~0.16
              at radius 2), but bounds the total precision headroom.

Prints per-variant ms + max image deltas vs S0.
Usage (TPU): python protos/time_splat16.py [R]
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

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import plane_state_from_particles
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.render.splat_planes import _FAR, _round_up
from rust_particle_system_tpu.runtime.timing import hsync_one

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
RS = RenderSpec(width=1920, height=1080, max_radius_px=2)
MARGIN = RS.max_radius_px + 1

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64)
kx, ky = jax.random.split(jax.random.key(0))
pos = jnp.stack(
    [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
     jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])], axis=-1)
ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
live = ps.px < 0.5 * _FAR
rcol = jnp.where(live, 0.2, 0.0)
gcol = jnp.where(live, 0.5, 0.0)

gh, gw, C = ps.px.shape
x_min, x_max, y_min, y_max = BOUNDS
sx_scale = RS.width / (x_max - x_min)
sy_scale = RS.height / (y_max - y_min)
sx_px, sy_px = 9, 9
H, W = RS.height, RS.width
margin = MARGIN
ph, pw = sy_px + 2 * margin, sx_px + 2 * margin
rowpad = 16
G = 128 // rowpad
wt = _round_up(gw, G)
nsub = wt // G
PH_PAD = _round_up(ph, 8)
WP = _round_up((nsub - 1) * G * sx_px + 128, 128)

lidx = np.arange(128)
lt, lj = lidx // rowpad, lidx % rowpad
E8 = jnp.asarray((lidx[None, :] // rowpad
                  == np.arange(G)[:, None]).astype(np.float32))
base = jnp.asarray((lt * sx_px - margin)[None, :], jnp.float32)
ljc = jnp.asarray(np.where(lj < pw, lj + 0.5, -_FAR)[None, :], jnp.float32)
iy = jnp.asarray(np.broadcast_to(
    (np.arange(PH_PAD) + 0.5)[:, None], (PH_PAD, 128)), jnp.float32)
P8 = np.zeros((128, 128), np.float32)
for l in range(128):
    if l % rowpad < pw:
        P8[l, (l // rowpad) * sx_px + l % rowpad] = 1.0
P8 = jnp.asarray(P8)
HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT
NCH = 3


def make_variant(variant):
    ngroup = wt // G
    # per-lane patch-local frame when positions are pre-localized: lane frames
    # lose the absolute base (it was subtracted in plane space per sub-cell)
    base_local = jnp.asarray(
        np.where(lj < pw, 0.0, 0.0)[None, :], jnp.float32)

    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = H - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((NCH, 1, PH_PAD, WP), jnp.float32)
        subl = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).astype(
            jnp.float32)
        for gg in range(ngroup):
            sl = slice(gg * G, (gg + 1) * G)
            pxg = px_ref[0, sl, :]
            any_live = jnp.max(jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(gg=gg, sl=sl, pxg=pxg):
                pyg = py_ref[0, sl, :]
                if variant == "S0":
                    planesk = jnp.stack(
                        [pxg, pyg, r_ref[0, sl, :], g_ref[0, sl, :]])
                    lanes = jax.lax.dot_general(
                        planesk, e8_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HI)
                    qxl = lanes[0] - (base_ref[...]
                                      + jnp.float32(gg * G * sx_px))
                    qyl = lanes[1] - origin_y
                    rl, gl = lanes[2], lanes[3]
                else:
                    # pre-localize in plane space: subtract the cell's patch
                    # origin per SUBLANE (native broadcast) so routed values
                    # are patch-local (<= pw, ph) before any precision cut.
                    cellx0 = (jnp.float32(gg * G) + subl) * sx_px - margin
                    qx_plane = jnp.where(pxg < 0.5 * _FAR, pxg - cellx0, _FAR)
                    qy_plane = jnp.where(pxg < 0.5 * _FAR, pyg - origin_y,
                                         _FAR)
                    posk = jnp.stack([qx_plane, qy_plane])
                    lanesp = jax.lax.dot_general(
                        posk, e8_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=HI if variant == "splitprec" else DEF)
                    colk = jnp.stack([r_ref[0, sl, :], g_ref[0, sl, :]])
                    lanesc = jax.lax.dot_general(
                        colk, e8_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=DEF)
                    # routed qx/qy are already patch-local per their own cell
                    qxl = lanesp[0]
                    qyl = lanesp[1]
                    rl, gl = lanesc[0], lanesc[1]
                dxl = ljc_ref[...] - qxl
                dx2 = dxl * dxl
                dy = iy_ref[...][None] - qyl[:, None, :]
                d = jnp.sqrt(dy * dy + dx2[:, None, :])
                tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                alpha = jnp.where(alpha < 0.01, 0.0, alpha)
                accs = jnp.stack(
                    [jnp.sum(rl[:, None, :] * alpha, axis=0),
                     jnp.sum(gl[:, None, :] * alpha, axis=0),
                     jnp.sum(alpha, axis=0)])
                strip = jax.lax.dot_general(
                    accs, p8_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                x0 = gg * G * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + 128]
                q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    return kernel


const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((G, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((1, 128), lambda rr: (0, 0)),
               pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
               pl.BlockSpec((128, 128), lambda rr: (0, 0))]
in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))


def run_variant(kernel, px, py, r, gc, radius_px):
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)

    def plane(a, fill):
        if wt == gw:
            return a
        padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
        return jnp.concatenate([a, padc], axis=1)

    return pl.pallas_call(
        kernel,
        grid=(gh,),
        in_specs=const_specs + [in_block] * 4,
        out_specs=pl.BlockSpec((NCH, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NCH, gh, PH_PAD, WP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(scal, E8, base, ljc, iy, P8, plane(px, _FAR), plane(py, _FAR),
      plane(r, 0.0), plane(gc, 0.0))


def pixel_planes(eps):
    ppx = jnp.where(live, (ps.px - x_min) * sx_scale + eps, _FAR)
    ppy = jnp.where(live, (y_max - ps.py) * sy_scale, _FAR)
    return ppx, ppy


def main():
    radius = jnp.float32(2.0)
    outs = {}
    for variant in ("S0", "splitprec", "alldefault"):
        kern = make_variant(variant)
        ppx, ppy = pixel_planes(0.0)
        q = run_variant(kern, ppx, ppy, rcol, gcol, radius)
        outs[variant] = np.asarray(q)
        loop = jax.jit(lambda e: jax.lax.fori_loop(
            0, R, lambda i, a: a + jnp.sum(run_variant(
                kern, *pixel_planes(e + 0.003 * jnp.float32(i)), rcol, gcol,
                radius)[:, ::16, :, ::128]), jnp.float32(0)))
        hsync_one(loop(jnp.float32(0.0)))
        t0 = time.perf_counter()
        hsync_one(loop(jnp.float32(0.0101)))
        per = (time.perf_counter() - t0) / R * 1e3
        d = (np.abs(outs[variant] - outs["S0"]).max()
             if variant != "S0" else 0.0)
        print(f"{variant:11s}: {per:6.2f} ms   max|dq vs S0| = {d:.4g}",
              flush=True)


if __name__ == "__main__":
    main()
