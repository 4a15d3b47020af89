"""Split the 10.8 ms v5 rebin into its parts on TPU: window build (XLA concats),
pass-Y kernel, retention merge, pass-X kernel — plus knob combos (suba, BC).

Usage: python protos/time_rebin_v5split.py [C] [drift] [suba,bc]
"""

import sys
import time

import jax
import jax.numpy as jnp

from rust_particle_system_tpu.ops.grid import GridSpec
import rust_particle_system_tpu.ops.pallas.rebin as rb
from rust_particle_system_tpu.ops.pallas.rebin import (
    SENTINEL,
    _hole_fill_pass,
    _retention_merge,
    rebin_planes,
)
from rust_particle_system_tpu.runtime.timing import hsync

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
drift_amp = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
if len(sys.argv) > 3:
    suba, bc = sys.argv[3].split(",")
    rb.V4_SUBA, rb.V4_BC = int(suba), int(bc)
print(f"knobs: suba={rb.V4_SUBA} bc={rb.V4_BC}", flush=True)

spec = GridSpec(x_min=-960.0, y_min=-540.0, cell_size=9.0, gw=214, gh=121,
                capacity=C)
gh, gw, nc = spec.gh, spec.gw, spec.gh * spec.gw
k = 5
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
fills = tuple(SENTINEL if c < 2 else 0.0 for c in range(k))

nc_pad = rb._round_up(nc, rb.V4_BC)


def flat(p, f):
    x = p.reshape(nc, C)
    if nc_pad > nc:
        x = jnp.concatenate([x, jnp.full((nc_pad - nc, C), f, jnp.float32)])
    return x


R = int(sys.argv[4]) if len(sys.argv) > 4 else 8
ps8 = [jnp.stack([p + (0.001 * i if c >= 2 else 0.0) for i in range(R)])
       for c, p in enumerate(planes)]


def timed(label, body):
    loop = jax.jit(lambda ps8: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + body([p[i] for p in ps8]), jnp.float32(0)))
    hsync(loop(ps8))
    t0 = time.perf_counter()
    hsync(loop(ps8))
    per = (time.perf_counter() - t0) / R * 1e3
    print(f"  {label:34s}: {per:7.2f} ms", flush=True)
    return per


def mk_flats(ps):
    return [flat(p, f) for p, f in zip(ps, fills)]


def chk(flats):
    return jnp.sum(flats[0][::32, ::32])


timed("flatten only", lambda ps: chk(mk_flats(ps)))

timed("passY lossy (v4 kernel)", lambda ps: chk(
    _hole_fill_pass(mk_flats(ps), spec, fills, spec.gw, True, False, False)[0]))

timed("passY lossless kernel", lambda ps: chk(
    _hole_fill_pass(mk_flats(ps), spec, fills, spec.gw, True, False, True)[0]))


def passy_ret(ps):
    flats = mk_flats(ps)
    mid, _, acc = _hole_fill_pass(flats, spec, fills, spec.gw, True, False, True)
    mid = _retention_merge(flats, mid, acc, spec, spec.gw, True)
    return chk(mid)


timed("passY lossless + retention", passy_ret)

timed("full v5", lambda ps: jnp.sum(
    rebin_planes(ps, spec, interpret=False, variant=5)[0][0][::32, ::32]))

timed("full v6 (row-fused)", lambda ps: jnp.sum(
    rebin_planes(ps, spec, interpret=False, variant=6)[0][0][::32, ::32]))

# exactness cross-check at this geometry (v6 must be bit-identical to v5)
a5, c5 = rebin_planes(planes, spec, interpret=False, variant=5)
a6, c6 = rebin_planes(planes, spec, interpret=False, variant=6)
import numpy as np
for c, (x5, x6) in enumerate(zip(a5, a6)):
    d = float(jnp.max(jnp.abs(x5 - x6)))
    assert d == 0.0, (c, d)
assert int(jnp.sum(jnp.abs(c5 - c6))) == 0
print("v6 bit-identical to v5 at this geometry", flush=True)
