"""Tiny interpret-mode repro for the rowstrip placement bug (CPU, fast)."""

from __future__ import annotations

import numpy as np
import jax

import sys
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_FAR = 1.0e6
sy = sx = 9
m = 2
ph = pw = 13
ROWPAD = 16
LANES = 256
gh, gw = 4, 6
H, W = gh * sy - 3, gw * sx - 3   # force off > 0 like production
off = gh * sy - H
C = 8
radius_px = 2.0

rng = np.random.default_rng(0)
npart = 40
pxw = rng.uniform(0, W, npart).astype(np.float32)   # pixel coords
pyw = rng.uniform(0, H, npart).astype(np.float32)

# bin into planes [gh, gw, C] of PIXEL coords (top-down y already)
ppx = np.full((gh, gw, C), _FAR, np.float32)
ppy = np.full((gh, gw, C), _FAR, np.float32)
rr_ = np.zeros((gh, gw, C), np.float32)
occ = np.zeros((gh, gw), np.int32)
for x, y in zip(pxw, pyw):
    cx = min(int(x // sx), gw - 1)
    cyc = min(int((H - y) // sy), gh - 1)  # cell row from world y (y up)
    # note: planes are indexed by CELL row r where pixel y = H - (r+1)*sy ...
    cyc = max(cyc, 0)
    k = occ[cyc, cx]
    if k < C:
        ppx[cyc, cx, k] = x
        ppy[cyc, cx, k] = y
        rr_[cyc, cx, k] = 0.5
        occ[cyc, cx] = k + 1

# oracle: direct dense splat of alpha channel
def alpha_np(d):
    e0 = 0.8 * radius_px
    t = np.clip((d - e0) / max(radius_px - e0, 1e-6), 0, 1)
    a = 1 - t * t * (3 - 2 * t)
    return np.where(a < 0.01, 0, a)

ref = np.zeros((H, W), np.float32)
for r0 in range(gh):
    for c0 in range(gw):
        for k in range(C):
            if ppx[r0, c0, k] >= _FAR / 2:
                continue
            x, y = ppx[r0, c0, k], ppy[r0, c0, k]
            # pixel y of this particle: planes store ppy as IMAGE-pixel y
            for yy in range(H):
                for xx in range(W):
                    d = np.hypot(xx + 0.5 - x, yy + 0.5 - y)
                    ref[yy, xx] += alpha_np(d)

# --- rowstrip kernel (copy of proto logic, alpha channel only tracked) ---
lidx = np.arange(LANES)
li, lj = lidx // ROWPAD, lidx % ROWPAD
ldead = (li >= ph) | (lj >= pw)
lx_np = np.where(ldead, -_FAR, lj + 0.5)
ly_np = np.where(ldead, -_FAR, li + 0.5)
apix = jnp.asarray(np.stack([lx_np, ly_np]), jnp.float32)
scal = jnp.stack([jnp.float32(radius_px)])

tcs = 2
wt = -(-gw // tcs) * tcs
nsub = wt // tcs
SPAN = tcs * sx + pw - sx
SPAN_PAD = -(-SPAN // 128) * 128
K = tcs * 16
WP = -(-((nsub - 1) * tcs * sx + SPAN_PAD) // 128) * 128

E1_np = np.zeros((tcs, K), np.float32)
for t in range(tcs):
    E1_np[t, t * 16 : (t + 1) * 16] = 1.0
mj_np = np.zeros((LANES, K), np.float32)
for l in range(LANES):
    for k in range(l % 16, K, 16):
        mj_np[l, k] = 1.0
P_np = np.zeros((K, SPAN_PAD), np.float32)
for k in range(K):
    j = k % 16
    if j < pw:
        P_np[k, (k // 16) * sx + j] = 1.0
E1, mj, Pm = jnp.asarray(E1_np), jnp.asarray(mj_np), jnp.asarray(P_np)


def alpha_of(d2, radius):
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    edge0 = 0.8 * radius
    tt = jnp.clip((dist - edge0) / jnp.maximum(radius - edge0, 1e-6), 0.0, 1.0)
    a = 1.0 - tt * tt * (3.0 - 2.0 * tt)
    return jnp.where(a < 0.01, 0.0, a)


def kernel(scal_ref, apix_ref, e1_ref, mj_ref, p_ref, px_ref, py_ref, r_ref,
           q_ref):
    radius = scal_ref[0]
    rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
    origin_y = H - (rr + 1.0) * sy - m
    q_ref[...] = jnp.zeros((2, 1, 16, WP), jnp.float32)
    for t in range(nsub):
        cellx = (t * tcs + jax.lax.broadcasted_iota(jnp.int32, (tcs, 1), 0)
                 ).astype(jnp.float32)
        origin_x = cellx * sx - m
        qx = px_ref[0, t * tcs : (t + 1) * tcs, :] - origin_x
        qy = py_ref[0, t * tcs : (t + 1) * tcs, :] - origin_y
        cols = jnp.stack(
            [r_ref[0, t * tcs : (t + 1) * tcs, :],
             jnp.ones((tcs, C), jnp.float32)], axis=1)
        dx = qx[:, :, None] - apix_ref[0][None, None, :]
        dy = qy[:, :, None] - apix_ref[1][None, None, :]
        alpha = alpha_of(dx * dx + dy * dy, radius)
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        y = jax.lax.dot_general(
            acc, e1_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = (y * mj_ref[...][None]).reshape(2, LANES // 16, 16, K)
        zi = jnp.sum(z, axis=2)
        s = jax.lax.dot_general(
            zi, p_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x0 = t * tcs * sx
        cur = q_ref[:, 0, :, x0 : x0 + SPAN_PAD]
        q_ref[:, 0, :, x0 : x0 + SPAN_PAD] = cur + s


def plane(a, fill):
    out = np.full((gh, wt, C), fill, np.float32)
    out[:, :gw, :] = a
    return jnp.asarray(out)


in_block = pl.BlockSpec((1, wt, C), lambda rrr: (gh - 1 - rrr, 0, 0))
q_block = pl.BlockSpec((2, 1, 16, WP), lambda rrr: (0, rrr, 0, 0))

q = pl.pallas_call(
    kernel,
    grid=(gh,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec((2, LANES), lambda rrr: (0, 0)),
              pl.BlockSpec((tcs, K), lambda rrr: (0, 0)),
              pl.BlockSpec((LANES, K), lambda rrr: (0, 0)),
              pl.BlockSpec((K, SPAN_PAD), lambda rrr: (0, 0))]
    + [in_block] * 3,
    out_specs=q_block,
    out_shape=jax.ShapeDtypeStruct((2, gh, 16, WP), jnp.float32),
    interpret="--tpu" not in sys.argv,
)(scal, apix, E1, mj, Pm, plane(ppx, _FAR), plane(ppy, _FAR), plane(rr_, 0.0))

img = jnp.zeros((2, H, W), jnp.float32)
a = q[:, :, :sy, :].reshape(2, gh * sy, WP)
shift_a = -m - off
y0, y1 = max(0, shift_a), min(H, gh * sy + shift_a)
img = img.at[:, y0:y1, :].add(a[:, y0 - shift_a : y1 - shift_a, m : m + W])
nb = ph - sy
b = q[:, :, sy:ph, :]
b = jnp.concatenate([b, jnp.zeros((2, gh, sy - nb, WP), jnp.float32)], axis=2)
b = b.reshape(2, gh * sy, WP)
shift_b = sy - m - off
y0, y1 = max(0, shift_b), min(H, gh * sy + shift_b)
img = img.at[:, y0:y1, :].add(b[:, y0 - shift_b : y1 - shift_b, m : m + W])

out = np.asarray(img[1])
d = np.abs(out - ref)
print("max err:", d.max(), "at", np.unravel_index(d.argmax(), d.shape))
ys, xs = np.where(d > 1e-3)
print("bad pixels:", len(ys), sorted(set(xs.tolist()))[:20], sorted(set(ys.tolist()))[:20])
if len(ys):
    yy, xx = ys[0], xs[0]
    print("sample:", yy, xx, "out", out[yy, xx], "ref", ref[yy, xx])
