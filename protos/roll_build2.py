"""Decompose the rolled plane-build cost: grid / perm gather / window gather / kernel."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

from rust_particle_system_tpu.ops.grid import GridSpec, build_grid
from rust_particle_system_tpu.runtime.timing import hsync

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
CELL = 9.0
CAP = 64
_SENTINEL = 1.0e6

spec = GridSpec.from_bounds(BOUNDS, CELL, capacity=CAP, cell_aspect=1, pack2=True)
nc = spec.num_cells
BC = 128
nc_pad = -(-nc // BC) * BC


def roll_kernel(rc_ref, cnt_ref, w_ref, out_ref):
    base = pl.program_id(0) * BC
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1)
    pidx = lane // 4
    chan = lane - pidx * 4
    fillv = jnp.where(chan < 2, _SENTINEL, 0.0).astype(jnp.float32)

    def body(i, _):
        r4 = rc_ref[base + i]
        cnt = cnt_ref[base + i]
        row = w_ref[pl.ds(i, 1), :]
        rolled = pltpu.roll(row, shift=-r4, axis=1)
        vals = jnp.where(pidx < cnt, rolled, fillv)
        out_ref[pl.ds(i, 1), :] = vals[:, :256]
        return 0

    jax.lax.fori_loop(0, BC, body, 0)


def parts(pred, vel):
    grid = build_grid(spec, pred)
    packed = jnp.concatenate([pred, vel], axis=-1)[grid.perm]
    nr = -(-N // 64) + 1
    pad = nr * 64 - N
    fills = jnp.asarray([_SENTINEL, _SENTINEL, 0.0, 0.0], jnp.float32)
    packed = jnp.concatenate([packed, jnp.broadcast_to(fills, (pad, 4))], axis=0)
    R = packed.reshape(nr, 256)
    starts = grid.starts[:nc]
    counts = jnp.minimum(grid.starts[1 : nc + 1] - starts, CAP)
    q = starts >> 6
    rc = (starts & 63) * 4
    zpad = jnp.zeros((nc_pad - nc,), jnp.int32)
    q = jnp.concatenate([q, zpad])
    rc = jnp.concatenate([rc, zpad])
    counts = jnp.concatenate([counts, zpad])
    W = jnp.take(R, jnp.stack([q, q + 1], axis=1).reshape(-1), axis=0).reshape(nc_pad, 512)
    return grid, packed, R, rc, counts, W


def kern(rc, counts, W):
    return pl.pallas_call(
        roll_kernel,
        grid=(nc_pad // BC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, 512), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((BC, 256), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((nc_pad, 256), jnp.float32),
    )(rc, counts, W)


def main():
    ks = jax.random.split(jax.random.key(0), 8)
    preds = jnp.stack([
        jnp.stack([
            jax.random.uniform(k, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
            jax.random.uniform(jax.random.fold_in(k, 1), (N,), minval=BOUNDS[2], maxval=BOUNDS[3]),
        ], axis=-1) for k in ks
    ])
    vels = jax.random.normal(jax.random.key(9), (8, N, 2)) * 10.0

    def timed(body, label):
        @jax.jit
        def loop():
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0))
        hsync(loop())
        t0 = time.perf_counter()
        hsync(loop())
        ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"{label}: {ms:.2f} ms")
        return ms

    def upto_grid(i, acc):
        g = build_grid(spec, preds[i])
        return acc + jnp.sum(g.perm[::4096]).astype(jnp.float32)

    def upto_perm(i, acc):
        g = build_grid(spec, preds[i])
        packed = jnp.concatenate([preds[i], vels[i]], -1)[g.perm]
        return acc + jnp.sum(packed[::512, 0])

    def upto_window(i, acc):
        _, _, _, rc, counts, W = parts(preds[i], vels[i])
        return acc + jnp.sum(W[::512, ::16])

    def full(i, acc):
        _, _, _, rc, counts, W = parts(preds[i], vels[i])
        out = kern(rc, counts, W)
        return acc + jnp.sum(out[::512, ::16])

    timed(upto_grid, "grid")
    timed(upto_perm, "grid+perm_gather")
    timed(upto_window, "grid+perm+window_gather")
    timed(full, "grid+perm+window+rollkernel")


if __name__ == "__main__":
    main()
