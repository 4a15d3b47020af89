"""Prototype: plane build via aligned-window gather + in-kernel dynamic roll.

Current production plane build gathers nc*C rows (1.66M at 1M particles) out of the
sorted particle array via the slot table — ~11-14 ms at 1M (gathers cost ~8 ns/ROW
on this TPU regardless of width).  This prototype replaces it with:

  1. ONE aligned gather of 2 rows of 128 particles per cell (2*nc = 52k rows), each
     window guaranteed to contain the cell's sorted run (runs are <= capacity 64 <=
     128 long, so they span at most two aligned 128-rows);
  2. a Pallas kernel that per cell dynamically ROLLS the 512-lane AoS window so the
     run starts at lane 0, masks lanes beyond the run count with channel fills, and
     emits the cell's [64 slots x 4ch] AoS block.

Measures: (a) current table-gather path, (b) window+roll path, and checks bitwise
equality of the resulting planes.
"""

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
print(f"grid {spec.gh}x{spec.gw} nc={nc} cap={CAP}")

BC = 128  # cells per kernel program


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


def build_current(pred, vel, grid):
    """The production path: packed perm gather + table gather."""
    packed = jnp.concatenate([pred, vel], axis=-1)
    fills = jnp.asarray([_SENTINEL, _SENTINEL, 0.0, 0.0], jnp.float32)
    packed = jnp.concatenate([packed[grid.perm], fills[None, :]], axis=0)
    table = grid.table[:nc]
    live = table >= 0
    return packed[jnp.where(live, table, N)]  # [nc, C, 4]


def build_rolled(pred, vel, grid):
    packed = jnp.concatenate([pred, vel], axis=-1)[grid.perm]  # [n, 4] sorted
    nr = -(-N // 64) + 1  # 64-particle aligned rows: a <=64 run spans at most 2
    pad = nr * 64 - N
    fills = jnp.asarray([_SENTINEL, _SENTINEL, 0.0, 0.0], jnp.float32)
    packed = jnp.concatenate([packed, jnp.broadcast_to(fills, (pad, 4))], axis=0)
    R = packed.reshape(nr, 256)  # 64 particles AoS per row

    starts = grid.starts[:nc]
    counts = jnp.minimum(grid.starts[1 : nc + 1] - starts, CAP)
    q = starts >> 6
    rc = (starts & 63) * 4

    nc_pad = -(-nc // BC) * BC
    if nc_pad > nc:
        zpad = jnp.zeros((nc_pad - nc,), jnp.int32)
        q = jnp.concatenate([q, zpad])
        rc = jnp.concatenate([rc, zpad])
        counts = jnp.concatenate([counts, zpad])

    W = jnp.take(R, jnp.stack([q, q + 1], axis=1).reshape(-1), axis=0)
    W = W.reshape(nc_pad, 512)

    out = pl.pallas_call(
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
    return out[:nc].reshape(nc, 64, 4)


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    preds = jnp.stack([
        jnp.stack(
            [
                jax.random.uniform(k, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
                jax.random.uniform(jax.random.fold_in(k, 1), (N,), minval=BOUNDS[2], maxval=BOUNDS[3]),
            ],
            axis=-1,
        )
        for k in ks
    ])
    vels = jax.random.normal(jax.random.key(9), (8, N, 2)) * 10.0

    # correctness: compare cell contents on one instance
    grid = jax.jit(lambda p: build_grid(spec, p))(preds[0])
    a = jax.jit(build_current)(preds[0], vels[0], grid)
    b = jax.jit(build_rolled)(preds[0], vels[0], grid)
    match = bool(jnp.all(a == b))
    print("bitwise match:", match)
    if not match:
        bad = jnp.argwhere(jnp.any(a != b, axis=-1))[:5]
        print("first mismatches:", bad)
        for c, s in bad[:3]:
            print("cell", int(c), "slot", int(s), a[c, s], b[c, s])

    def timed(fn, label):
        @jax.jit
        def loop():
            def body(i, acc):
                g = build_grid(spec, preds[i])
                cells = fn(preds[i], vels[i], g)
                return acc + jnp.sum(cells[::512, ::16, 0])
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

        hsync(loop())
        t0 = time.perf_counter()
        hsync(loop())
        ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"{label}: {ms:.2f} ms (incl. grid build)")
        return ms

    timed(build_current, "current (perm gather + table gather)")
    timed(build_rolled, "rolled  (perm gather + window gather + roll kernel)")


if __name__ == "__main__":
    main()
