"""Cell-plane build via aligned-window gather + in-kernel dynamic rolls.

The step needs the sorted particle array re-laid-out as cell-dense slot planes
``[num_cells, capacity, k]``.  The obvious formulation — gather via the slot table
(``table[c, s] = starts[c] + s``) — issues one tiny gather slice per SLOT (1.66M
slices at 1M particles / capacity 64), which this TPU executes at ~8 ns per slice:
~13-15 ms of pure index traffic (measured, protos/roll_build*.py).

This module replaces it with two observations:

1. A cell's sorted run is at most ``capacity`` long, so it spans at most TWO
   ``capacity``-aligned rows of the sorted array.  ONE gather of those two rows per
   CELL (2 x num_cells slices, each ``capacity*k`` wide) fetches every run — 64x
   fewer slices, and gather cost here is per-slice once slices are lane-wide.
2. Aligning each run to its slot-0 lane is a per-cell dynamic ROLL (Mosaic's
   ``tpu.dynamic_rotate``), done in a small Pallas kernel that also masks lanes
   beyond the run count with per-channel fills (position sentinels / zero
   velocities) — the layout contract of ops/pallas/sph.py.

The reference's analog is the sorted-run indirection itself (spatial lookup +
offsets, assets/compute_shader.wgsl:207-254); the TPU design difference is that the
run walk happens once here, at plane-build time, instead of inside every force pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BC = 128  # cells per kernel program


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_roll_kernel(k: int, cap: int, lanes: int):
    def kernel(rc_ref, cnt_ref, fill_ref, w_ref, out_ref):
        base = pl.program_id(0) * _BC
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
        pidx = lane // k  # slot index of each AoS lane

        def body(i, _):
            rk = rc_ref[base + i]
            cnt = cnt_ref[base + i]
            row = w_ref[pl.ds(i, 1), :]
            rolled = pltpu.roll(row, shift=-rk, axis=1)
            vals = jnp.where(pidx < cnt, rolled, fill_ref[:])
            out_ref[pl.ds(i, 1), :] = vals[:, : cap * k]
            return 0

        jax.lax.fori_loop(0, _BC, body, 0)

    return kernel


def cell_planes_aos(sorted_packed, starts, num_cells: int, capacity: int, fills,
                    interpret: bool):
    """[n, k] sorted particle rows -> [num_cells, capacity, k] cell-dense planes.

    ``sorted_packed`` must be in cell-sorted order (rows of one cell contiguous);
    ``starts`` is the [num_cells + 1] run-start table (``Grid.starts``).  Slots
    beyond a cell's count (or beyond capacity — overflow) read ``fills`` (length-k
    per-channel fill values, e.g. position sentinels + zero velocities).
    """
    n, k = sorted_packed.shape
    cap = capacity
    lanes = 2 * cap * k

    nr = _round_up(n, cap) // cap + 1
    pad = nr * cap - n
    fills = jnp.asarray(fills, jnp.float32)
    packed = jnp.concatenate(
        [sorted_packed, jnp.broadcast_to(fills, (pad, k))], axis=0
    )
    R = packed.reshape(nr, cap * k)

    s0 = starts[:num_cells]
    counts = jnp.minimum(starts[1 : num_cells + 1] - s0, cap)
    q = s0 // cap
    rc = (s0 % cap) * k

    nc_pad = _round_up(num_cells, _BC)
    if nc_pad > num_cells:
        zpad = jnp.zeros((nc_pad - num_cells,), jnp.int32)
        q = jnp.concatenate([q, zpad])
        rc = jnp.concatenate([rc, zpad])
        counts = jnp.concatenate([counts, zpad])

    W = jnp.take(R, jnp.stack([q, q + 1], axis=1).reshape(-1), axis=0)
    W = W.reshape(nc_pad, lanes)
    fill_row = jnp.tile(fills, 2 * cap)[None, :]  # [1, lanes]

    out = pl.pallas_call(
        _make_roll_kernel(k, cap, lanes),
        grid=(nc_pad // _BC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lanes), lambda t: (0, 0)),
            pl.BlockSpec((_BC, lanes), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((_BC, cap * k), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((nc_pad, cap * k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(rc, counts, fill_row, W)
    return out[:num_cells].reshape(num_cells, cap, k)
