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


_SUB = 8  # cells per vectorized batch (one full sublane tile)


def _make_roll_kernel(k: int, cap: int, lanes: int):
    """Batched log-roll: 8 cells per [8, lanes] vreg batch.

    A per-cell DYNAMIC rotate (tpu.dynamic_rotate) driven from an SMEM scalar loop
    costs ~300 cycles/cell — scalar loads and the per-row rotate serialize (measured
    ~9 ms/frame at 1M).  Instead, each cell's roll amount ``rq = s0 % cap`` is
    decomposed into its ceil(log2(cap)) bits and applied as STATIC-shift roll stages
    shared by the whole 8-cell batch, with a per-sublane select picking rolled vs
    unrolled per cell.  No scalars, no serialization: ~6 stages x 2 vector ops on
    [8, lanes] per 8 cells."""
    nbits = max(1, (cap - 1).bit_length())

    def kernel(rq_ref, cnt_ref, fill_ref, w_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, lanes), 1)
        pidx = lane // k  # slot index of each AoS lane

        # Two independent 8-cell batches per iteration: the 6-stage roll/select
        # chain is loop-carried (latency-bound, ~100+ cycles per dependent op) —
        # interleaving lets the scheduler overlap the two chains.
        def one(r0):
            x = w_ref[pl.ds(r0, _SUB), :]
            rq = rq_ref[pl.ds(r0, _SUB), :]  # [SUB, 1] roll amount / k
            cnt = cnt_ref[pl.ds(r0, _SUB), :]  # [SUB, 1]
            for j in range(nbits):
                bit = (rq >> j) & 1
                # left-rotate by 2^j*k lanes == right-roll by lanes - 2^j*k
                x = jnp.where(
                    bit == 1, pltpu.roll(x, shift=lanes - (1 << j) * k, axis=1), x
                )
            vals = jnp.where(pidx < cnt, x, fill_ref[:])
            out_ref[pl.ds(r0, _SUB), :] = vals[:, : cap * k]

        def body(i, _):
            one(i * 2 * _SUB)
            one(i * 2 * _SUB + _SUB)
            return 0

        jax.lax.fori_loop(0, _BC // (2 * _SUB), body, 0)

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
    rq = s0 % cap  # roll amount in slot units (the kernel shifts by rq * k lanes)

    nc_pad = _round_up(num_cells, _BC)
    if nc_pad > num_cells:
        zpad = jnp.zeros((nc_pad - num_cells,), jnp.int32)
        q = jnp.concatenate([q, zpad])
        rq = jnp.concatenate([rq, zpad])
        counts = jnp.concatenate([counts, zpad])

    W = jnp.take(R, jnp.stack([q, q + 1], axis=1).reshape(-1), axis=0)
    W = W.reshape(nc_pad, lanes)
    fill_row = jnp.tile(fills, 2 * cap)[None, :]  # [1, lanes]

    out = pl.pallas_call(
        _make_roll_kernel(k, cap, lanes),
        grid=(nc_pad // _BC,),
        in_specs=[
            pl.BlockSpec((_BC, 1), lambda t: (t, 0)),
            pl.BlockSpec((_BC, 1), lambda t: (t, 0)),
            pl.BlockSpec((1, lanes), lambda t: (0, 0)),
            pl.BlockSpec((_BC, lanes), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((_BC, cap * k), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((nc_pad, cap * k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(rq[:, None], counts[:, None], fill_row, W)
    return out[:num_cells].reshape(num_cells, cap, k)
