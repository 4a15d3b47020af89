"""Plane-resident REBIN — the per-frame neighbor-structure rebuild without a sort.

The stream pipeline re-derives cell planes from scratch every frame: a 1M-key radix
sort, a packed perm gather, and the aligned-window plane kernel — ~19 ms/frame at 1M,
all to rediscover structure that barely changed (CFL bounds per-frame movement to
about one cell).  This module keeps particle state PLANE-RESIDENT — channel planes
``[gh, gw, C]`` of cell slots, carried across frames — and re-bins LOCALLY: a cell's
new occupants can only come from its 3x3 neighborhood, so the rebuild is one Pallas
kernel over windowed slot rows, no sort and no particle-order gathers at all.

This replaces the reference's entire per-frame binning pipeline —
``bin_particles_in_grid`` + 136 bitonic sort dispatches + offset scan
(`src/particle_compute.rs:106-163`) — with a single local compaction.

Kernel formulations (both exact vs the oracle; measured in protos/rebin_roll.py):

* ``variant=3`` (default): NO lane-roll chains — two MXU stages.  (1) the dest rank
  of every candidate = an inclusive prefix sum of the keep mask over the 9C-lane
  window, computed as ONE ``[BC, W9] x [W9, W9]`` matmul with the upper-triangular
  ones matrix (0/1 operands are exact at default precision, f32 accumulate);
  (2) the value apply = batched one-hot matmuls ``[suba, k, W9] x [suba, W9, C]``
  (precision=HIGHEST — values must pass through bit-exactly; one-hot times value
  sums exactly one nonzero term, so the result is bit-identical to a gather).
* ``variant=2``: staged log-shift compaction of a candidate-index vector (3
  lane-rolls per stage, 10 stages at C=64), then the same one-hot value apply.
  Latency-bound on the roll chain; kept as a fallback and cross-check.

Candidate ordering contract (pinned by the oracle test): a cell's new occupants are
ordered source-row-major (row r-1, then r, then r+1), then source-cell left-to-right,
then source-slot.  Deterministic, but NOT the stream path's (stable-sort by original
index) order — physics is order-independent inside a cell up to f32 addition order.

Drop contract: candidates beyond ``capacity`` slots are dropped (the stream path's
overflow analog), and particles that moved MORE than one cell in a frame are adopted
by no window and silently vanish — the per-cell candidate ``counts`` output lets the
caller account for both (``sum(min(counts, C))`` vs the previous live total).  The
resident step surfaces these as diagnostics; see ops/pallas/resident.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import GridSpec

BC = 128  # dest cells per program
SUBA = 8  # dest cells per one-hot apply batch
SENTINEL = 1.0e6  # dead-slot parking position (== ops/pallas/sph.py::_SENTINEL)


def _round_up(x, m):
    return -(-x // m) * m


def _make_kernel_v3(C: int, k: int, gw: int, gh: int, x_min: float, y_min: float,
                    cell_w: float, cell_h: float, fills: tuple, suba: int = SUBA):
    """Two-MXU-stage rebin: prefix-rank matmul + batched one-hot value apply."""
    W9 = 9 * C

    def kernel(ut_ref, *refs):
        wins = refs[: 3 * k]  # dy-major: wins[dy * k + ch]
        outs = refs[3 * k : 3 * k + k]
        cnt_ref = refs[3 * k + k]
        t = pl.program_id(0)

        laneC = jax.lax.broadcasted_iota(jnp.int32, (suba, C), 1)

        cat = lambda c: jnp.concatenate(
            [wins[dy * k + c][:] for dy in range(3)], axis=1)  # [BC, W9]
        x9, y9 = cat(0), cat(1)
        cell = (t * BC
                + jax.lax.broadcasted_iota(jnp.int32, (BC, 1), 0))  # [BC, 1]
        cy_dest = cell // gw
        cx_dest = cell - cy_dest * gw
        # keying == GridSpec.cell_coords (floor + clip, division form)
        kx = jnp.clip(jnp.floor((x9 - x_min) / cell_w).astype(jnp.int32),
                      0, gw - 1)
        ky = jnp.clip(jnp.floor((y9 - y_min) / cell_h).astype(jnp.int32),
                      0, gh - 1)
        # live test FIRST: sentinel slots clip into the bottom-right cell and
        # would otherwise be adopted by it
        keep = (x9 < 0.5 * SENTINEL) & (kx == cx_dest) & (ky == cy_dest)

        # Stage 1: ranks of kept lanes via one full-block MXU prefix sum.
        psum = jax.lax.dot_general(
            jnp.where(keep, 1.0, 0.0), ut_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BC, W9] inclusive prefix counts (exact: 0/1 x 0/1, f32 accumulate)
        rank = psum.astype(jnp.int32) - 1  # dest slot of each kept lane
        total = psum[:, W9 - 1 : W9].astype(jnp.int32)  # [BC, 1]

        vals9 = jnp.stack([cat(c) for c in range(k)], axis=1)  # [BC, k, W9]

        # Stage 2: batched one-hot value apply (dest-slot selection on the MXU).
        # Statically unrolled — Mosaic cannot lower dynamic_slice of kernel
        # VALUES (only of refs), so a fori_loop over suba batches won't compile.
        for i in range(BC // suba):
            r0 = i * suba
            rk = rank[r0 : r0 + suba]
            # Mosaic can't reshape i1 vectors to add a minor dim — lift the keep
            # mask to f32 in 2D first, then broadcast.
            kpf = jnp.where(keep[r0 : r0 + suba], 1.0, 0.0)  # [suba, W9] f32
            onehot = jnp.where(
                rk[:, :, None] == laneC[:, None, :], kpf[:, :, None], 0.0
            )  # [suba, W9, C]
            out = jax.lax.dot_general(
                vals9[r0 : r0 + suba], onehot, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [suba, k, C]
            tot = total[r0 : r0 + suba]
            for c in range(k):
                outs[c][r0 : r0 + suba, :] = jnp.where(
                    laneC < tot, out[:, c, :], jnp.float32(fills[c]))
        cnt_ref[:] = total

    return kernel


def _make_kernel_v2(C: int, k: int, gw: int, gh: int, x_min: float, y_min: float,
                    cell_w: float, cell_h: float, fills: tuple, suba: int = SUBA):
    """Staged log-shift index compaction + one-hot value apply (fallback)."""
    W9 = 9 * C
    nbits = max(1, (W9 - 1).bit_length())

    def kernel(*refs):
        wins = refs[: 3 * k]
        outs = refs[3 * k : 3 * k + k]
        cnt_ref = refs[3 * k + k]
        t = pl.program_id(0)

        lane9 = jax.lax.broadcasted_iota(jnp.int32, (suba, W9), 1)
        laneC = jax.lax.broadcasted_iota(jnp.int32, (suba, C), 1)

        def body(i, _):
            r0 = i * suba
            cell = t * BC + r0 + jax.lax.broadcasted_iota(jnp.int32, (suba, 1), 0)
            cy_dest = cell // gw
            cx_dest = cell - cy_dest * gw

            cat = lambda c: jnp.concatenate(
                [wins[dy * k + c][pl.ds(r0, suba), :] for dy in range(3)], axis=1)
            x9, y9 = cat(0), cat(1)
            kx = jnp.clip(jnp.floor((x9 - x_min) / cell_w).astype(jnp.int32),
                          0, gw - 1)
            ky = jnp.clip(jnp.floor((y9 - y_min) / cell_h).astype(jnp.int32),
                          0, gh - 1)
            keep = (x9 < 0.5 * SENTINEL) & (kx == cx_dest) & (ky == cy_dest)

            holes = jnp.where(keep, 0, 1)
            # inclusive prefix sum via log-shift adds (Mosaic has no cumsum)
            psum = holes
            for j in range(nbits):
                s = 1 << j
                if s >= W9:
                    break
                psum = psum + jnp.where(
                    lane9 < s, 0, pltpu.roll(psum, shift=s, axis=1))
            d = jnp.where(keep, psum - holes, 0)
            kp = jnp.where(keep, 1, 0)  # i32 — Mosaic can't roll bools
            idx = lane9
            for j in range(nbits):
                s = 1 << j
                if s >= W9:
                    break
                sh = W9 - s  # left-rotate by s (static shifts must be >= 0)
                ds = pltpu.roll(d, shift=sh, axis=1)
                ks = pltpu.roll(kp, shift=sh, axis=1)
                take = (ks == 1) & (((ds >> j) & 1) == 1)
                stay = (kp == 1) & (((d >> j) & 1) == 0)
                idx = jnp.where(take, pltpu.roll(idx, shift=sh, axis=1), idx)
                d = jnp.where(take, ds & ~s, jnp.where(stay, d, 0))
                kp = jnp.where(take | stay, 1, 0)
            total = jnp.sum(holes == 0, axis=1, keepdims=True).astype(jnp.int32)

            cidx = idx[:, :C]  # compacted source lane per dest slot
            onehot = (
                (lane9[:, :, None] == cidx[:, None, :])
                & (laneC[:, None, :] < total[:, :, None])
            ).astype(jnp.float32)  # [suba, W9, C]
            vals = jnp.stack([cat(c) for c in range(k)], axis=1)  # [suba, k, W9]
            out = jax.lax.dot_general(
                vals, onehot, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [suba, k, C]
            for c in range(k):
                outs[c][pl.ds(r0, suba), :] = jnp.where(
                    laneC < total, out[:, c, :], jnp.float32(fills[c]))
            cnt_ref[pl.ds(r0, suba), :] = total
            return 0

        jax.lax.fori_loop(0, BC // suba, body, 0)

    return kernel


def rebin_planes(planes, spec: GridSpec, fills=None, interpret: bool | None = None,
                 variant: int = 3):
    """Re-bin plane-resident channels by their (x, y) key channels.

    ``planes``: list of k ``[gh, gw, C]`` f32 channel planes; channels 0 and 1 are
    the keying x/y positions (dead slots MUST carry ``SENTINEL``).  ``fills`` gives
    each channel's dead-slot fill (default: SENTINEL for channels 0/1, else 0).

    Returns ``(new_planes, counts)`` with counts ``[gh*gw]`` int32 = per-cell
    CANDIDATE totals (values above C mean dropped overflow).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    gh, gw, C = planes[0].shape
    assert (gh, gw) == (spec.gh, spec.gw) and C == spec.capacity
    k = len(planes)
    nc = gh * gw
    if fills is None:
        fills = tuple(SENTINEL if c < 2 else 0.0 for c in range(k))
    fills = tuple(float(f) for f in fills)
    nc_pad = _round_up(nc, BC)

    def windows(p, fill):
        # ghost-pad one cell of sentinels, then three dx-shifted views -> [*, 3C]
        flat = p.reshape(nc, C)
        if nc_pad > nc:
            flat = jnp.concatenate(
                [flat, jnp.full((nc_pad - nc, C), fill, p.dtype)])
        ghost = jnp.full((1, C), fill, p.dtype)
        g2 = jnp.concatenate([ghost, flat, ghost])  # [nc_pad + 2, C]
        return jnp.concatenate([g2[:-2], g2[1:-1], g2[2:]], axis=1)

    outs = []
    for dy in (-1, 0, 1):
        for c in range(k):
            p = planes[c].reshape(nc, C)
            shift = dy * gw  # source row r+dy = flat cell stream shifted dy*gw
            if shift == 0:
                src = p
            elif shift < 0:
                src = jnp.concatenate(
                    [jnp.full((-shift, C), fills[c], p.dtype), p[:shift]])
            else:
                src = jnp.concatenate(
                    [p[shift:], jnp.full((shift, C), fills[c], p.dtype)])
            outs.append(windows(src, fills[c]))

    win_spec = pl.BlockSpec((BC, 3 * C), lambda t: (t, 0))
    out_specs = tuple([pl.BlockSpec((BC, C), lambda t: (t, 0))] * k
                      + [pl.BlockSpec((BC, 1), lambda t: (t, 0))])
    out_shape = tuple(
        [jax.ShapeDtypeStruct((nc_pad, C), jnp.float32)] * k
        + [jax.ShapeDtypeStruct((nc_pad, 1), jnp.int32)]
    )
    geom = (C, k, gw, gh, float(spec.x_min), float(spec.y_min),
            float(spec.cell_width), float(spec.cell_size), fills)
    if variant == 3:
        W9 = 9 * C
        ut = jnp.triu(jnp.ones((W9, W9), jnp.float32))
        res = pl.pallas_call(
            _make_kernel_v3(*geom),
            grid=(nc_pad // BC,),
            in_specs=[pl.BlockSpec((W9, W9), lambda t: (0, 0))]
            + [win_spec] * (3 * k),
            out_specs=out_specs,
            out_shape=out_shape,
            # vals9 [BC, k, W9] + the one-hot temporaries exceed the default 16 MB
            # scoped-vmem budget at production C (v5e VMEM is 128 MB).
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(ut, *outs)
    else:
        res = pl.pallas_call(
            _make_kernel_v2(*geom),
            grid=(nc_pad // BC,),
            in_specs=[win_spec] * (3 * k),
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*outs)
    new_planes = [r[:nc].reshape(gh, gw, C) for r in res[:k]]
    return new_planes, res[k][:nc, 0]
