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

Kernel formulations (all exact vs their oracles; measured in protos/rebin_roll.py,
protos/time_rebin_v3.py and protos/time_rebin_v4.py):

* ``variant=6``: ROW-FUSED lossless hole-fill — variant 5's exact semantics in ONE
  kernel.  v5 spends a large fraction of its time outside the two pass kernels:
  XLA window concats materialize [nc, 2C] copies of every channel twice, the two
  retention merges re-read in/out/acc, and each stage is a separate HBM round
  trip.  v6 makes the grid row the program unit: row r's program loads rows
  r±1 of every channel (plus px/py of rows r±2, needed only to RE-DERIVE the
  neighbor rows' adoption decisions for the retention rule) as clamped BlockSpec
  views — no window materialization at all — computes pass Y + Y-retention into
  VMEM scratch, runs pass X entirely in-register (the X window is a ±1 sublane
  shift of the row), and writes the final planes once.  Identical output to
  variant 5 bit-for-bit (pinned by tests/test_rebin.py); single-chip only (the
  band-sharded path drives the v5 passes directly with ghost rows).

* ``variant=5`` (default): LOSSLESS separable hole-fill — variant 4 plus three
  rules that make dropping impossible: holes = dead slots only (a mover vacates
  its slot only when a neighbor actually adopts it — an ``accepted`` mask feeds a
  host-side retention merge); the adoption test clamps the destination toward the
  source, so >1-cell/frame movers hop one cell per frame toward their
  destination; and retained/in-transit movers are DEFERRED — the physics step
  parks them out of the force walk for the frame, the stream path's
  capacity-overflow contract.  Costs one extra mask output + two elementwise
  merges over variant 4.

* ``variant=4``: SEPARABLE HOLE-FILL — the fast lossy formulation.
  Two observations kill most of the v3 cost: (a) only ~10-25% of particles change
  cell in a CFL-bounded frame, so full-window compaction re-places 4-10x more data
  than moved; (b) a one-cell-per-frame move decomposes into a row move then a
  column move.  Each frame runs two passes; in each, STAYERS KEEP THEIR SLOTS
  (holes are tolerated — the force kernels sentinel-mask dead slots anyway) and
  only the movers relocate, into the *holes* of the destination cell:

      pass Y: cell (r, c) adopts movers from (r±1, c) whose dest ROW is r
      pass X: cell (r, c) adopts movers from (r, c±1) whose dest cell is (r, c)

  Each pass sees a 2C-lane candidate window (two neighbor cells) instead of v3's
  9C, so the rank/one-hot/apply work shrinks ~4.5x per pass.  Mechanics per pass:
  arrival rank = prefix sum of the keep mask over the 2C window (one MXU matmul
  with the upper-triangular ones matrix), hole rank = prefix over the own C lanes,
  one-hot ``O[w, s] = keep[w] & hole[s] & (arank[w] == hrank[s])``, values applied
  by batched one-hot matmuls as in v3.

  Drop contract (stricter than v3 in one corner): a pass drops arrivals beyond the
  destination cell's *hole* count — so a particle can be dropped when its
  INTERMEDIATE cell (correct row, old column) is full even if its final cell had
  room.  Both passes' drops plus >1-cell CFL escapes show up as a live-count
  deficit; callers diff live totals (``counts`` returns final per-cell LIVE
  counts, always <= C).  Slot order is NOT compacted: live slots interleave with
  holes (sentinel-parked), which every consumer (force walks, rasterizer,
  ``to_particle_state``) already handles via live masks.

* ``variant=3``: single-pass full-window compaction — two MXU stages.  (1) the dest rank
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

# v4 tuning knobs (read at trace time; protos/time_rebin_v4.py sweeps them).
V4_BC = 128  # dest cells per program
V4_SUBA = 8  # dest cells per one-hot apply batch
# One-hot value apply precision.  Must stay HIGHEST: values pass through
# bit-exactly.  (HIGH/bf16_3x would also be exact for 0/1 x f32 operands, but
# this Mosaic toolchain rejects it: "Unsupported dot precision: HIGH" — retest
# per round via protos/time_rebin_v4.py "8,128,high".)
V4_PRECISION = jax.lax.Precision.HIGHEST

# v6 tuning knob: dest cells per one-hot apply batch (clipped down to the
# largest divisor of the padded row width that is a multiple of 8).
V6_SUBA = 24


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


def _make_kernel_v4(C: int, k: int, gw: int, gh: int, x_min: float, y_min: float,
                    cell_w: float, cell_h: float, fills: tuple, row_only: bool,
                    suba: int | None = None, bc: int | None = None,
                    lossless: bool = False, nc_valid: int | None = None):
    """One separable hole-fill pass: stayers keep slots, movers fill dest holes.

    Window refs are ``[BC, 2C]`` per channel: lanes [0, C) = the upstream neighbor
    cell (cell − shift), lanes [C, 2C) = downstream (cell + shift).  ``row_only``
    selects the pass-Y keep test (dest row == own row; column ignored — the mover
    lands in (dest_row, src_col) as a transit stop) vs the pass-X full-cell test.

    ``lossless`` (the v5 semantics) changes three things so that NO particle is
    ever dropped:

    * holes = DEAD slots only — a mover's slot is not offered as a hole, because
      the mover only vacates if some neighbor actually adopts it;
    * the keep test CLAMPS the destination toward the source (pass Y, group from
      row r−1: adopt if dest_row >= own row), so >1-cell/frame movers hop one
      cell per frame toward their destination instead of escaping;
    * an ``accepted`` mask over the window lanes is emitted; the host-side
      retention merge (:func:`_retention_merge`) puts every un-adopted mover back
      in its source slot.  Retained movers are "deferred": their destination cell
      differs from their resident cell, and the physics step parks them out of
      the force walk for the frame — exactly the stream path's capacity-overflow
      contract (ops/grid.py: overflow particles exert/receive no grid forces).
    """
    W2 = 2 * C
    suba = V4_SUBA if suba is None else suba
    bc = V4_BC if bc is None else bc

    def kernel(off_ref, uta_ref, uth_ref, *refs):
        wins = refs[:k]
        owns = refs[k : 2 * k]
        outs = refs[2 * k : 2 * k + k]
        cnt_ref = refs[2 * k + k]
        acc_ref = refs[2 * k + k + 1] if lossless else None
        t = pl.program_id(0)

        # Band sharding: ``off_ref`` holds this shard's first GLOBAL cell row
        # (0 on a single chip); destination-row compares are in global rows.
        cell = t * bc + jax.lax.broadcasted_iota(jnp.int32, (bc, 1), 0)
        cy = cell // gw + off_ref[0]
        cx = cell - (cell // gw) * gw
        valid_cell = (cell < nc_valid) if nc_valid is not None else (cell >= 0)

        def dest(x, y):
            kx = jnp.clip(jnp.floor((x - x_min) / cell_w).astype(jnp.int32),
                          0, gw - 1)
            ky = jnp.clip(jnp.floor((y - y_min) / cell_h).astype(jnp.int32),
                          0, gh - 1)
            return kx, ky

        # keep: live window lanes whose destination is THIS cell (live test first:
        # sentinels clip into the bottom-right cell).
        wx, wy = wins[0][:], wins[1][:]
        kxw, kyw = dest(wx, wy)
        wlive = wx < 0.5 * SENTINEL
        if not lossless:
            keep = (wlive & (kyw == cy)) if row_only else (
                wlive & (kyw == cy) & (kxw == cx))
            keep = keep & valid_cell
        else:
            # Clamped adoption: group 0 lanes come from the upstream cell (row
            # r−1 / col c−1), group 1 from downstream.  A multi-cell mover is
            # adopted by the next cell TOWARD its destination.  The two group
            # tests are mutually exclusive, so no double adoption.
            lane = jax.lax.broadcasted_iota(jnp.int32, (bc, W2), 1)
            g0 = lane < C
            g1 = jnp.logical_not(g0)
            # (no jnp.where over bools: Mosaic cannot lower the i8->i1 truncation)
            if row_only:
                keep = wlive & ((g0 & (kyw >= cy)) | (g1 & (kyw <= cy)))
            else:
                # Column-pass windows are FLAT shifts: at row edges the lane
                # wraps to the adjacent row's far cell, which is NOT a neighbor.
                # v4's exact-match row test rejects those for free; the clamped
                # test must exclude them explicitly (in-transit particles there
                # can satisfy kyw == cy), else a wrapped lane gets adopted AND
                # retained — a duplication (caught by the conservation bench).
                keep = wlive & (kyw == cy) & (
                    (g0 & (kxw >= cx) & (cx > 0))
                    | (g1 & (kxw <= cx) & (cx < gw - 1)))
            keep = keep & valid_cell

        # stay: live own lanes staying put this pass.
        ox, oy = owns[0][:], owns[1][:]
        kxo, kyo = dest(ox, oy)
        olive = ox < 0.5 * SENTINEL
        if row_only:
            stay = olive & (kyo == cy)
        elif lossless:
            # Row-transit slots (dest row not yet this row) cannot move in the
            # column pass — they stay and retry rows next frame.
            stay = olive & ((kyo != cy) | (kxo == cx))
        else:
            stay = olive & (kyo == cy) & (kxo == cx)
        # Lossy: every non-stayer (dead or mover) is a fillable hole.  Lossless:
        # only DEAD slots are holes — movers vacate solely via adoption.
        hole = jnp.logical_not(olive) if lossless else jnp.logical_not(stay)

        # Ranks via MXU prefix sums (0/1 x 0/1 triangular matmuls are exact).
        apsum = jax.lax.dot_general(
            jnp.where(keep, 1.0, 0.0), uta_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BC, W2] inclusive
        arank = apsum.astype(jnp.int32) - 1
        narr = apsum[:, W2 - 1 : W2].astype(jnp.int32)  # [BC, 1]
        hpsum = jax.lax.dot_general(
            jnp.where(hole, 1.0, 0.0), uth_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BC, C]
        hrank = hpsum.astype(jnp.int32) - 1
        nlive = jnp.sum(jnp.where(stay, 1.0, 0.0), axis=1, keepdims=True) + \
            jnp.minimum(narr.astype(jnp.float32), hpsum[:, C - 1 : C])

        # Statically unrolled suba batches (Mosaic cannot dynamic-slice VALUES).
        for i in range(bc // suba):
            r0 = i * suba
            kpf = jnp.where(keep[r0 : r0 + suba], 1.0, 0.0)  # [suba, W2]
            hf = jnp.where(hole[r0 : r0 + suba], 1.0, 0.0)  # [suba, C]
            rk = arank[r0 : r0 + suba]
            hr = hrank[r0 : r0 + suba]
            eq = rk[:, :, None] == hr[:, None, :]  # [suba, W2, C]
            onehot = jnp.where(eq, kpf[:, :, None] * hf[:, None, :], 0.0)
            vals = jnp.stack(
                [wins[c][r0 : r0 + suba, :] for c in range(k)], axis=1
            )  # [suba, k, W2]
            app = jax.lax.dot_general(
                vals, onehot, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=V4_PRECISION,
            )  # [suba, k, C]
            filled = hole[r0 : r0 + suba] & (
                hrank[r0 : r0 + suba] < narr[r0 : r0 + suba])
            stays = stay[r0 : r0 + suba]
            for c in range(k):
                outs[c][r0 : r0 + suba, :] = jnp.where(
                    stays, owns[c][r0 : r0 + suba, :],
                    jnp.where(filled, app[:, c, :], jnp.float32(fills[c])))
        cnt_ref[:] = nlive.astype(jnp.int32)
        if lossless:
            nholes = hpsum[:, C - 1 : C].astype(jnp.int32)
            acc_ref[:] = jnp.where(keep & (arank < nholes), 1.0, 0.0)

    return kernel


def _hole_fill_pass(flats, spec: GridSpec, fills, shift: int, row_only: bool,
                    interpret: bool, lossless: bool = False, ghosts=None,
                    row_offset=None, nc_valid: int | None = None):
    """Run one v4/v5 pass over flat ``[nc_pad, C]`` channel arrays (pre-padded
    with their fills).  Returns (new_flats, live_counts[nc_pad], accepted) where
    ``accepted`` is the [nc_pad, 2C] adoption mask (lossless only, else None).

    Band sharding hooks (parallel/plane_sharded.py): ``ghosts`` = per-channel
    ``(lo_row, hi_row)`` [shift, C] blocks that replace the out-of-range window
    fills (the ppermute'd neighbor-band boundary rows); ``row_offset`` = this
    shard's first global cell row (traced scalar); ``nc_valid`` masks the cells
    beyond the shard's real cell count so pad cells never adopt."""
    nc_pad, C = flats[0].shape
    k = len(flats)
    W2 = 2 * C
    bc = V4_BC

    nc_real = nc_valid if nc_valid is not None else nc_pad

    def shifted(p, sh, fill, ghost=None):
        # window lane group = plane[cell - sh] (upstream when sh > 0)
        blk = (jnp.full((abs(sh), C), fill, p.dtype) if ghost is None
               else ghost.reshape(abs(sh), C).astype(p.dtype))
        if sh > 0:
            return jnp.concatenate([blk, p[:-sh]])
        # Downstream: the ghost block belongs at the REAL tail rows
        # [nc_real − |sh|, nc_real), before any cell padding.
        sh = -sh
        pad = jnp.full((nc_pad - nc_real, C), fill, p.dtype)
        return jnp.concatenate([p[sh:nc_real], blk, pad])

    wins = [
        jnp.concatenate(
            [shifted(p, shift, f, None if ghosts is None else ghosts[c][0]),
             shifted(p, -shift, f, None if ghosts is None else ghosts[c][1])],
            axis=1)
        for c, (p, f) in enumerate(zip(flats, fills))
    ]
    uta = jnp.triu(jnp.ones((W2, W2), jnp.float32))
    uth = jnp.triu(jnp.ones((C, C), jnp.float32))
    win_spec = pl.BlockSpec((bc, W2), lambda t: (t, 0))
    own_spec = pl.BlockSpec((bc, C), lambda t: (t, 0))
    out_specs = [own_spec] * k + [pl.BlockSpec((bc, 1), lambda t: (t, 0))]
    out_shape = [jax.ShapeDtypeStruct((nc_pad, C), jnp.float32)] * k + [
        jax.ShapeDtypeStruct((nc_pad, 1), jnp.int32)]
    if lossless:
        out_specs.append(win_spec)
        out_shape.append(jax.ShapeDtypeStruct((nc_pad, W2), jnp.float32))
    off = (jnp.zeros((1,), jnp.int32) if row_offset is None
           else jnp.asarray(row_offset, jnp.int32).reshape(1))
    res = pl.pallas_call(
        _make_kernel_v4(C, k, spec.gw, spec.gh, float(spec.x_min),
                        float(spec.y_min), float(spec.cell_width),
                        float(spec.cell_size), fills, row_only,
                        lossless=lossless, nc_valid=nc_valid),
        grid=(nc_pad // bc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((W2, W2), lambda t: (0, 0)),
                  pl.BlockSpec((C, C), lambda t: (0, 0))]
        + [win_spec] * k + [own_spec] * k,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(off, uta, uth, *wins, *flats)
    acc = res[k + 1] if lossless else None
    return list(res[:k]), res[k][:, 0], acc


def _retention_merge(in_flats, out_flats, acc, spec: GridSpec, shift: int,
                     row_only: bool, row_offset=None, extra_adopted=None):
    """Put un-adopted movers back in their source slots (the v5 no-drop rule).

    ``acc`` rows are DEST cells: group-0 lane j says "I adopted slot j of cell
    (me − shift)", group 1 "... of cell (me + shift)".  Re-aligned to source
    rows, a mover is adopted iff either neighbor took it; everything else that
    moved keeps its old slot (and stays out of the force walk until it lands —
    see the kernel docstring)."""
    nc_pad, C = in_flats[0].shape

    def shback(p, sh):
        # value at source row s = p[s + sh]
        blk = jnp.zeros((abs(sh), C), p.dtype)
        return (jnp.concatenate([p[sh:], blk]) if sh > 0
                else jnp.concatenate([blk, p[: sh]]))

    adopted = shback(acc[:, :C], shift) + shback(acc[:, C:], -shift)
    if extra_adopted is not None:  # remote (cross-band) adoption, already aligned
        adopted = adopted + extra_adopted
    x, y = in_flats[0], in_flats[1]
    kx = jnp.clip(jnp.floor((x - spec.x_min) / spec.cell_width).astype(jnp.int32),
                  0, spec.gw - 1)
    ky = jnp.clip(jnp.floor((y - spec.y_min) / spec.cell_size).astype(jnp.int32),
                  0, spec.gh - 1)
    cellr = jnp.arange(nc_pad, dtype=jnp.int32)[:, None]
    cy = cellr // spec.gw + (0 if row_offset is None
                             else jnp.asarray(row_offset, jnp.int32))
    cx = cellr - (cellr // spec.gw) * spec.gw
    live = x < 0.5 * SENTINEL
    mover = (live & (ky != cy)) if row_only else (
        live & (ky == cy) & (kx != cx))
    retain = mover & (adopted < 0.5)
    return [jnp.where(retain, i, o) for i, o in zip(in_flats, out_flats)]


def _make_kernel_v6(C: int, k: int, gw: int, gh: int, GWP: int, x_min: float,
                    y_min: float, cell_w: float, cell_h: float, fills: tuple,
                    suba: int):
    """Row-fused lossless rebin: v5's pass Y + retention + pass X + retention in
    ONE kernel per grid row (see the module docstring).  Cells of the row ride
    the SUBLANE dim ([GWP, C] blocks), so the pass-X window is a ±1 sublane
    shift and needs no materialization; the pass-Y window rows arrive as
    clamped BlockSpec views of the same planes (no copies).  Retention re-derives
    the neighbor rows' adoption decisions from first principles — the only
    inputs that costs are px/py views of rows r±2 (keep-count competition).

    All rank prefixes are [GWP, C] x triu[C, C] MXU matmuls (0/1 exact); the
    down-group window rank adds the up-group's kept count, reproducing v4/v5's
    single [*, 2C] window prefix bit-for-bit.

    ``off_ref`` (SMEM, int32[1]) holds the slab's first GLOBAL grid row: 0 on a
    single chip, ``band * R`` on the band-sharded mesh (parallel/plane_sharded).
    Every row compare (edge guards, destination-row tests) is in global rows, so
    a band slab program sees bit-identical inputs to the same row's full-plane
    program — the sharded rebin output equals the single-chip one exactly.
    """
    W2 = 2 * C
    HI = V4_PRECISION

    def kernel(off_ref, ut_ref, *refs):
        # refs layout: px views (r-2..r+1), py views (r-2..r+1),
        # value-channel views (r-1, r, r+1) per channel c in [2, k),
        # then k out refs + counts, then k VMEM scratch (pass-Y result).
        # Row r+2 is NOT needed anywhere: row-r lanes are the g0 (first) group
        # of row r+1's window, so r+2 arrivals rank strictly after them and
        # cannot affect row-r adoptions.
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
        rv = jnp.zeros((GWP, 1), jnp.int32) + rr           # own global row
        colv = jax.lax.broadcasted_iota(jnp.int32, (GWP, 1), 0)  # own column
        laneC = jax.lax.broadcasted_iota(jnp.int32, (suba, C), 1)
        f32 = lambda m: jnp.where(m, 1.0, 0.0)

        def destxy(x, y):
            kx = jnp.clip(jnp.floor((x - x_min) / cell_w).astype(jnp.int32),
                          0, gw - 1)
            ky = jnp.clip(jnp.floor((y - y_min) / cell_h).astype(jnp.int32),
                          0, gh - 1)
            return kx, ky

        live = lambda x: x < 0.5 * SENTINEL

        def prefix(maskf):
            # inclusive prefix count along lanes (exact: 0/1 x 0/1, f32 acc)
            return jax.lax.dot_general(
                maskf, ut_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def rowsum(maskf):
            return jnp.sum(maskf, axis=1, keepdims=True)

        # Channel accessors in window-channel order (px, py, then values).
        own_ch = [px0, py0] + val0
        up_ch = [pxm1, pym1] + valm1
        dn_ch = [pxp1, pyp1] + valp1

        # ---------------- air-window skip ----------------
        # A row whose full input window (the IN-DOMAIN rows among r-1, r, r+1)
        # holds no live particle produces all-fill outputs and zero counts:
        # pass Y has no keeps/stays/movers (rows r+-2 only matter as adoption
        # competition INTO r+-1 for row-r movers, of which there are none),
        # and pass X compacts an all-dead mid.  Settled fluids are mostly air
        # rows (a settled 50k pool: 7 live rows of 121 -- protos/
        # occupancy_settled.py; the rebin measured grid-bound at 4.04 ms
        # regardless of occupancy -- protos/time_ref50k.py), so skipping them
        # takes the rebin off the settled/small-scene frame floor.  Pure skip:
        # outputs are bit-equal (pinned by the v5==v6 and band-slab bitwise
        # tests).  Mesh-edge ghost rows on the sharded path can only look
        # LIVE (ppermute zeros pass the sentinel test), which merely disables
        # the skip on edge rows -- never a false skip.
        anyv = jnp.max(f32(live(px0)))
        anyv = anyv + jnp.max(f32(live(pxm1)) * f32(rv >= 1))
        anyv = anyv + jnp.max(f32(live(pxp1)) * f32(rv <= gh - 2))
        win_live = anyv > 0.5

        @pl.when(jnp.logical_not(win_live))
        def _():
            for c in range(k):
                outs[c][0, :, :] = jnp.full((GWP, C), fills[c], jnp.float32)
            cnt_ref[0, :, :] = jnp.zeros((GWP, 1), jnp.int32)

        @pl.when(win_live)
        def _():
            # ---------------- pass Y: adoption into row r ----------------
            kx0, ky0 = destxy(px0, py0)
            live0 = live(px0)
            _, kym1 = destxy(pxm1, pym1)
            _, kyp1 = destxy(pxp1, pyp1)
            livem1 = live(pxm1) & (rv >= 1)
            livep1 = live(pxp1) & (rv <= gh - 2)
            keep_m1 = livem1 & (kym1 >= rv)     # clamped hop toward dest
            keep_p1 = livep1 & (kyp1 <= rv)
            deadY = jnp.logical_not(live0)
            stayY = live0 & (ky0 == rv)

            kpf_m1, kpf_p1 = f32(keep_m1), f32(keep_p1)
            pr_m1 = prefix(kpf_m1)
            pr_p1 = prefix(kpf_p1)
            n_m1 = pr_m1[:, C - 1 : C]
            arank_m1 = pr_m1.astype(jnp.int32) - 1
            arank_p1 = (n_m1 + pr_p1).astype(jnp.int32) - 1
            hdf = f32(deadY)
            hps = prefix(hdf)
            hrank = hps.astype(jnp.int32) - 1
            narr = (n_m1 + pr_p1[:, C - 1 : C]).astype(jnp.int32)

            keepW = jnp.concatenate([kpf_m1, kpf_p1], axis=1)        # [GWP, 2C] f32
            arankW = jnp.concatenate([arank_m1, arank_p1], axis=1)
            winY = [jnp.concatenate([u, d], axis=1) for u, d in zip(up_ch, dn_ch)]

            def apply_pass(keepWf, arankWi, hrk, deadf, nar, win_ch, stay_mask,
                           own_vals, out_write):
                """Rank-factorized hole-fill apply, suba cells per batch.

                The direct one-hot ``OH[w, s] = keep[w]·hole[s]·(arank[w]==hr[s])``
                needs arank (a LANE-indexed value) broadcast along a new minor s
                axis — a lane->sublane relayout that measured ~5.4 of the kernel's
                7.1 ms at 1M (protos/time_rebin_v6split.py: no_dot 6.75 vs
                no_onehot 1.35; the dot itself was ~0.4).  Factor it through rank
                space instead: ``OH = P_aᵀ·P_h`` with ``P_a[j, w] = keep[w] &
                (arank[w]==j)`` and ``P_h[j, s] = hole[s] & (hr[s]==j) & (j <
                narr)`` — both build in NATIVE layout (rank values stay on lanes,
                the j axis is a sublane iota), and the apply becomes two exact 0/1
                matmuls: ``M1 = vals·P_aᵀ`` then ``out = M1·P_h``.  A filled slot
                receives exactly one nonzero term through its unique rank j, so
                value pass-through stays BIT-exact (HIGHEST precision, f32
                accumulate).  Measured 7.12 -> 4.07 ms; bit-identity vs the eq
                form pinned by the proto's guard and the v5≡v6 test surface.
                out_write(sl, per-channel [suba, C] values) commits each batch."""
                for i in range(GWP // suba):
                    sl = slice(i * suba, (i + 1) * suba)
                    jio = jax.lax.broadcasted_iota(
                        jnp.int32, (suba, C, W2), 1)  # j on sublanes
                    pa = jnp.where(
                        (jio == arankWi[sl][:, None, :])
                        & (keepWf[sl][:, None, :] > 0.5), 1.0, 0.0)
                    hr = hrk[sl]
                    ph = jnp.where(
                        (jio[:, :, :C] == hr[:, None, :])
                        & (deadf[sl][:, None, :] > 0.5)
                        & (hr[:, None, :] < nar[sl][:, :, None]),
                        1.0, 0.0)  # [suba, C(j), C(s)]
                    vals = jnp.stack([w[sl] for w in win_ch], axis=1)  # [suba,k,2C]
                    m1 = jax.lax.dot_general(
                        vals, pa, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32, precision=HI)
                    app = jax.lax.dot_general(
                        m1, ph, (((2,), (1,)), ((0,), (0,))),
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

            # ----- Y retention: was a row-r mover adopted by row r-1 / r+1? -----
            moverY = live0 & (ky0 != rv)
            _, kym2 = destxy(pxm2, pym2)
            livem2 = live(pxm2) & (rv >= 2)
            # row r-1's window = [row r-2 (g0), row r (g1)]
            keep_up_into_m1 = livem2 & (kym2 >= rv - 1)
            keep_r_into_m1 = live0 & (ky0 <= rv - 1) & (rv >= 1)
            arank_r_in_m1 = (rowsum(f32(keep_up_into_m1))
                             + prefix(f32(keep_r_into_m1))).astype(jnp.int32) - 1
            nholes_m1 = rowsum(f32(jnp.logical_not(live(pxm1)))).astype(jnp.int32)
            adopted_up = keep_r_into_m1 & (arank_r_in_m1 < nholes_m1)
            # row r+1's window = [row r (g0), row r+2 (g1)]: row-r lanes have no offset
            keep_r_into_p1 = live0 & (ky0 >= rv + 1) & (rv <= gh - 2)
            arank_r_in_p1 = prefix(f32(keep_r_into_p1)).astype(jnp.int32) - 1
            nholes_p1 = rowsum(f32(jnp.logical_not(live(pxp1)))).astype(jnp.int32)
            adopted_dn = keep_r_into_p1 & (arank_r_in_p1 < nholes_p1)
            retainY = moverY & jnp.logical_not(adopted_up | adopted_dn)

            mid = [jnp.where(retainY, own_ch[c], scr[c][...]) for c in range(k)]

            # ---------------- pass X within the row ----------------
            mkx, mky = destxy(mid[0], mid[1])
            liveM = live(mid[0])

            def shift_dn(a, fill):  # value at column c comes from column c-1
                top = jnp.full((1, a.shape[1]), fill, a.dtype)
                return jnp.concatenate([top, a[:-1]], axis=0)

            def shift_up(a, fill):  # value at column c comes from column c+1
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
            pr_g0 = prefix(kg0f)
            pr_g1 = prefix(kg1f)
            ng0 = pr_g0[:, C - 1 : C]
            arank_g0 = pr_g0.astype(jnp.int32) - 1
            arank_g1 = (ng0 + pr_g1).astype(jnp.int32) - 1
            hdfX = f32(deadX)
            hpsX = prefix(hdfX)
            hrankX = hpsX.astype(jnp.int32) - 1
            nholesX = hpsX[:, C - 1 : C].astype(jnp.int32)
            narrX = (ng0 + pr_g1[:, C - 1 : C]).astype(jnp.int32)

            keepX = jnp.concatenate([kg0f, kg1f], axis=1)
            arankX = jnp.concatenate([arank_g0, arank_g1], axis=1)
            winX = [jnp.concatenate([shift_dn(m, fills[c]),
                                     shift_up(m, fills[c])], axis=1)
                    for c, m in enumerate(mid)]

            # X retention, computed BEFORE the apply overwrites out refs: adoption
            # of cell c's movers is its neighbors' (g1 at c-1, g0 at c+1) decision.
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


def _rebin_v6(planes, spec: GridSpec, fills, interpret: bool):
    gh, gw, C = planes[0].shape
    k = len(planes)
    GWP = _round_up(gw, 8)
    suba = V6_SUBA
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
    for ch in (0, 1):  # px, py: rows r-2..r+1 (r+2 provably never needed)
        for dy in (-2, -1, 0, 1):
            in_specs.append(view(dy))
            operands.append(pp[ch])
    for c in range(2, k):  # value channels: rows r-1..r+1
        for dy in (-1, 0, 1):
            in_specs.append(view(dy))
            operands.append(pp[c])

    out_specs = [pl.BlockSpec((1, GWP, C), lambda r: (r, 0, 0))] * k + [
        pl.BlockSpec((1, GWP, 1), lambda r: (r, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((gh, GWP, C), jnp.float32)] * k + [
        jax.ShapeDtypeStruct((gh, GWP, 1), jnp.int32)]

    res = pl.pallas_call(
        _make_kernel_v6(C, k, gw, gh, GWP, float(spec.x_min), float(spec.y_min),
                        float(spec.cell_width), float(spec.cell_size), fills,
                        suba),
        grid=(gh,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((GWP, C), jnp.float32)] * k,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    new_planes = [r[:, :gw, :] for r in res[:k]]
    counts = res[k][:, :gw, 0].reshape(gh * gw)
    return new_planes, counts


def _rebin_v6_band(planes, spec: GridSpec, fills, row0, lo2, lo1, hi1,
                   interpret: bool):
    """Band-sharded row-fused rebin: variant 6 on a ``[R, gw, C]`` slab.

    ``row0``: traced int32 — the slab's first GLOBAL grid row.  Ghost rows (the
    2-deep ppermute halo, parallel/plane_sharded.py):

    * ``lo2``: (px, py) ``[gw, C]`` at global row ``row0 − 2`` — needed only to
      re-derive row ``row0 − 1``'s adoption competition for the retention rule;
    * ``lo1``: all k channels at row ``row0 − 1``;
    * ``hi1``: all k channels at row ``row0 + R``.

    Mesh-edge ghosts may be arbitrary (ppermute zeros): every kernel read of a
    neighbor row is guarded by the global-row edge conditions (``rv >= 1``,
    ``rv >= 2``, ``rv <= gh − 2``), so out-of-domain ghost contents never reach
    an adoption or retention decision — no validity-mask exchange is needed.

    Output is bit-identical to running :func:`_rebin_v6` on the full plane and
    slicing this band's rows (each row program sees the same inputs and global
    row index).  Replaces the v5 two-pass + acceptance-return + retention-merge
    sharded schedule (the round-4 ~14 ms/chip overhead's main term).
    """
    R, gw, C = planes[0].shape
    k = len(planes)
    gh = spec.gh
    GWP = _round_up(gw, 8)
    suba = V6_SUBA
    while GWP % suba != 0 or suba % 8 != 0:
        suba -= 8 if suba > 8 else 1
        if suba < 1:
            suba = GWP
            break

    def padw(a, f):
        # a: [rows, gw, C] -> [rows, GWP, C]
        if GWP == gw:
            return a
        return jnp.concatenate(
            [a, jnp.full(a.shape[:1] + (GWP - gw, C), f, jnp.float32)], axis=1)

    # Extended slabs: px/py rows [row0-2, row0+R], values [row0-1, row0+R].
    ext = []
    for c in range(k):
        rows = [lo1[c][None], planes[c], hi1[c][None]]
        if c < 2:
            rows.insert(0, lo2[c][None])
        ext.append(padw(jnp.concatenate(rows, axis=0), fills[c]))
    ut = jnp.triu(jnp.ones((C, C), jnp.float32))

    def view(off):
        return pl.BlockSpec((1, GWP, C), lambda r, off=off: (r + off, 0, 0))

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((C, C), lambda r: (0, 0))]
    operands = [jnp.asarray(row0, jnp.int32).reshape(1), ut]
    for ch in (0, 1):  # px, py: global rows r-2..r+1 -> ext rows r..r+3
        for dy in (-2, -1, 0, 1):
            in_specs.append(view(dy + 2))
            operands.append(ext[ch])
    for c in range(2, k):  # value channels: rows r-1..r+1 -> ext rows r..r+2
        for dy in (-1, 0, 1):
            in_specs.append(view(dy + 1))
            operands.append(ext[c])

    out_specs = [pl.BlockSpec((1, GWP, C), lambda r: (r, 0, 0))] * k + [
        pl.BlockSpec((1, GWP, 1), lambda r: (r, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((R, GWP, C), jnp.float32)] * k + [
        jax.ShapeDtypeStruct((R, GWP, 1), jnp.int32)]

    res = pl.pallas_call(
        _make_kernel_v6(C, k, gw, gh, GWP, float(spec.x_min), float(spec.y_min),
                        float(spec.cell_width), float(spec.cell_size), fills,
                        suba),
        grid=(R,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((GWP, C), jnp.float32)] * k,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    new_planes = [r[:, :gw, :] for r in res[:k]]
    counts = res[k][:, :gw, 0].reshape(R * gw)
    return new_planes, counts


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
                 variant: int = 5):
    """Re-bin plane-resident channels by their (x, y) key channels.

    ``planes``: list of k ``[gh, gw, C]`` f32 channel planes; channels 0 and 1 are
    the keying x/y positions (dead slots MUST carry ``SENTINEL``).  ``fills`` gives
    each channel's dead-slot fill (default: SENTINEL for channels 0/1, else 0).

    Returns ``(new_planes, counts)``, counts ``[gh*gw]`` int32.  Variants 2/3:
    counts = per-cell CANDIDATE totals (values above C mean dropped overflow) and
    live slots are compacted to the low lanes.  Variants 4/5/6: counts = per-cell
    final LIVE totals (always <= C) and live slots stay interleaved with sentinel
    holes; variants 5 (default) and 6 (row-fused single kernel, bit-identical
    output to 5) additionally never drop — un-adopted movers are retained in
    place (see the module docstring for the full contract).
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

    if variant == 6:
        return _rebin_v6(planes, spec, fills, interpret)

    if variant in (4, 5):
        lossless = variant == 5

        def flat(p, f):
            x = p.reshape(nc, C)
            if nc_pad > nc:
                x = jnp.concatenate(
                    [x, jnp.full((nc_pad - nc, C), f, jnp.float32)])
            return x

        flats = [flat(p, f) for p, f in zip(planes, fills)]
        mid, _, acc = _hole_fill_pass(flats, spec, fills, spec.gw, True,
                                      interpret, lossless)
        if lossless:
            mid = _retention_merge(flats, mid, acc, spec, spec.gw, True)
        out, cnts, acc = _hole_fill_pass(mid, spec, fills, 1, False, interpret,
                                         lossless)
        if lossless:
            out = _retention_merge(mid, out, acc, spec, 1, False)
            cnts = jnp.sum(out[0] < 0.5 * SENTINEL, axis=1, dtype=jnp.int32)
        return [x[:nc].reshape(gh, gw, C) for x in out], cnts[:nc]

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
