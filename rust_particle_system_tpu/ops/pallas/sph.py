"""Fused SPH force kernels — Pallas TPU (the production step for configs 1 & 4).

The reference walks each particle's 9-cell sorted runs three times per frame in WGSL
(`assets/compute_shader.wgsl:207-254, 256-334, 336-384`).  Here the same physics runs
as **two** Pallas passes over a cell-dense plane layout (spec v2: viscosity over
pre-pressure velocities — see ops/reference_step.py — lets pressure + viscosity share
one walk):

    pass 1  density:            (Σ v², Σ v³) over predicted positions
    pass 2  pressure+viscosity: (fx, fy, fvx, fvy) in ONE neighbourhood walk

Plane layout (unchanged from round 1):

    plane[gh + 2, W + 2, CP]   (one f32 plane per field: x, y, vx, ...)

with one ghost row/column of sentinel cells on every side and the slot dimension padded
to the 128-lane tile (CP).  Each grid program owns one (grid row, column segment); its
3-row neighborhood arrives through the standard Pallas pipeline — every plane is passed
three times with row-shifted ``index_map``s, which keeps all blocks non-overlapping per
input and lets Pallas double-buffer the HBM traffic.  Column neighborhoods are dynamic
sublane slices of the in-VMEM row slabs; the pairwise interaction evaluates per
(cell-tile, neighbor-offset) as a ``[TC, CP, CP]`` VPU tile accumulated over the 3x3
offsets.

Round-2 kernel economics (each verified against the round-1 formulation):

* **relu masking, zero selects**: kernels are products of ``v = max(h−d, 0)`` /
  ``u = max(h²−d², 0)``, so out-of-radius and sentinel pairs contribute exactly 0
  without any compare+select per quantity;
* **no idx planes / no per-pair self test**: the self-pair's force contribution is a
  closed form of per-slot values (d=0 ⇒ v=h), subtracted once per slot after the
  walk; the viscosity self term cancels algebraically in ``Σ vⱼ·u³ − vᵢ·Σ u³``;
* **no divides**: the ε-guarded direction (compute_shader.wgsl:304-311) folds into
  one masked ``rsqrt``; per-slot pressure terms arrive precomputed (they depend on
  one particle only);
* kernel norms are scalar factors folded outside the pair loop.

Conventions that eliminate all masking:
* empty slots and ghost cells carry position sentinels ``x = y = 1e6`` — every pair
  involving them lands far outside the smoothing radius, so all weights are exactly 0;
* per-slot term planes of empty slots may hold (finite) garbage — they are always
  multiplied by a zero weight, and outputs at empty slots are never read back.

Parity oracle: ``ops/grid_step.py`` (same bulk-synchronous spec); on non-TPU backends
the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_DIST = 1e-4  # direction guard (compute_shader.wgsl:305)
_SENTINEL = 1.0e6  # far-away parking spot for empty slots / ghost cells


TC_OVERRIDE = 0  # nonzero: force cells-per-tile (perf experiments; protos/time_forces.py)


def _tile_cells(cp: int) -> int:
    """Cells per inner tile: keeps the [TC, CP, CP] pairwise tile at ~512 KB."""
    if TC_OVERRIDE:
        return TC_OVERRIDE
    return max(8, 1024 // cp)


def _lane_pad(c: int) -> int:
    """Slot dim padded to the 128-lane tile."""
    return max(128, ((c + 127) // 128) * 128)


def _offsets():
    """The 3x3 neighborhood, matching GRID_OFFSETS (compute_shader.wgsl:201-205)."""
    return [(dy, dx) for dy in range(3) for dx in range(3)]


def _seg_width(wt: int, tc: int, limit: int = 128) -> int:
    """Largest divisor of wt that is a multiple of tc and <= limit.

    Bounds kernel VMEM at any grid width: each program sees one (row, segment) slab of
    seg+2 cells instead of the whole wt+2-cell row (a 16M-particle grid is ~430 cells
    wide — whole-row slabs blew the 16 MB VMEM budget)."""
    best = tc
    for seg in range(tc, limit + 1, tc):
        if wt % seg == 0:
            best = seg
    return best


CHUNK_OVERRIDE = 0  # nonzero: force the own-slot gating chunk width (experiments)

# Non-uniform own-slot gating chunks: per-SUB-CELL slot split points (fractions
# of the sub-cell slot count), replicated across the sub-cells of the lane row.
# Rationale (measured, protos/time_forces3.py at 1M): cells are front-loaded —
# live-slot probability by slot index is ~[1.0 .. 0.85 @ c/2, 0.07 @ 3c/4,
# 0.0 @ 7c/8] fresh-binned and stays tail-dead after stepping — so fine chunks
# only pay off in the tail half, while uniform fine chunks (8 lanes) lose to
# per-branch overhead.  None = uniform chunks of _own_chunk() lanes.
# Default: head chunk [0, 5c/8) runs unsplit (nearly always live), tail
# eighths gate individually.  Measured on-chip at 1M/pack2/C=64 (fresh /
# 40-frame-stepped): 25.93/25.65 ms (uniform 32) -> 22.55/22.78 with this
# pattern; uniform 16 got 23.16/23.82, uniform 8 lost to branch overhead
# (26.2).  Settled/air tiles skip all chunks either way.
#
# PAIR-PACKED LAYOUT ONLY (n_dx == 2): on the classic C=128 settle-safe layout
# the same splits REGRESSED the settled equilibrium 30.5 -> 37.1 ms (round-4
# bench): pool cells run ~101/128 occupancy, so the dead [7/8, 1) tail chunk
# breaks the all-live single-branch fast path and the surviving 80/16-wide
# lane slices are tile-misaligned.  Classic keeps uniform _own_chunk() chunks.
CHUNK_SPLITS: tuple | None = (0.0, 0.625, 0.75, 0.875, 1.0)
# Experiments only: apply CHUNK_SPLITS to the classic (n_dx=3) layout too
# (protos/time_forces6.py probes 32-aligned classic patterns).
CHUNK_SPLITS_CLASSIC = False

# Defer the cross-lane accumulator reductions to once per walk.  The pair bodies
# historically reduced every accumulator over the 128 neighbor lanes at EVERY
# 3x3 offset (jnp.sum(axis=-1) per quantity per offset = 30 lane-reductions per
# force walk, each a log2(128) shuffle-add chain on the VPU).  With this flag the
# accumulators stay full [TC, chunk, CP] tiles — offsets fold in with plain adds —
# and one reduction per quantity runs after the offset loop.  Costs ~5 extra
# live tiles of VMEM.  Measured on-chip (protos/time_forces.py, R=32 varied-seed
# protocol, 1M/pack2/C=64): two-walk time 23.12 -> 19.77 ms (-14.5%); results
# match the undeferred walks to float-reorder level (1.3e-5 at small shapes).
DEFER_REDUCE = True


def _own_chunk(cp: int) -> int:
    """Own-slot occupancy-gating chunk width (see the gating note in
    ``_make_seg_kernel``)."""
    return CHUNK_OVERRIDE if CHUNK_OVERRIDE else 32


def _make_seg_kernel(pair_update, n_channels: int, n_own: int, n_acc: int,
                     n_out: int, tc: int, seg: int, finalize=None, n_dx: int = 3,
                     finalize_on_empty: bool = False, sub_cap: int | None = None):
    """Build a kernel: one (grid row, column segment) per program.

    Inputs arrive as ``n_channels * 3`` halo slabs ``[1, 1, seg+2, CP]`` (each
    channel's rows r-1, r, r+1 of the program's segment, halo columns included),
    followed by ``n_own`` own-only slabs ``[1, 1, seg, CP]`` (row r, no halo —
    channels consumed only on the own side of a pair).

    ``n_dx`` is the column-offset count: 3 for the classic one-cell-per-lane-row
    layout (own from the halo channels' center slab), 2 for the PAIR-PACKED layout,
    where each lane row holds two adjacent cells' slots, the halo channels carry the
    half-shifted neighbor ("B") planes, and own values come exclusively from the
    own-only slabs (see ``_pack_pairs``/``force_planes``).

    ``pair_update(scal, own, nbrs, accs) -> accs`` folds one (tile, offset) pairwise
    block into the accumulators:

    * ``own``:  per-channel own-cell values (halo channels then own-only), [TC, CH]
      (an own-slot lane chunk — see :func:`_own_chunk`; pair bodies only ever
      broadcast own values to the sublane dim, so the chunk width is transparent)
    * ``nbrs``: per-halo-channel neighbor values for this offset, each [TC, CP]

    ``finalize(scal, own, accs) -> outs`` maps accumulators to the ``n_out`` outputs
    (identity when None).
    """

    def kernel(scal_ref, *refs):
        ins = refs[: n_channels * 3]
        own_ins = refs[n_channels * 3 : n_channels * 3 + n_own]
        outs = refs[n_channels * 3 + n_own :]

        def tile_body(t, _):
            c0 = t * tc
            own_full = (
                tuple(
                    ins[ch * 3 + 1][0, 0, pl.ds(c0 + 1, tc), :]
                    for ch in range(n_channels)
                )
                if n_dx == 3
                else ()
            ) + tuple(own_ins[k][0, 0, pl.ds(c0, tc), :] for k in range(n_own))
            cp_own = own_full[0].shape[-1]
            ch_w = _own_chunk(cp_own)
            if CHUNK_SPLITS is not None and (n_dx == 2 or CHUNK_SPLITS_CLASSIC):
                # Non-uniform chunks, replicated per sub-cell (see CHUNK_SPLITS).
                # Sub-cell boundaries come from the TRUE capacity (``sub_cap``):
                # the pack2 layout places cell B at lane C with pad lanes
                # [2C, 128) when capacity < 64 (see unpack_pairs), so splitting
                # at cp_own // 2 would misalign the tuned head/tail pattern
                # with the real cell boundaries there.  Pad lanes gate as one
                # always-dead tail chunk (zero cost).
                nsubc = 2 if n_dx == 2 else 1
                sub_w = cp_own // nsubc
                if sub_cap is not None:
                    sub_w = min(sub_cap, sub_w)
                pts = sorted({min(sub_w, max(0, int(round(f * sub_w))))
                              for f in CHUNK_SPLITS} | {0, sub_w})
                chunks = [slice(s * sub_w + a, s * sub_w + b)
                          for s in range(nsubc)
                          for a, b in zip(pts[:-1], pts[1:])]
                n_real = len(chunks)
                if nsubc * sub_w < cp_own:
                    chunks.append(slice(nsubc * sub_w, cp_own))
            elif ch_w >= cp_own or cp_own % ch_w:
                chunks = [slice(0, cp_own)]
                n_real = 1
            else:
                chunks = [slice(k * ch_w, (k + 1) * ch_w)
                          for k in range(cp_own // ch_w)]
                n_real = len(chunks)
            # Own x-position channel (occupancy source): halo center slab channel 0
            # (classic) or own-only channel 0 (pair-packed) — both are own_full[0].
            # Occupancy gating (measured at 1M, protos/time_forces.py + bench):
            # a lane-chunk of own slots that is ALL empty skips its 9-offset
            # pairwise work (pl.when on in-kernel reductions — no host plumbing).
            # Air tiles in settled states drop the two walks 28.0 -> 14.3 ms; the
            # C=128 settle-safe default at partial occupancy (most of a real run)
            # drops ~2x because cells are front-compacted and their upper chunks
            # are holes.  Fully-live tiles take ONE branch into the original
            # unpredicated body, so dense uniform states pay only the
            # reductions (~1%), not the 3-5% chunk-predication tax.
            own_live = jnp.where(own_full[0] < 0.5 * _SENTINEL, 1.0, 0.0)

            def chunk_work(sl, with_pairs=True):
                own = tuple(o[:, sl] for o in own_full)
                acc_shape = (
                    (tc, own[0].shape[-1], ins[0].shape[-1])
                    if DEFER_REDUCE and n_channels
                    else (tc, own[0].shape[-1])
                )
                accs = tuple(
                    jnp.zeros(acc_shape, jnp.float32) for _ in range(n_acc)
                )
                # n_dx=3: dx in {0,1,2} = cells c-1,c,c+1.  n_dx=2 (pair-packed):
                # the halo planes are B-units (cells 2p-1,2p at padded index p+1),
                # so own pair p reads B[p], B[p+1] at window offsets {1, 2}.
                if with_pairs:
                    for dy in range(3):
                        for dx in range(3 - n_dx, 3):
                            nbrs = tuple(
                                ins[ch * 3 + dy][0, 0, pl.ds(c0 + dx, tc), :]
                                for ch in range(n_channels)
                            )
                            accs = pair_update(scal_ref, own, nbrs, accs)
                if len(accs) and accs[0].ndim == 3:
                    accs = tuple(jnp.sum(a, axis=-1) for a in accs)
                res = finalize(scal_ref, own, accs) if finalize else accs
                for o, r in zip(outs, res):
                    o[0, 0, pl.ds(c0, tc), sl] = r

            conds = [jnp.max(own_live[:, sl]) > 0.5 for sl in chunks]
            # all_live ANDs only the REAL-cell chunks: a capacity<64 pack2
            # layout carries an always-dead pad tail chunk that must not
            # disable the all-live single-branch fast path.
            if n_real == 1:
                all_live = conds[0]
            else:
                all_live = functools.reduce(jnp.logical_and, conds[:n_real])

            @pl.when(all_live)
            def _():
                chunk_work(slice(0, cp_own))

            @pl.when(jnp.logical_not(all_live))
            def _():
                for sl, cond in zip(chunks, conds):
                    @pl.when(cond)
                    def _(sl=sl):
                        chunk_work(sl)

                    @pl.when(jnp.logical_not(cond))
                    def _(sl=sl):
                        if finalize_on_empty:
                            # Integrated-epilogue walks: a gated chunk can hold
                            # DEFERRED slots (walk positions sentinel-parked,
                            # true positions live) — the epilogue must still
                            # run for them (zero accs; pair loop skipped).
                            chunk_work(sl, with_pairs=False)
                        else:
                            zero = jnp.zeros(
                                (tc, sl.stop - sl.start), jnp.float32)
                            for o in outs:
                                o[0, 0, pl.ds(c0, tc), sl] = zero
            return 0

        # fori_loop beats static unrolling here (measured: unroll was ~8% slower
        # end-to-end and compiled far slower)
        jax.lax.fori_loop(0, seg // tc, tile_body, 0)

    return kernel


# --------------------------------------------------------------------------------------
# Pass bodies (the physics, one 3x3 offset at a time).
# --------------------------------------------------------------------------------------

def _density_update(scal, own, nbrs, accs):
    """compute_shader.wgsl:207-254 — self included; norms folded outside.

    Accumulates (Σ v², Σ v³) with v = max(h − d, 0); the caller scales by the
    density / near-density kernel norms."""
    h = scal[0]
    (ox, oy), (nx, ny) = own, nbrs
    dx = nx[:, None, :] - ox[:, :, None]
    dy = ny[:, None, :] - oy[:, :, None]
    d = jnp.sqrt(dx * dx + dy * dy)
    v = jnp.maximum(h - d, 0.0)
    vv = v * v
    s2, s3 = accs
    if s2.ndim == 3:  # DEFER_REDUCE: fold elementwise, reduce once per walk
        return s2 + vv, s3 + vv * v
    return s2 + jnp.sum(vv, axis=-1), s3 + jnp.sum(vv * v, axis=-1)


def _force_update(scal, own, nbrs, accs):
    """Fused pressure (compute_shader.wgsl:256-334) + viscosity (:336-384).

    Halo channels: (px, py, P1, NPn, vx, vy); own-only channel: NPo.  The per-slot
    terms arrive PRE-SCALED by the derivative kernel norms (they depend on one
    particle only, so the scalar multiplies hoist out of the pair loop):
    P1 = α·p/ρ², NPo = β·np/ρ², NPn = β·np/(ρ·ρnear) with α = −2·density_norm,
    β = −3·near_density_norm and the reference's ρ_j·ρnear_j quirk (:326-327) —
    see :func:`pressure_terms`.

    Scalars: (h, ε²).  Per pair: mag = (P1ᵢ+P1ⱼ)·v + (NPoᵢ+NPnⱼ)·v²;
    force += (Δ/d)·mag with the ε-direction (0,1) fallback realized as inv_d = 0 +
    a near-pair fy term.  Viscosity accumulates (Σ u³, Σ vxⱼ·u³, Σ vyⱼ·u³),
    u = max(h²−d², 0); the self pair cancels in the finalize combination, and the
    self pressure term (a closed form at d = 0) is subtracted there too.
    """
    h, eps2 = scal[0], scal[1]
    ox, oy, oP1, _ovx, _ovy, oNPo = own[0], own[1], own[2], own[4], own[5], own[6]
    nx, ny, nP1, nNPn, nvx, nvy = nbrs

    dx = nx[:, None, :] - ox[:, :, None]
    dy = ny[:, None, :] - oy[:, :, None]
    d2 = dx * dx + dy * dy
    near0 = d2 <= eps2
    inv_d = jnp.where(near0, 0.0, jax.lax.rsqrt(d2))
    d = d2 * inv_d  # exact d off the ε-ball; 0 inside it (reference: d ≈ 0 there)
    v = jnp.maximum(h - d, 0.0)
    vv = v * v

    pt = oP1[:, :, None] + nP1[:, None, :]
    nt = oNPo[:, :, None] + nNPn[:, None, :]
    mag = pt * v + nt * vv
    m = mag * inv_d

    u = jnp.maximum(h * h - d2, 0.0)
    u3 = u * u * u

    fx, fy, S, Sx, Sy = accs
    if fx.ndim == 3:  # DEFER_REDUCE: fold elementwise, reduce once per walk
        fx = fx + dx * m
        fy = fy + dy * m + jnp.where(near0, mag, 0.0)
        S = S + u3
        Sx = Sx + nvx[:, None, :] * u3
        Sy = Sy + nvy[:, None, :] * u3
        return fx, fy, S, Sx, Sy
    fx = fx + jnp.sum(dx * m, axis=-1)
    fy = fy + jnp.sum(dy * m + jnp.where(near0, mag, 0.0), axis=-1)
    S = S + jnp.sum(u3, axis=-1)
    Sx = Sx + jnp.sum(nvx[:, None, :] * u3, axis=-1)
    Sy = Sy + jnp.sum(nvy[:, None, :] * u3, axis=-1)
    return fx, fy, S, Sx, Sy


def _force_finalize(scal, own, accs):
    """Subtract the self pressure term; combine the viscosity sums.

    Self pair: d = 0 ⇒ near-pair fy fallback added mag_self = 2·P1ᵢ·h +
    (NPoᵢ+NPnᵢ)·h² (terms pre-scaled; the reference excludes self by index,
    :294-295).  Viscosity: fv = Σⱼ vⱼ·u³ − vᵢ·Σⱼ u³ — the self term cancels
    exactly (u³ₛₑₗf·vᵢ both sides).  The viscosity kernel norm is NOT applied
    here; the caller folds it into the velocity update scale.
    """
    h = scal[0]
    oP1, oNPn, ovx, ovy, oNPo = own[2], own[3], own[4], own[5], own[6]
    fx, fy, S, Sx, Sy = accs
    mag_self = (oP1 + oP1) * h + (oNPo + oNPn) * (h * h)
    return fx, fy - mag_self, Sx - ovx * S, Sy - ovy * S


def _force_finalize_integrated(scal, own, accs):
    """:func:`_force_finalize` + the whole frame tail fused into the walk's
    epilogue: velocity combine, deferred-slot restore, Euler integrate from the
    predicted position, boundary bounce (core/kernels.py::bounce_bounds,
    compute_shader.wgsl:69-99), dead-slot park.  Outputs the FINAL
    (px, py, vx, vy) planes instead of raw force sums — the XLA tail that
    previously materialized ~10 plane-sized arrays disappears.

    Extra own-only channels (after NPo): ``npx, npy`` — the TRUE predicted
    positions.  ``own[0/1]`` are the walk's pair positions, sentinel-parked at
    deferred slots; a slot is deferred iff own[0] is sentinel while npx is live.
    Extra scalars: (dt, vscale, x_min, x_max, y_min, y_max, damping)."""
    fx, fy, fvx, fvy = _force_finalize(scal, own, accs)
    dt, vscale = scal[2], scal[3]
    x_min, x_max, y_min, y_max = scal[4], scal[5], scal[6], scal[7]
    damp = scal[8]
    ovx, ovy = own[4], own[5]
    onpx, onpy = own[7], own[8]
    nvx = ovx + fx * dt + fvx * vscale
    nvy = ovy + fy * dt + fvy * vscale
    defer = (own[0] >= 0.5 * _SENTINEL) & (onpx < 0.5 * _SENTINEL)
    nvx = jnp.where(defer, ovx, nvx)
    nvy = jnp.where(defer, ovy, nvy)
    px2 = onpx + (nvx - ovx) * dt
    py2 = onpy + (nvy - ovy) * dt
    nvx = jnp.where(px2 <= x_min, jnp.abs(nvx) * damp, nvx)
    nvx = jnp.where(px2 >= x_max, -jnp.abs(nvx) * damp, nvx)
    px2 = jnp.clip(px2, x_min, x_max)
    nvy = jnp.where(py2 <= y_min, jnp.abs(nvy) * damp, nvy)
    nvy = jnp.where(py2 >= y_max, -jnp.abs(nvy) * damp, nvy)
    py2 = jnp.clip(py2, y_min, y_max)
    live2 = onpx < 0.5 * _SENTINEL
    return (
        jnp.where(live2, px2, _SENTINEL),
        jnp.where(live2, py2, _SENTINEL),
        jnp.where(live2, nvx, 0.0),
        jnp.where(live2, nvy, 0.0),
    )


def pressure_terms(rho, rhon, params):
    """Per-slot pressure terms, pre-scaled by the pair-loop scalars:
    (α·p/ρ², β·np/ρ², β·np/(ρ·ρnear)), guarded for empties.

    α = −2·density_kernel_norm, β = −3·near_density_kernel_norm — the derivative
    norms of the spiky kernels (compute_shader.wgsl:165-199); folding them here
    removes two scalar multiplies per pair from the force walk."""
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    rhon_safe = jnp.where(rhon > 0, rhon, 1.0)
    alpha = -2.0 * params.density_kernel_norm
    beta = -3.0 * params.near_density_kernel_norm
    inv_rho2 = 1.0 / (rho_safe * rho_safe)
    p = (rho - params.target_density) * params.pressure_multiplier
    np_ = rhon * params.near_density_multiplier
    return (
        alpha * (p * inv_rho2),
        beta * (np_ * inv_rho2),
        beta * (np_ / (rho_safe * rhon_safe)),
    )


def density_scalars(params):
    return jnp.stack([params.smoothing_radius]).astype(jnp.float32)


def force_scalars(params):
    """(h, ε²) — the kernel norms ride the pre-scaled per-slot terms instead."""
    return jnp.stack(
        [
            params.smoothing_radius,
            jnp.float32(_EPS_DIST) ** 2,
        ]
    ).astype(jnp.float32)


def force_scalars_integrated(params):
    """force_scalars + (dt, vscale, bounds, damping) for the fused epilogue."""
    dt = params.dt
    return jnp.concatenate(
        [
            force_scalars(params),
            jnp.stack([dt, params.viscosity_kernel_norm
                       * params.viscosity_strength * dt]).astype(jnp.float32),
            jnp.asarray(params.bounds, jnp.float32).reshape(4),
            jnp.stack([params.damping_factor]).astype(jnp.float32),
        ]
    )


# --------------------------------------------------------------------------------------
# Host-side wrappers.
# --------------------------------------------------------------------------------------

def _setup(spec, interpret):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    gh, gw = spec.gh, spec.gw
    cp = _lane_pad(spec.capacity)
    tc = _tile_cells(cp)
    wt = ((gw + tc - 1) // tc) * tc
    return interpret, gh, gw, cp, tc, wt


def _pad_plane(x, gh, gw, wt, fill, cp):
    """[gh, gw, C] -> [gh+2, wt+2, CP] with ghost border + tile/lane padding."""
    out = jnp.full((gh + 2, wt + 2, cp), fill, jnp.float32)
    return out.at[1 : gh + 1, 1 : gw + 1, : x.shape[-1]].set(x.astype(jnp.float32))


def _grow_plane(x, fill):
    """[gh, wt, CP] (kernel-output layout) -> [gh+2, wt+2, CP] with ghost border."""
    gh, wt, cp = x.shape
    out = jnp.full((gh + 2, wt + 2, cp), fill, jnp.float32)
    return out.at[1 : gh + 1, 1 : wt + 1, :].set(x)


def _own_plane(x, gh, gw, wt, fill, cp):
    """[gh, gw, C] -> [gh, wt, CP] own-only layout (tile/lane padding, no ghosts)."""
    out = jnp.full((gh, wt, cp), fill, jnp.float32)
    return out.at[:, :gw, : x.shape[-1]].set(x.astype(jnp.float32))


# --------------------------------------------------------------------------------------
# Pair-packed ("2 cells per lane row") layout.
#
# With aspect-1 cells (cell width == smoothing radius h) and capacity <= 64, two
# adjacent cells' slots share one 128-lane row: A-unit p = cells (2p, 2p+1).  The
# neighbor set of the own pair {2p, 2p+1} is cells 2p-2..2p+3 minus the corners —
# but the half-shifted B-units (B[q] = cells (2q-1, 2q)) cover it EXACTLY with two
# blocks: B[p] ∪ B[p+1] = cells 2p-1..2p+2 ⊇ every in-radius cell, and the two
# extra cells (2p-1 for own 2p+1, 2p+2 for own 2p) are >= h away so all weights
# vanish by the radius masking — no extra masking needed.  Per own slot this is
# 3 x 2 x 128 = 768 candidates instead of the classic 9 x 128 = 1152 (1.5x fewer),
# at identical plane shapes/memory.
# --------------------------------------------------------------------------------------

def _pack_a(x, fill):
    """[gh, gw, C] -> A-units [gh, ceil(gw/2), 2C]; odd gw padded with a fill cell."""
    gh, gw, C = x.shape
    if gw % 2:
        x = jnp.concatenate([x, jnp.full((gh, 1, C), fill, x.dtype)], axis=1)
        gw += 1
    return x.reshape(gh, gw // 2, 2 * C)


def _pack_b(x, fill):
    """[gh, gw, C] -> B-units [gh, ceil(gw/2) + 1, 2C]: B[q] = cells (2q-1, 2q).

    B[0] starts with an out-of-grid fill cell; B[np2] ends with one (or covers the
    odd-gw pad cell).  Built from the lane-flattened A stream shifted by one cell."""
    gh, gw, C = x.shape
    if gw % 2:
        x = jnp.concatenate([x, jnp.full((gh, 1, C), fill, x.dtype)], axis=1)
        gw += 1
    flat = x.reshape(gh, gw * C)
    fill_cell = jnp.full((gh, C), fill, x.dtype)
    shifted = jnp.concatenate([fill_cell, flat, fill_cell], axis=1)
    return shifted.reshape(gh, gw // 2 + 1, 2 * C)


def unpack_pairs(x, gw, C):
    """[gh, wt2, CP] packed kernel output -> [gh, gw, C].

    Only the first 2C lanes of each A-unit are real cells; when capacity < 64 the
    lane tile pads CP to 128 and those pad lanes must be dropped BEFORE the
    cell-split reshape (treating them as phantom cells interleaves garbage into
    the cell stream — the round-2 pack2/cap<64 order-dependence bug)."""
    gh = x.shape[0]
    u = x[:, :, : 2 * C].reshape(gh, -1, C)  # [gh, 2*wt2, C]
    return u[:, :gw, :]


def _plane_call(update, planes, own_planes, n_acc, n_out, gh, wt, cp, tc,
                interpret, finalize=None, n_dx=3, finalize_on_empty=False,
                sub_cap=None):
    """Shared pallas_call over width-segmented planes.

    Each padded halo plane [gh+2, wt+2, CP] is re-laid out as
    [gh+2, nseg, seg+2, CP] (halo columns duplicated between segments), then enters
    the kernel 3x with row-shifted index maps; own-only planes [gh, wt, CP] enter
    once as [gh, nseg, seg, CP].  Every block is non-overlapping within its input,
    VMEM stays bounded at any width, and Pallas double-buffers the slab fetches.
    """
    seg = _seg_width(wt, tc)
    nseg = wt // seg
    kernel = _make_seg_kernel(update, len(planes), len(own_planes), n_acc, n_out,
                              tc, seg, finalize, n_dx=n_dx,
                              finalize_on_empty=finalize_on_empty,
                              sub_cap=sub_cap)

    def segmented(p):
        return jnp.stack(
            [p[:, s * seg : s * seg + seg + 2] for s in range(nseg)], axis=1
        )

    slab = lambda dy: pl.BlockSpec(
        (1, 1, seg + 2, cp), lambda r, s, dy=dy: (r + dy, s, 0, 0)
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [None]
    for p in planes:
        sp = segmented(p)
        for dy in range(3):
            in_specs.append(slab(dy))
            args.append(sp)
    own_spec = pl.BlockSpec((1, 1, seg, cp), lambda r, s: (r, s, 0, 0))
    for p in own_planes:
        in_specs.append(own_spec)
        args.append(p.reshape(gh, nseg, seg, cp))
    out_spec = pl.BlockSpec((1, 1, seg, cp), lambda r, s: (r, s, 0, 0))
    call = pl.pallas_call(
        kernel,
        grid=(gh, nseg),
        in_specs=in_specs,
        out_specs=tuple([out_spec] * n_out),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((gh, nseg, seg, cp), jnp.float32)] * n_out
        ),
        # rows/segments are independent: lets Mosaic pipeline slab fetches freely.
        # The fused force body keeps ~20 live [TC, CP, CP] temporaries; the default
        # 16 MB scoped-vmem budget is too tight for it (v5e VMEM is 128 MB).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(*a):
        outs = call(*a)
        return tuple(o.reshape(gh, wt, cp) for o in outs)

    return run, args


# --------------------------------------------------------------------------------------
# Padded-plane entry points.  The caller owns ALL padding: ghost rows (halo or
# sentinel), ghost columns, tile and lane padding.  Plane geometry must come from
# :func:`plane_geometry`.  Used by the single-chip step AND the multi-chip sharded
# step (whose ghost rows come from ppermute halo exchange rather than padding).
# --------------------------------------------------------------------------------------

def plane_geometry(gw: int, capacity: int):
    """(cp, tc, wt): lane-padded slot dim, cells per tile, tile-padded width."""
    cp = _lane_pad(capacity)
    tc = _tile_cells(cp)
    wt = ((gw + tc - 1) // tc) * tc
    return cp, tc, wt


def density_planes(ppx, ppy, params, interpret: bool, own_planes=(), n_dx=3,
                   sub_cap=None):
    """Density pass over pre-padded position planes [rows+2, wt+2, CP].

    Classic layout (n_dx=3): own positions come from the halo planes' center slabs;
    ``own_planes`` empty.  Pair-packed layout (n_dx=2): ppx/ppy are the B-unit
    planes and ``own_planes = [apx, apy]`` carries the A-unit own positions
    ([rows, wt, CP], no ghosts).  Returns (rho, rhon) [rows, wt, CP] — true
    densities (norms applied)."""
    rows = ppx.shape[0] - 2
    wt, cp = ppx.shape[1] - 2, ppx.shape[2]
    tc = _tile_cells(cp)
    call, args = _plane_call(_density_update, [ppx, ppy], list(own_planes), 2, 2,
                             rows, wt, cp, tc, interpret, n_dx=n_dx,
                             sub_cap=sub_cap)
    args[0] = density_scalars(params)
    s2, s3 = call(*args)
    return params.density_kernel_norm * s2, params.near_density_kernel_norm * s3


def force_planes(ppx, ppy, pP1, pNPn, pvx, pvy, own_planes, params,
                 interpret: bool, n_dx=3, sub_cap=None):
    """Fused pressure+viscosity pass over pre-padded planes.

    Halo planes [rows+2, wt+2, CP] carry the NEIGHBOR-side channels (positions, P1,
    NPn, velocities) — classic cell units (n_dx=3) or B-units (n_dx=2).  Own-only
    planes ([rows, wt, CP], no ghosts): classic ``[NPo]`` (own px/py/P1/NPn/vx/vy
    come from the halo centers); packed ``[apx, apy, aP1, aNPn, avx, avy, aNPo]``.
    Returns (fx, fy, fvx, fvy) [rows, wt, CP]; fvx/fvy are the raw Σ(vⱼ−vᵢ)·u³
    sums — scale by ``viscosity_kernel_norm * viscosity_strength``.
    """
    rows = ppx.shape[0] - 2
    wt, cp = ppx.shape[1] - 2, ppx.shape[2]
    tc = _tile_cells(cp)
    call, args = _plane_call(_force_update, [ppx, ppy, pP1, pNPn, pvx, pvy],
                             list(own_planes), 5, 4, rows, wt, cp, tc, interpret,
                             finalize=_force_finalize, n_dx=n_dx,
                             sub_cap=sub_cap)
    args[0] = force_scalars(params)
    return call(*args)


def force_planes_integrated(ppx, ppy, pP1, pNPn, pvx, pvy, own_planes, params,
                            interpret: bool, n_dx=3, sub_cap=None):
    """:func:`force_planes` with the frame tail fused into the epilogue.

    ``own_planes`` must END with ``(npx, npy)`` — the true predicted positions —
    after the layout's usual own channels (see
    :func:`_force_finalize_integrated`).  Returns the FINAL
    (px, py, vx, vy) planes [rows, wt, CP]; dead slots sentinel/zero-parked,
    deferred slots restored to their post-gravity velocity at their predicted
    position (bounced)."""
    rows = ppx.shape[0] - 2
    wt, cp = ppx.shape[1] - 2, ppx.shape[2]
    tc = _tile_cells(cp)
    call, args = _plane_call(_force_update, [ppx, ppy, pP1, pNPn, pvx, pvy],
                             list(own_planes), 5, 4, rows, wt, cp, tc, interpret,
                             finalize=_force_finalize_integrated, n_dx=n_dx,
                             finalize_on_empty=True, sub_cap=sub_cap)
    args[0] = force_scalars_integrated(params)
    return call(*args)


# --------------------------------------------------------------------------------------
# [gh, gw, C]-plane convenience wrappers (single-chip path, tests).
# --------------------------------------------------------------------------------------

def density_cells_pallas(px, py, *, spec, params, interpret=None):
    """[gh, gw, C] position planes -> (rho, rhon) [gh, gw, C]."""
    interpret, gh, gw, cp, tc, wt = _setup(spec, interpret)
    ppx = _pad_plane(px, gh, gw, wt, _SENTINEL, cp)
    ppy = _pad_plane(py, gh, gw, wt, _SENTINEL, cp)
    rho, rhon = density_planes(ppx, ppy, params, interpret)
    C = spec.capacity
    return rho[:, :gw, :C], rhon[:, :gw, :C]


def force_cells_pallas(px, py, vx, vy, rho, rhon, *, spec, params, interpret=None):
    """Fused pressure+viscosity forces from [gh, gw, C] planes.

    Returns (fx, fy, fvx, fvy) [gh, gw, C]; see :func:`force_planes` for scaling."""
    interpret, gh, gw, cp, tc, wt = _setup(spec, interpret)
    P1, NPo, NPn = pressure_terms(rho, rhon, params)
    outs = force_planes(
        _pad_plane(px, gh, gw, wt, _SENTINEL, cp),
        _pad_plane(py, gh, gw, wt, _SENTINEL, cp),
        _pad_plane(P1, gh, gw, wt, 0.0, cp),
        _pad_plane(NPn, gh, gw, wt, 0.0, cp),
        _pad_plane(vx, gh, gw, wt, 0.0, cp),
        _pad_plane(vy, gh, gw, wt, 0.0, cp),
        [_own_plane(NPo, gh, gw, wt, 0.0, cp)],
        params,
        interpret,
    )
    C = spec.capacity
    return tuple(o[:, :gw, :C] for o in outs)
