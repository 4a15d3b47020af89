"""Fused SPH force kernels — Pallas TPU (the production step for configs 1 & 4).

The reference walks each particle's 9-cell sorted runs three times per frame in WGSL
(`assets/compute_shader.wgsl:207-254, 256-334, 336-384`).  Here the same three passes run
as Pallas kernels over a **cell-dense plane layout**:

    plane[gh + 2, W + 2, CP]   (one f32/i32 plane per field: x, y, idx, rho, vx, ...)

with one ghost row/column of sentinel cells on every side and the slot dimension padded
to the 128-lane tile (CP).  Each grid program owns one grid row; its 3-row neighborhood
arrives through the **standard Pallas pipeline** — every plane is passed three times
with row-shifted ``index_map``s (r, r+1, r+2 into the padded plane), which keeps all
blocks non-overlapping per input and lets Pallas double-buffer the HBM traffic.  (A
manual-DMA window variant hit Mosaic faults on this toolchain; shifted index_maps are
the portable formulation.)  Column neighborhoods are dynamic sublane slices of the
in-VMEM row slabs; the pairwise interaction evaluates per (cell-tile, neighbor-offset)
as a ``[TC, CP, CP]`` VPU tile accumulated over the 3x3 offsets.

Conventions that eliminate all masking:
* empty slots and ghost cells carry position sentinels ``x = y = 1e6`` — every pair
  involving them lands far outside the smoothing radius, so kernels give exactly 0;
* the idx plane holds the particle's sorted index (unique, int32 stored as f32 —
  exact below 2^24), -1 for empties — self-pairs are excluded by index equality, as
  the reference does (compute_shader.wgsl:294-295);
* density divisions are guarded with ``where(rho > 0, ...)`` so empty neighbors can't
  produce inf·0 NaNs.

Parity oracle: ``ops/grid_step.py`` (same bulk-synchronous spec); on non-TPU backends
the kernels run in interpreter mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_DIST = 1e-4  # direction guard (compute_shader.wgsl:305)
_SENTINEL = 1.0e6  # far-away parking spot for empty slots / ghost cells


def _tile_cells(cp: int) -> int:
    """Cells per inner tile: keeps the [TC, CP, CP] pairwise tile at ~512 KB."""
    return max(8, 1024 // cp)


def _lane_pad(c: int) -> int:
    """Slot dim padded to the 128-lane tile."""
    return max(128, ((c + 127) // 128) * 128)


def _offsets():
    """The 3x3 neighborhood, matching GRID_OFFSETS (compute_shader.wgsl:201-205)."""
    return [(dy, dx) for dy in range(3) for dx in range(3)]


def _pair_geom(ox, oy, nx, ny):
    """[TC, CP, CP] pairwise deltas/distances: own slots x neighbor cell slots."""
    dx = nx[:, None, :] - ox[:, :, None]
    dy = ny[:, None, :] - oy[:, :, None]
    d2 = dx * dx + dy * dy
    dist = jnp.sqrt(d2)
    return dx, dy, dist


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


def _make_seg_kernel(pair_update, n_channels: int, n_out: int, tc: int, seg: int):
    """Build a kernel: one (grid row, column segment) per program.

    Inputs arrive as ``n_channels * 3`` slabs ``[1, 1, seg+2, CP]`` (each channel's
    rows r-1, r, r+1 of the program's segment, halo columns included).
    ``pair_update(own, nbrs, accs) -> accs`` folds one (tile, offset) pairwise block
    into the accumulators:

    * ``own``:  per-channel own-cell values, each [TC, CP]
    * ``nbrs``: per-channel neighbor values for this offset, each [TC, CP]
    """

    def kernel(scal_ref, *refs):
        ins = refs[: n_channels * 3]
        outs = refs[n_channels * 3 : n_channels * 3 + n_out]

        def tile_body(t, _):
            c0 = t * tc
            own = tuple(
                ins[ch * 3 + 1][0, 0, pl.ds(c0 + 1, tc), :]
                for ch in range(n_channels)
            )
            accs = tuple(
                jnp.zeros((tc, own[0].shape[-1]), jnp.float32) for _ in range(n_out)
            )
            for dy, dx in _offsets():
                nbrs = tuple(
                    ins[ch * 3 + dy][0, 0, pl.ds(c0 + dx, tc), :]
                    for ch in range(n_channels)
                )
                accs = pair_update(scal_ref, own, nbrs, accs)
            for o, acc in zip(outs, accs):
                o[0, 0, pl.ds(c0, tc), :] = acc
            return 0

        # fori_loop beats static unrolling here (measured: unroll was ~8% slower
        # end-to-end and compiled far slower)
        jax.lax.fori_loop(0, seg // tc, tile_body, 0)

    return kernel


# --------------------------------------------------------------------------------------
# Pass bodies (the physics, one 3x3 offset at a time).
# --------------------------------------------------------------------------------------

def _density_update(scal, own, nbrs, accs):
    """compute_shader.wgsl:207-254 — self included."""
    h, dn, nn = scal[0], scal[1], scal[2]
    (ox, oy), (nx, ny) = own, nbrs
    _, _, dist = _pair_geom(ox, oy, nx, ny)
    v = h - dist
    inside = dist < h
    rho, rhon = accs
    rho = rho + jnp.sum(jnp.where(inside, dn * v * v, 0.0), axis=-1)
    rhon = rhon + jnp.sum(jnp.where(inside, nn * v * v * v, 0.0), axis=-1)
    return rho, rhon


def _pressure_update(scal, own, nbrs, accs):
    """compute_shader.wgsl:256-334 — self excluded by idx, ε-guarded direction with
    (0,1) fallback, and the ρ_j·ρnear_j denominator quirk (:326-327) kept verbatim.

    Per-slot pressure terms (p/ρ², np/ρ², np/(ρ·ρnear)) arrive PRECOMPUTED (see
    :func:`pressure_terms`) — they depend on one particle only, so evaluating them
    per pair would waste ~2 divisions + 6 multiplies on every candidate."""
    h, dn, nn = scal[0], scal[1], scal[2]
    (ox, oy, oi, opt, onpo, _), (nx, ny, ni, npt, _, nnpn) = own, nbrs

    dx, dy, dist = _pair_geom(ox, oy, nx, ny)
    valid = (dist < h) & (oi[:, :, None] != ni[:, None, :])

    near0 = dist <= _EPS_DIST
    inv_d = jnp.where(near0, 0.0, 1.0 / jnp.where(near0, 1.0, dist))

    pressure_term = opt[:, :, None] + npt[:, None, :]
    near_term = onpo[:, :, None] + nnpn[:, None, :]

    v = h - dist
    dw = -2.0 * dn * v
    dwn = -3.0 * nn * v * v
    mag = jnp.where(valid, pressure_term * dw + near_term * dwn, 0.0)
    # fold the direction normalisation into the magnitude; (0,1) fallback for d≈0
    m = mag * inv_d
    fx, fy = accs
    fx = fx + jnp.sum(dx * m, axis=-1)
    fy = fy + jnp.sum(dy * m + jnp.where(near0, mag, 0.0), axis=-1)
    return fx, fy


def pressure_terms(rho, rhon, params):
    """Per-slot pressure terms: (p/ρ², np/ρ², np/(ρ·ρnear)), guarded for empties."""
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    rhon_safe = jnp.where(rhon > 0, rhon, 1.0)
    inv_rho2 = 1.0 / (rho_safe * rho_safe)
    p = (rho - params.target_density) * params.pressure_multiplier
    np_ = rhon * params.near_density_multiplier
    return p * inv_rho2, np_ * inv_rho2, np_ / (rho_safe * rhon_safe)


def _viscosity_update(scal, own, nbrs, accs):
    """compute_shader.wgsl:336-384 — Σ (v_j − v_i)·W_visc, self excluded."""
    h, vn = scal[0], scal[1]
    (ox, oy, oi, ovx, ovy), (nx, ny, ni, nvx, nvy) = own, nbrs
    _, _, dist = _pair_geom(ox, oy, nx, ny)
    valid = (dist < h) & (oi[:, :, None] != ni[:, None, :])
    u = h * h - dist * dist
    w = jnp.where(valid, vn * u * u * u, 0.0)
    fx, fy = accs
    fx = fx + jnp.sum((nvx[:, None, :] - ovx[:, :, None]) * w, axis=-1)
    fy = fy + jnp.sum((nvy[:, None, :] - ovy[:, :, None]) * w, axis=-1)
    return fx, fy


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


def _plane_call(update, planes, n_out, gh, wt, cp, tc, interpret):
    """Shared pallas_call over width-segmented planes.

    Each padded plane [gh+2, wt+2, CP] is re-laid out as [gh+2, nseg, seg+2, CP]
    (halo columns duplicated between segments), then enters the kernel 3x with
    row-shifted index maps — every block is non-overlapping within its input, VMEM
    stays bounded at any width, and Pallas double-buffers the slab fetches.
    """
    seg = _seg_width(wt, tc)
    nseg = wt // seg
    kernel = _make_seg_kernel(update, len(planes), n_out, tc, seg)

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
    out_spec = pl.BlockSpec((1, 1, seg, cp), lambda r, s: (r, s, 0, 0))
    call = pl.pallas_call(
        kernel,
        grid=(gh, nseg),
        in_specs=in_specs,
        out_specs=tuple([out_spec] * n_out),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((gh, nseg, seg, cp), jnp.float32)] * n_out
        ),
        # rows/segments are independent: lets Mosaic pipeline slab fetches freely
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )

    def run(*a):
        outs = call(*a)
        return tuple(o.reshape(gh, wt, cp) for o in outs)

    return run, args


def _run(update, scal, planes, n_out, spec, interpret):
    interpret, gh, gw, cp, tc, wt = _setup(spec, interpret)
    call, args = _plane_call(update, planes, n_out, gh, wt, cp, tc, interpret)
    args[0] = scal
    outs = call(*args)
    C = spec.capacity
    return tuple(o[:, :gw, :C] for o in outs)


# --------------------------------------------------------------------------------------
# Pre-padded entry points (used by the multi-chip sharded step, whose ghost rows come
# from ppermute halo exchange rather than sentinel padding).
# --------------------------------------------------------------------------------------

def plane_geometry(gw: int, capacity: int):
    """(cp, tc, wt): lane-padded slot dim, cells per tile, tile-padded width."""
    cp = _lane_pad(capacity)
    tc = _tile_cells(cp)
    wt = ((gw + tc - 1) // tc) * tc
    return cp, tc, wt


def run_padded(update, scal, padded_planes, n_out: int, interpret: bool):
    """Run a pass over pre-padded planes [rows+2, wt+2, CP]; returns [rows, wt, CP].

    The caller owns ALL padding: ghost rows (halo or sentinel), ghost columns, tile
    and lane padding.  Plane geometry must come from :func:`plane_geometry`.
    """
    rows = padded_planes[0].shape[0] - 2
    wtp2, cp = padded_planes[0].shape[1], padded_planes[0].shape[2]
    wt = wtp2 - 2
    tc = _tile_cells(cp)
    call, args = _plane_call(update, padded_planes, n_out, rows, wt, cp, tc, interpret)
    args[0] = scal
    return call(*args)


def density_scalars(params):
    return jnp.stack(
        [params.smoothing_radius, params.density_kernel_norm,
         params.near_density_kernel_norm]
    ).astype(jnp.float32)


def pressure_scalars(params):
    # the optimized pressure kernel consumes the same (h, dn, nn) triple
    return density_scalars(params)


def viscosity_scalars(params):
    return jnp.stack(
        [params.smoothing_radius, params.viscosity_kernel_norm]
    ).astype(jnp.float32)


def density_cells_pallas(px, py, *, spec, params, interpret=None):
    """[gh, gw, C] position planes -> (rho, rhon) [gh, gw, C]."""
    _, gh, gw, cp, tc, wt = _setup(spec, interpret)
    scal = density_scalars(params)
    planes = [_pad_plane(px, gh, gw, wt, _SENTINEL, cp),
              _pad_plane(py, gh, gw, wt, _SENTINEL, cp)]
    return _run(_density_update, scal, planes, 2, spec, interpret)


def pressure_cells_pallas(px, py, idx, rho, rhon, *, spec, params, interpret=None):
    """Pressure + near-pressure force planes (fx, fy)."""
    _, gh, gw, cp, tc, wt = _setup(spec, interpret)
    scal = pressure_scalars(params)
    pt, npo, npn = pressure_terms(rho, rhon, params)
    planes = [
        _pad_plane(px, gh, gw, wt, _SENTINEL, cp),
        _pad_plane(py, gh, gw, wt, _SENTINEL, cp),
        _pad_plane(idx, gh, gw, wt, -1.0, cp),
        _pad_plane(pt, gh, gw, wt, 0.0, cp),
        _pad_plane(npo, gh, gw, wt, 0.0, cp),
        _pad_plane(npn, gh, gw, wt, 0.0, cp),
    ]
    return _run(_pressure_update, scal, planes, 2, spec, interpret)


def viscosity_cells_pallas(px, py, idx, vx, vy, *, spec, params, interpret=None):
    """Viscosity force planes (fx, fy) using current velocity planes."""
    _, gh, gw, cp, tc, wt = _setup(spec, interpret)
    scal = viscosity_scalars(params)
    planes = [
        _pad_plane(px, gh, gw, wt, _SENTINEL, cp),
        _pad_plane(py, gh, gw, wt, _SENTINEL, cp),
        _pad_plane(idx, gh, gw, wt, -1.0, cp),
        _pad_plane(vx, gh, gw, wt, 0.0, cp),
        _pad_plane(vy, gh, gw, wt, 0.0, cp),
    ]
    return _run(_viscosity_update, scal, planes, 2, spec, interpret)
