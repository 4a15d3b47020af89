"""Band-sharded PLANE-RESIDENT multi-chip step — the production pipeline on a mesh.

Round-2's sharded step (sharded_step.py) still ran the round-1 stream pipeline:
per-frame local sort, pack/ppermute migration buffers, classic kernel layout, and a
scatter-add composite.  This module promotes every single-chip production win to the
mesh:

* **State IS the shard layout.**  ``PlaneState`` channel planes ``[gh, gw, C]``
  shard by cell rows over the band mesh (``P("bands")`` on axis 0) — each chip owns
  ``R = gh / n_bands`` rows of cell slots.  No per-frame sort, no particle-slot
  arrays, no validity masks.
* **Migration IS the rebin.**  The lossless hole-fill rebin (ops/pallas/rebin.py,
  variant 5) runs pass Y with ppermute'd ghost boundary rows: a mover whose
  destination row lies in the neighbor band is adopted by that band's edge cell
  exactly like any local move; the acceptance mask ppermutes back so the source
  band vacates the slot.  Fixed-capacity migration buffers, CFL round counts and
  band-violation bookkeeping all disappear — fast particles hop one row per frame
  toward their destination (deferred from forces while in transit) and cross as
  many band boundaries as frames allow, losslessly.
* **Force walks are THE production kernels** — ``_forces_from_cells`` (classic or
  pair-packed pack2 layout) with its halo callback bound to ppermute, so the
  multi-chip step compiles the same Mosaic kernels as the single-chip step.
* **Fused render on-mesh**: each band rasterizes its rows with the MXU patch splat
  (render/splat_planes.py) into full-image accumulators and composites with one
  ``psum`` — pixel-exact vs the single-chip rasterizer.

Per-frame schedule on every chip (all shapes static):

1. gravity + predict                                   (elementwise)
2. rebin pass Y with ghost rows + acceptance return    ── ppermute ×(k+1) + ×2
3. rebin pass X (band-local)
4. defer mask (dest != resident): park from forces
5. density walk with position/velocity ghost rows      ── ppermute
6. fused pressure+viscosity walk with P1/NPn ghosts    ── ppermute
7. integrate + bounce (elementwise); conservation psum

Diagnostics: live-count conservation (exact under the lossless rebin) and the
deferred count, both psum'd — `check_plane_diags` raises on violations.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import kernels as K
from ..core.params import SimParams
from ..ops.grid import GridSpec
from ..ops.pallas.rebin import (
    SENTINEL,
    _hole_fill_pass,
    _rebin_v6_band,
    _retention_merge,
    _round_up,
)
from ..ops.pallas.resident import PlaneState, plane_state_from_particles
from ..ops.pallas.sph_step import _forces_from_cells
from .sharded_step import exchange_halo


def shard_plane_state(ps: PlaneState, mesh, axis: str = "bands") -> PlaneState:
    """Place a PlaneState's planes band-sharded on the mesh (rows over chips)."""
    n_bands = mesh.shape[axis]
    assert ps.px.shape[0] % n_bands == 0, (
        f"grid height {ps.px.shape[0]} must divide by n_bands {n_bands}"
    )
    plane_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return PlaneState(
        px=jax.device_put(ps.px, plane_sh),
        py=jax.device_put(ps.py, plane_sh),
        vx=jax.device_put(ps.vx, plane_sh),
        vy=jax.device_put(ps.vy, plane_sh),
        idsf=jax.device_put(ps.idsf, plane_sh),
        frame=jax.device_put(ps.frame, rep),
        lost=jax.device_put(ps.lost, rep),
        n=ps.n,
    )


def _local_plane_physics(px, py, vx, vy, idsf, params: SimParams, *,
                         spec: GridSpec, n_bands: int, axis: str,
                         interpret: bool, rebin_variant: int = 6):
    """One physics frame on this chip's [R, gw, C] plane slab."""
    R, gw, C = px.shape
    band = jax.lax.axis_index(axis)
    row0 = band * R  # first global cell row of this band
    nc_local = R * gw
    nc_pad = _round_up(nc_local, 128)
    dt = params.dt

    live = px < 0.5 * SENTINEL
    live_before = jax.lax.psum(jnp.sum(live, dtype=jnp.int32), axis)

    # 1. gravity + predict (compute_shader.wgsl:397-405)
    vxp = jnp.where(live, vx, 0.0)
    vyp = jnp.where(live, vy - params.gravity * dt, 0.0)
    predx = jnp.where(live, px + vxp * dt, SENTINEL)
    predy = jnp.where(live, py + vyp * dt, SENTINEL)

    fills = (SENTINEL, SENTINEL, 0.0, 0.0, 0.0)
    chans = [predx, predy, vxp, vyp, idsf]

    if rebin_variant == 6:
        # 2.+3. the PRODUCTION row-fused rebin (variant 6) with a 2-deep
        # ppermute halo: each band receives the neighbor-below's last two px/py
        # rows (the second-deep row only feeds the retention re-derivation) and
        # last value row, plus the neighbor-above's first row of every channel.
        # Retention is re-derived IN-KERNEL from the ghosts, so v5's acceptance
        # ppermute + two XLA retention merges + window concats all disappear —
        # the round-4 ~14 ms/chip sharded overhead's main term.  Mesh-edge
        # ghost zeros are harmless: every neighbor-row read is guarded by the
        # kernel's global-row edge conditions (see _rebin_v6_band).
        lo1, hi1 = [], []
        for p in chans:
            lo, hi = exchange_halo(p[R - 1], p[0], axis, n_bands)
            lo1.append(lo)
            hi1.append(hi)
        if R >= 2:
            lo2 = [exchange_halo(chans[c][R - 2], chans[c][R - 2],
                                 axis, n_bands)[0] for c in (0, 1)]
        else:
            # R == 1: global row row0-2 lives two bands up — second hop.
            lo2 = [exchange_halo(lo1[c], lo1[c], axis, n_bands)[0]
                   for c in (0, 1)]
        out, _ = _rebin_v6_band(chans, spec, fills, row0, lo2, lo1, hi1,
                                interpret)
        npx, npy, nvx0, nvy0, nidsf = out
    else:
        def flat(p, f):
            x = p.reshape(nc_local, C)
            if nc_pad > nc_local:
                x = jnp.concatenate(
                    [x, jnp.full((nc_pad - nc_local, C), f, jnp.float32)])
            return x

        flats = [flat(p, f) for p, f in zip(chans, fills)]

        # 2. rebin pass Y with cross-band ghosts.  Ghost rows: my row R-1 goes
        # UP, my row 0 goes DOWN; I receive the band-below's row R-1 (ghost_lo)
        # and the band-above's row 0 (ghost_hi).  Edge bands receive zeros ->
        # re-park the position channels at the sentinel so nothing is adopted
        # from the void.
        ghosts = []
        masks = None
        for c, p in enumerate(chans):
            top = p[R - 1]  # [gw, C]
            bot = p[0]
            lo, hi = exchange_halo(top, bot, axis, n_bands)
            if c == 0:
                # edge bands receive ppermute zeros, which read as "live at
                # (0,0)" in position channels — exchange a validity mask and
                # re-park the dead
                vlo, vhi = exchange_halo(
                    jnp.where(live[R - 1], 1.0, 0.0),
                    jnp.where(live[0], 1.0, 0.0), axis, n_bands)
                masks = (vlo > 0.5, vhi > 0.5)
            if fills[c] == SENTINEL:
                lo = jnp.where(masks[0], lo, SENTINEL)
                hi = jnp.where(masks[1], hi, SENTINEL)
            else:
                lo = jnp.where(masks[0], lo, fills[c])
                hi = jnp.where(masks[1], hi, fills[c])
            ghosts.append((lo, hi))

        mid, _, acc = _hole_fill_pass(
            flats, spec, fills, gw, True, interpret, lossless=True,
            ghosts=ghosts, row_offset=row0, nc_valid=nc_local)

        # Acceptance return: my acc rows [0, gw) group 0 adopted the
        # band-below's row R-1 slots -> send DOWN; my rows [(R-1)gw, Rgw)
        # group 1 adopted the band-above's row 0 slots -> send UP.
        # (exchange_halo's top/up, bottom/down convention: "top" payload lands
        # at the upper neighbor.)
        adopt_of_below = acc[:gw, :C]  # [gw, C]
        adopt_of_above = acc[(R - 1) * gw : R * gw, C:]
        # exchange_halo(a, b) returns (from-below's a, from-above's b): the
        # band below's "adopt_of_above" is its adoption of MY row 0; the band
        # above's "adopt_of_below" is its adoption of MY row R-1.
        remote_lo, remote_hi = exchange_halo(adopt_of_above, adopt_of_below,
                                             axis, n_bands)
        extra = jnp.zeros((nc_pad, C), jnp.float32)
        extra = extra.at[:gw].set(remote_lo)
        extra = extra.at[(R - 1) * gw : R * gw].add(remote_hi)
        mid = _retention_merge(flats, mid, acc, spec, gw, True, row_offset=row0,
                               extra_adopted=extra)

        # 3. rebin pass X — band-local (cross-band lanes fail the row compare).
        out, _, acc = _hole_fill_pass(mid, spec, fills, 1, False, interpret,
                                      lossless=True, row_offset=row0,
                                      nc_valid=nc_local)
        out = _retention_merge(mid, out, acc, spec, 1, False, row_offset=row0)

        npx = out[0][:nc_local].reshape(R, gw, C)
        npy = out[1][:nc_local].reshape(R, gw, C)
        nvx0 = out[2][:nc_local].reshape(R, gw, C)
        nvy0 = out[3][:nc_local].reshape(R, gw, C)
        nidsf = out[4][:nc_local].reshape(R, gw, C)

    # 4. defer: live slots whose destination differs from the resident cell
    # (capacity-retained or in transit, incl. cross-band transit) skip the force
    # walk this frame — the overflow contract (see ops/pallas/resident.py).
    kx = jnp.clip(jnp.floor((npx - spec.x_min) / spec.cell_width)
                  .astype(jnp.int32), 0, spec.gw - 1)
    ky = jnp.clip(jnp.floor((npy - spec.y_min) / spec.cell_size)
                  .astype(jnp.int32), 0, spec.gh - 1)
    cellx = jnp.arange(gw, dtype=jnp.int32)[None, :, None]
    celly = row0 + jnp.arange(R, dtype=jnp.int32)[:, None, None]
    nlive = npx < 0.5 * SENTINEL
    defer = nlive & ((kx != cellx) | (ky != celly))
    fpx = jnp.where(defer, SENTINEL, npx)
    fpy = jnp.where(defer, SENTINEL, npy)

    # 5./6. the production force walks, ghost rows via ppermute.
    def halo_cb(x, fill):
        lo, hi = exchange_halo(x[R - 1], x[0], axis, n_bands)
        flo = fpx[R - 1] < 0.5 * SENTINEL
        fbo = fpx[0] < 0.5 * SENTINEL
        vlo, vhi = exchange_halo(jnp.where(flo, 1.0, 0.0),
                                 jnp.where(fbo, 1.0, 0.0), axis, n_bands)
        lo = jnp.where(vlo > 0.5, lo, fill)
        hi = jnp.where(vhi > 0.5, hi, fill)
        return lo, hi

    nvx, nvy = _forces_from_cells(fpx, fpy, nvx0, nvy0, spec, params, interpret,
                                  halo=halo_cb)
    nvx = jnp.where(defer, nvx0, nvx)
    nvy = jnp.where(defer, nvy0, nvy)

    # 7. integrate from pred-consistent positions; bounce; re-park dead slots.
    fx = npx + (nvx - nvx0) * dt
    fy = npy + (nvy - nvy0) * dt
    pos2, vel2 = K.bounce_bounds(
        jnp.stack([fx, fy], axis=-1), jnp.stack([nvx, nvy], axis=-1),
        params.bounds, params.damping_factor,
    )
    opx = jnp.where(nlive, pos2[..., 0], SENTINEL)
    opy = jnp.where(nlive, pos2[..., 1], SENTINEL)
    ovx = jnp.where(nlive, vel2[..., 0], 0.0)
    ovy = jnp.where(nlive, vel2[..., 1], 0.0)
    oid = jnp.where(nlive, nidsf, 0.0)

    live_after = jax.lax.psum(jnp.sum(nlive, dtype=jnp.int32), axis)
    diags = {
        "live_before": live_before,
        "live_after": live_after,
        "deferred": jax.lax.psum(jnp.sum(defer, dtype=jnp.int32), axis),
    }
    return opx, opy, ovx, ovy, oid, diags


def check_plane_diags(diags, expect_particles: int | None = None) -> dict:
    """Raise on conservation violations (there must be none: the rebin is
    lossless by construction); return host ints.  ``deferred`` is informational —
    persistent large values mean the grid capacity is undersized for the density
    the flow reaches (same monitoring advice as single-chip ``grid_overflow``)."""
    vals = {k: int(v) for k, v in diags.items()}
    if vals["live_after"] != vals["live_before"]:
        raise ValueError(
            f"plane-sharded step lost particles: {vals['live_before']} -> "
            f"{vals['live_after']} — lossless-rebin invariant violated (bug)"
        )
    if expect_particles is not None and vals["live_after"] != expect_particles:
        raise ValueError(
            f"particle count {vals['live_after']} != expected {expect_particles}"
        )
    return vals


def make_plane_sharded_step(spec: GridSpec, mesh, axis: str = "bands",
                            interpret: bool | None = None,
                            rebin_variant: int = 6):
    """Build the jitted band-sharded plane step: (PlaneState, SimParams) ->
    (PlaneState, diags).  The PlaneState's planes must be sharded with
    :func:`shard_plane_state` (rows over the ``axis`` mesh dimension).

    ``rebin_variant``: 6 (default) = the production row-fused rebin with the
    2-deep ppermute halo (same Mosaic kernel as the single-chip step, bit-
    identical output); 5 = the two-pass hole-fill with acceptance-return
    ppermute (the round-3/4 schedule, kept as a cross-check)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_bands = mesh.shape[axis]
    assert spec.gh % n_bands == 0, (
        f"gh={spec.gh} must divide by n_bands={n_bands}; build the grid from "
        f"parallel.shard.make_shard_spec-padded bounds"
    )
    body = functools.partial(_local_plane_physics, spec=spec, n_bands=n_bands,
                             axis=axis, interpret=interpret,
                             rebin_variant=rebin_variant)
    smap = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,  # pallas_call outputs carry no varying-axis annotation
    )

    @jax.jit
    def step(ps: PlaneState, params: SimParams):
        def live_frame(s):
            px, py, vx, vy, idsf, diags = smap(
                s.px, s.py, s.vx, s.vy, s.idsf, params)
            return dataclasses.replace(
                s, px=px, py=py, vx=vx, vy=vy, idsf=idsf), diags

        def frozen_frame(s):
            live = jnp.sum(s.live, dtype=jnp.int32)
            return s, {"live_before": live, "live_after": live,
                       "deferred": jnp.asarray(0, jnp.int32)}

        new_ps, diags = jax.lax.cond(
            ps.frame >= params.shader_delay, live_frame, frozen_frame, ps)
        return dataclasses.replace(new_ps, frame=ps.frame + 1), diags

    return step


def make_plane_sharded_frame(spec: GridSpec, mesh, render_spec, bounds_static,
                             axis: str = "bands",
                             interpret: bool | None = None,
                             rebin_variant: int = 6):
    """Fused sharded step + distributed render: each band rasterizes its rows
    with the MXU patch splat into full-image accumulators; one psum composites.
    Returns a jitted (PlaneState, SimParams) -> (PlaneState, image, diags)."""
    from ..render.splat_jax import splat_resolve
    from ..render.splat_planes import splat_from_planes

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    step = make_plane_sharded_step(spec, mesh, axis, interpret, rebin_variant)
    n_bands = mesh.shape[axis]
    R = spec.gh // n_bands

    def local_render(px, py, vx, vy, params):
        band = jax.lax.axis_index(axis)
        # Rasterize ONLY this band's rows: embed the local slab in a full-height
        # plane of sentinels (the rasterizer's patch origin comes from the
        # global cell id, so rows must sit at their global index).  Dead rows
        # cost kernel lanes but no HBM re-reads; see module docstring.
        full = jnp.full((spec.gh, spec.gw, spec.capacity), SENTINEL, jnp.float32)
        fpx = jax.lax.dynamic_update_slice(full, px, (band * R, 0, 0))
        fpy = jax.lax.dynamic_update_slice(full, py, (band * R, 0, 0))
        zfull = jnp.zeros_like(full)
        fvx = jax.lax.dynamic_update_slice(zfull, vx, (band * R, 0, 0))
        fvy = jax.lax.dynamic_update_slice(zfull, vy, (band * R, 0, 0))
        rgb_acc, a_acc = splat_from_planes(
            fpx, fpy, fvx, fvy, fpx < 0.5 * SENTINEL,
            params.particle_size, params.max_energy,
            bounds_static=bounds_static, grid_spec=spec,
            render_spec=render_spec, interpret=interpret, margin=4,
            resolve=False,
            # Mass-preserving drift clamp, same as the single-chip plane
            # renders (per-sprite and pre-accumulation, so it commutes with
            # the psum composite).
            clamp_drift=True,
            # Ramp colors sum to 1; blue reconstructs pre-psum (linear, so the
            # composite is unchanged).
            color_sum=jnp.float32(1.0),
        )
        rgb_acc = jax.lax.psum(rgb_acc, axis)
        a_acc = jax.lax.psum(a_acc, axis)
        return splat_resolve(rgb_acc, a_acc, (0.0, 0.0, 0.0, 1.0))

    rmap = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def frame(ps: PlaneState, params: SimParams):
        new_ps, diags = step(ps, params)
        image = rmap(new_ps.px, new_ps.py, new_ps.vx, new_ps.vy, params)
        return new_ps, image, diags

    return frame
