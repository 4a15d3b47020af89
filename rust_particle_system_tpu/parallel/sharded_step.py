"""Multi-chip SPH step: shard_map over a band mesh with ICI halo exchange + migration.

Everything the reference gets "for free" from a single GPU queue becomes explicit here
(SURVEY.md §2.3): the inter-pass barrier is data dependence inside one jitted program;
neighbor access across band boundaries is a **one-cell-row halo exchange** with ring
neighbors via ``lax.ppermute`` (riding ICI on real hardware); particles that cross a
band boundary **migrate** in fixed-capacity buffers via the same ppermute rings.

Per-frame schedule on every chip (all shapes static):

1. gravity + predicted positions
2. migrate: particles whose predicted cell-row left the band go to the adjacent band
   (one band per step max — violations are clamped and counted)
3. local bin/sort into the band's [rows_per_band * gw] cell grid
4. halo exchange ghost rows (positions + velocities + validity)   ── ppermute ×2
5. density pass (Pallas plane kernel, ghost-aware)
6. halo exchange ghost pressure terms                             ── ppermute ×2
7. fused pressure+viscosity pass → velocity update (spec v2: viscosity over the
   round-4 pre-pressure velocities, so no third halo round exists)
8. integrate + bounce + colour (slot-masked)

Diagnostics (psum'd, replicated): migration drops, band violations, grid overflow —
the multi-chip analog of the reference's disabled debug validators (`src/debug.rs`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..core import kernels as K
from ..core.params import SimParams
from ..ops.pallas.plane_build import cell_planes_aos
from ..ops.pallas.sph import (
    _SENTINEL,
    density_planes,
    force_planes,
    plane_geometry,
    pressure_terms,
)
from .shard import ShardedState, ShardSpec


# ----------------------------------------------------------------------------------
# Fixed-capacity pack / insert (migration buffers).
# ----------------------------------------------------------------------------------

def pack_rows(values, mask, K: int):
    """Compact masked rows of ``values`` [cap, F] into a [K, F] buffer.

    Returns (buffer, buffer_valid [K] bool, dropped count).  Deterministic: rows keep
    their slot order; rows beyond K are dropped (counted).
    """
    cap = values.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1  # position among packed rows
    dest = jnp.where(mask & (rank < K), rank, K)  # overflow -> trash row K
    buf = jnp.zeros((K + 1,) + values.shape[1:], values.dtype).at[dest].set(values)[:K]
    total = jnp.sum(mask.astype(jnp.int32))
    count = jnp.minimum(total, K)
    buf_valid = jnp.arange(K) < count
    return buf, buf_valid, total - count


def insert_rows(dst, dst_valid, buf, buf_valid):
    """Place valid buffer rows into free slots of ``dst``.

    Returns (new_dst, new_valid, dropped).  Free slots fill in slot order.
    """
    count = jnp.sum(buf_valid.astype(jnp.int32))
    free = ~dst_valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    take = free & (free_rank < count)
    src = jnp.where(take, free_rank, 0)
    new_dst = jnp.where(take[:, None], buf[src], dst)
    inserted = jnp.sum(take.astype(jnp.int32))
    return new_dst, dst_valid | take, count - inserted


# ----------------------------------------------------------------------------------
# Ring exchange helpers.
# ----------------------------------------------------------------------------------

def _perm_up(n):  # band b -> b+1
    return [(i, i + 1) for i in range(n - 1)]


def _perm_down(n):  # band b -> b-1
    return [(i, i - 1) for i in range(1, n)]


def exchange_halo(top_row, bottom_row, axis: str, n_bands: int):
    """Send my top cell-row up and bottom cell-row down; receive ghosts.

    Returns (ghost_bottom, ghost_top): ghost_bottom is the band-below's top row,
    ghost_top the band-above's bottom row.  Edge bands receive zeros.
    """
    ghost_bottom = jax.lax.ppermute(top_row, axis, _perm_up(n_bands))
    ghost_top = jax.lax.ppermute(bottom_row, axis, _perm_down(n_bands))
    return ghost_bottom, ghost_top


# ----------------------------------------------------------------------------------
# Local grid build (band-local variant of ops.grid.build_grid).
# ----------------------------------------------------------------------------------

def _build_local_grid(local_keys, spec: ShardSpec):
    """Sort band-local keys; return (perm, sorted_keys, slot, starts, overflow).

    ``local_keys`` in [0, LC) for live particles, LC (trash) for empty slots;
    trash sorts after every live run, so ``starts`` ([LC + 1], run starts) bounds
    live cells exactly and feeds the aligned-window plane build directly.
    """
    LC, C = spec.local_cells, spec.grid.capacity
    cap = local_keys.shape[0]
    perm = jnp.argsort(local_keys, stable=True).astype(jnp.int32)
    ks = local_keys[perm]
    starts = jnp.searchsorted(ks, jnp.arange(LC + 1, dtype=jnp.int32), side="left")
    slot = jnp.arange(cap, dtype=jnp.int32) - starts[jnp.minimum(ks, LC)].astype(jnp.int32)
    live = ks < LC
    overflow = jnp.sum(live & (slot >= C)).astype(jnp.int32)
    return perm, ks, slot, starts, overflow


# ----------------------------------------------------------------------------------
# The per-chip physics body.
# ----------------------------------------------------------------------------------

def _local_physics(pos, vel, color, valid, params: SimParams, *, spec: ShardSpec,
                   axis: str, interpret: bool):
    g = spec.grid
    gw, R, C, LC = g.gw, spec.rows_per_band, g.capacity, spec.local_cells
    D, cap = spec.n_bands, spec.cap
    band = jax.lax.axis_index(axis)
    dt = params.dt

    # 1. gravity + predict
    vel = vel + jnp.array([0.0, -1.0], jnp.float32) * params.gravity * dt
    pred = pos + vel * dt

    # 2. migration by predicted band — ``spec.mig_rounds`` chained ±1-band exchange
    # rounds, so particles crossing up to mig_rounds bands per frame reach their
    # home band (size rounds via make_shard_spec(max_speed=...), the CFL guard).
    # Any particle STILL outside its band afterwards counts in band_violations —
    # drivers must treat that as an error (parallel.check_diags).
    send_drop = jnp.asarray(0, jnp.int32)
    recv_drop = jnp.asarray(0, jnp.int32)
    payload = jnp.concatenate([pos, vel, color], axis=-1)  # [cap, 8]
    for _ in range(spec.mig_rounds):
        pred_y = payload[:, 1] + payload[:, 3] * dt
        cy = jnp.clip(
            jnp.floor((pred_y - g.y_min) / g.cell_size).astype(jnp.int32),
            0, g.gh - 1,
        )
        target_band = cy // R
        clamped = jnp.clip(target_band, band - 1, band + 1)
        go_up = valid & (clamped == band + 1)
        go_down = valid & (clamped == band - 1)

        up_buf, up_valid, up_drop = pack_rows(payload, go_up, spec.mig_cap)
        dn_buf, dn_valid, dn_drop = pack_rows(payload, go_down, spec.mig_cap)

        recv_lo = jax.lax.ppermute(up_buf, axis, _perm_up(D))
        recv_lo_valid = jax.lax.ppermute(up_valid, axis, _perm_up(D))
        recv_hi = jax.lax.ppermute(dn_buf, axis, _perm_down(D))
        recv_hi_valid = jax.lax.ppermute(dn_valid, axis, _perm_down(D))

        valid = valid & ~(go_up | go_down)
        payload, valid, drop_a = insert_rows(payload, valid, recv_lo, recv_lo_valid)
        payload, valid, drop_b = insert_rows(payload, valid, recv_hi, recv_hi_valid)
        send_drop = send_drop + up_drop + dn_drop
        recv_drop = recv_drop + drop_a + drop_b

    pos, vel, color = payload[:, 0:2], payload[:, 2:4], payload[:, 4:8]
    pred = pos + vel * dt  # includes received particles

    # violations: particles whose home band is still elsewhere after all rounds
    cy_fin = jnp.clip(
        jnp.floor((pred[:, 1] - g.y_min) / g.cell_size).astype(jnp.int32),
        0, g.gh - 1,
    )
    violations = jnp.sum(valid & (cy_fin // R != band))

    # 3. local binning (keys relative to the band's cell rows)
    cx = jnp.clip(
        jnp.floor((pred[:, 0] - g.x_min) / g.cell_width).astype(jnp.int32), 0, gw - 1
    )
    cy = jnp.clip(
        jnp.floor((pred[:, 1] - g.y_min) / g.cell_size).astype(jnp.int32), 0, g.gh - 1
    )
    local_cy = jnp.clip(cy - band * R, 0, R - 1)
    local_keys = jnp.where(valid, local_cy * gw + cx, LC)
    perm, ks, slot, starts, grid_overflow = _build_local_grid(local_keys, spec)

    # 4. cell planes: one perm gather + the aligned-window dynamic-roll kernel,
    # exactly like the single-chip step (a per-slot table gather costs ~8 ns per
    # SLOT — 64x more index traffic), with halo ghost rows coming from ppermute
    # instead of padding.
    cp, tc, wt = plane_geometry(gw, C)
    packed = jnp.concatenate([pred, vel], axis=-1)[perm]  # [cap, 4] sorted
    cells = cell_planes_aos(
        packed, starts, LC, C, (_SENTINEL, _SENTINEL, 0.0, 0.0), interpret
    )  # [LC, C, 4]
    counts = jnp.minimum(starts[1 : LC + 1] - starts[:LC], C)
    live = jnp.arange(C, dtype=jnp.int32)[None, :] < counts[:, None]  # [LC, C]

    def row_slices(x):
        """(top cell-row, bottom cell-row) of an [LC, C(,k)] cell array."""
        return x[(R - 1) * gw : R * gw], x[0:gw]

    def halo(x):
        """Exchange top/bottom cell-rows; edge bands receive zeros."""
        return exchange_halo(*row_slices(x), axis, D)

    def plane_with_halo(interior, gb, gt, fill):
        """[LC, C] interior + [gw, C] ghosts -> padded plane [R+2, wt+2, CP]."""
        p = jnp.full((R + 2, wt + 2, cp), fill, jnp.float32)
        p = p.at[1 : R + 1, 1 : gw + 1, :C].set(
            interior.reshape(R, gw, C).astype(jnp.float32)
        )
        p = p.at[0, 1 : gw + 1, :C].set(gb.astype(jnp.float32))
        p = p.at[R + 1, 1 : gw + 1, :C].set(gt.astype(jnp.float32))
        return p

    # Halo round 1: positions + velocities + validity of boundary cell-rows (spec v2
    # fuses pressure+viscosity over PRE-pressure velocities, so ONE velocity halo
    # up front replaces round 1's position-only halo + a post-pressure round).
    cmask = live.astype(jnp.float32)
    gb_mask, gt_mask = halo(cmask)
    cpx = jnp.where(live, cells[..., 0], _SENTINEL)
    cpy = jnp.where(live, cells[..., 1], _SENTINEL)
    cvx = cells[..., 2].reshape(LC, C)
    cvy = cells[..., 3].reshape(LC, C)
    gb_px, gt_px = halo(cpx)
    gb_py, gt_py = halo(cpy)
    gb_vx, gt_vx = halo(cvx)
    gb_vy, gt_vy = halo(cvy)
    # ghost positions: ppermute zero-fills edge bands; re-park dead ghosts far away
    gb_px = jnp.where(gb_mask > 0.5, gb_px, _SENTINEL)
    gt_px = jnp.where(gt_mask > 0.5, gt_px, _SENTINEL)
    gb_py = jnp.where(gb_mask > 0.5, gb_py, _SENTINEL)
    gt_py = jnp.where(gt_mask > 0.5, gt_py, _SENTINEL)

    ppx = plane_with_halo(cpx, gb_px, gt_px, _SENTINEL)
    ppy = plane_with_halo(cpy, gb_py, gt_py, _SENTINEL)
    pvx = plane_with_halo(cvx, gb_vx, gt_vx, 0.0)
    pvy = plane_with_halo(cvy, gb_vy, gt_vy, 0.0)

    # 5. density (Pallas)
    rho_p, rhon_p = density_planes(ppx, ppy, params, interpret)
    rho = rho_p[:, :gw, :C].reshape(LC, C)
    rhon = rhon_p[:, :gw, :C].reshape(LC, C)

    # 6. per-slot pressure terms; halo round 2 ships the neighbor-consumed ones
    pt, npo, npn = pressure_terms(rho, rhon, params)
    gb_pt, gt_pt = halo(pt)
    gb_npn, gt_npn = halo(npn)
    ppt = plane_with_halo(pt, gb_pt, gt_pt, 0.0)
    pnpn = plane_with_halo(npn, gb_npn, gt_npn, 0.0)
    # own-only plane (no ghosts): [R, wt, CP]
    wnpo = jnp.zeros((R, wt, cp), jnp.float32).at[:, :gw, :C].set(
        npo.reshape(R, gw, C)
    )

    # 7. fused pressure + viscosity (Pallas) -> plane-space velocity update
    fpx, fpy, fvx, fvy = force_planes(
        ppx, ppy, ppt, pnpn, pvx, pvy, [wnpo], params, interpret
    )
    vscale = params.viscosity_kernel_norm * params.viscosity_strength * dt
    vx = cells[..., 2].reshape(R, gw, C) + fpx[:, :gw, :C] * dt \
        + fvx[:, :gw, :C] * vscale
    vy = cells[..., 3].reshape(R, gw, C) + fpy[:, :gw, :C] * dt \
        + fvy[:, :gw, :C] * vscale

    # packed final pull-back per sorted particle
    vplane = jnp.stack([vx.reshape(LC, C), vy.reshape(LC, C)], axis=-1)
    s = jnp.minimum(slot, C - 1)
    pulled = vplane[jnp.minimum(ks, LC - 1), s]
    in_table = ((slot < C) & (ks < LC))[:, None]
    vel_s = jnp.where(in_table, pulled, packed[:cap, 2:4])

    # 10. unsort, integrate, bounce, colour
    new_vel = vel_s[jnp.argsort(perm)]  # inverse-perm gather, not scatter
    new_pos = pos + new_vel * dt
    new_pos, new_vel = K.bounce_bounds(new_pos, new_vel, params.bounds, params.damping_factor)
    new_color = K.energy_color(new_vel, params.max_energy)

    # keep dead slots inert
    new_pos = jnp.where(valid[:, None], new_pos, pos)
    new_vel = jnp.where(valid[:, None], new_vel, 0.0)
    new_color = jnp.where(valid[:, None], new_color, 0.0)

    diags = {
        "migration_send_dropped": jax.lax.psum(send_drop, axis),
        "migration_recv_dropped": jax.lax.psum(recv_drop, axis),
        "band_violations": jax.lax.psum(violations, axis),
        "grid_overflow": jax.lax.psum(grid_overflow, axis),
        "live_particles": jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), axis),
    }
    return new_pos, new_vel, new_color, valid, diags


def check_diags(diags, expect_particles: int | None = None) -> dict:
    """Host-side guard over a step's psum'd diagnostics.  Raises ValueError.

    The multi-chip analog of runtime/debug.py's validators: band violations
    (a particle out-ran ``spec.mig_rounds`` migration rounds — raise mig_rounds or
    pass ``max_speed`` to make_shard_spec), migration buffer drops, and (optionally)
    particle conservation are hard errors, never silent.  Grid overflow is returned
    but not raised on (overflowing cells only lose force contributions, matching
    the single-chip semantics — monitor it).
    """
    vals = {k: int(v) for k, v in diags.items()}
    if vals.get("band_violations", 0) > 0:
        raise ValueError(
            f"{vals['band_violations']} particle(s) crossed more bands than "
            f"spec.mig_rounds allows in one frame — raise mig_rounds (or pass "
            f"max_speed to make_shard_spec) so migration provably keeps up"
        )
    dropped = vals.get("migration_send_dropped", 0) + vals.get(
        "migration_recv_dropped", 0
    )
    if dropped > 0:
        raise ValueError(
            f"{dropped} migrating particle(s) dropped by full buffers — raise "
            f"mig_cap/slack in make_shard_spec"
        )
    if expect_particles is not None and vals.get("live_particles") != expect_particles:
        raise ValueError(
            f"particle count changed: {vals.get('live_particles')} != "
            f"{expect_particles} (conservation violated)"
        )
    return vals


def zero_diags():
    z = jnp.asarray(0, jnp.int32)
    return {
        "migration_send_dropped": z,
        "migration_recv_dropped": z,
        "band_violations": z,
        "grid_overflow": z,
        "live_particles": z,
    }


def make_sharded_step(spec: ShardSpec, mesh: jax.sharding.Mesh, axis: str = "bands",
                      chunk_cells: int = 128, interpret: bool | None = None):
    """Build the jitted multi-chip step: (ShardedState, SimParams) -> (state, diags).

    Force passes run the same Pallas plane kernels as the single-chip step, with halo
    ghost rows arriving over ppermute.  ``chunk_cells`` is accepted for backward
    compatibility and unused.  ``interpret`` defaults to interpreter mode off-TPU.
    """
    del chunk_cells
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    body = functools.partial(_local_physics, spec=spec, axis=axis,
                             interpret=interpret)
    smap = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        # pallas_call outputs carry no varying-mesh-axis annotation; skip the check
        check_vma=False,
    )

    def _run(s: ShardedState, params: SimParams):
        pos, vel, color, valid, diags = smap(s.pos, s.vel, s.color, s.valid, params)
        return ShardedState(pos, vel, color, valid, s.frame), diags

    @jax.jit
    def step(sstate: ShardedState, params: SimParams):
        live = jnp.sum(sstate.valid.astype(jnp.int32))
        idle = {**zero_diags(), "live_particles": live}
        new_s, diags = jax.lax.cond(
            sstate.frame >= params.shader_delay,
            lambda s: _run(s, params),
            lambda s: (s, idle),
            sstate,
        )
        return new_s._replace(frame=sstate.frame + 1), diags

    return step
