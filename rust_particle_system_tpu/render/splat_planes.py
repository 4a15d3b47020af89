"""Fused-frame renderer: row-strip patch-splat straight from the simulation's cell
planes.

The standalone rasterizer (``splat_pallas.py``) re-bins particles into its own pixel
grid — a sort plus wide gathers that cost tens of ms at 1M particles.  But the SPH step
already HAS the particles in cell-dense planes; this renderer consumes those planes
directly (positions + velocity -> colours computed elementwise in plane space), so the
marginal render cost is just the splat kernel, no binning at all.

Round-3 redesign (measured on-chip, protos/time_splat[23].py):

* **VPU pair distances.**  Round 2 computed the patch distances as a K=4
  quadratic-form matmul "for the MXU" — but K=4 uses 4/128 of the systolic array,
  and it measured ~7 of the 9 ms kernel.  ``(qx-lx)^2 + (qy-ly)^2`` as plain
  broadcast (sublane x lane) VPU ops is ~3x faster.
* **lane-aligned patch layout.**  Patch pixel (i, j) rides lane ``i*ROWPAD + j``
  (ROWPAD = 16 when the patch is <= 16 px wide, else 32), so each patch row is an
  aligned lane slice; dead lanes park at -FAR.
* **In-kernel row-strip assembly.**  Round 2 emitted per-cell patches and
  reassembled them in XLA — measured at ~48 ms of lane-hostile relayouts (the
  384->289 depad, the (17,17) lane split, the cell<->row transpose), 5x the kernel
  itself.  Here each program (one cell row) places its cells' patches INTO a row
  strip inside the kernel via two one-hot matmuls (cells -> strip lanes; x-overlap
  seams accumulate by read-modify-write between sub-tiles), and the XLA side folds
  only the y-overlap: two statically-shifted adds.  No relayouts anywhere.
* **Occupancy gating.**  A sub-tile (16 cells) whose slots are all empty skips its
  pair math and placement entirely (``pl.when`` on an in-kernel reduction) — in
  settled states most of the domain is air.
* This path is also a CORRECTNESS fix: the round-2 XLA assembly dropped sprite
  mass in the leftmost ``stride - margin`` image columns at the sim-grid geometry
  (found measuring against the scatter-add oracle at 1M; the new path matches the
  oracle to 4e-6).

Requires pixel strides >= 2*margin (y-overlap limited to adjacent cell rows),
patch width <= 32, and sprite radius <= margin; the wrapper asserts all statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.kernels import energy_color
from ..ops.grid import GridSpec
from .splat_jax import RenderSpec, splat_resolve

MARGIN = 4
_FAR = 1.0e6
_TCS = 32  # cells per in-kernel sub-tile (placement matmul granularity; on-chip
#            sweep at the 1080p sim-grid geometry: 16 -> 9.76 ms, 32 -> 9.17,
#            64 -> 11.20 — protos/time_splat5.py)
# Kernel v2 (round 3): patch row i rides SUBLANES, (cell-of-group, j) rides
# LANES — the spread/fold chain of v1 (move the cell index from sublanes to
# lanes through a [4, lanes, K] intermediate, ~4 ms of the 8.6 ms kernel at the
# 1080p/1M geometry, protos/time_splat6.py) does not exist at all: per group of
# 128//rowpad cells one small one-hot dot routes slot rows to lane segments, the
# pair math runs on [C, PH, 128] tiles, and placement into the row strip is one
# [4*PH, 128] x [128, 128] dot.  Falls back to v1 when the geometry doesn't fit
# (patch wider than 32 lanes or group span over 128 columns).
_KERNEL_V2 = True


def _round_up(x, m):
    return -(-x // m) * m


def planes_compatible(grid_spec, render_spec, bounds, margin: int) -> bool:
    """True iff the plane rasterizer's static preconditions hold for this geometry:
    integral pixel strides, stride >= 2*margin (adjacent-row y-overlap only),
    patch width <= 32 lanes, and sprite radius <= margin.  Callers with other
    geometry (non-1:1 world-to-pixel scale, very wide sprites) must fall back to
    the general splat."""
    x_min, x_max, y_min, y_max = (float(b) for b in bounds)
    sx_scale = render_spec.width / (x_max - x_min)
    sy_scale = render_spec.height / (y_max - y_min)
    sx_px = grid_spec.cell_width * sx_scale
    sy_px = grid_spec.cell_size * sy_scale
    if abs(sx_px - round(sx_px)) > 1e-6 or abs(sy_px - round(sy_px)) > 1e-6:
        return False
    if min(round(sx_px), round(sy_px)) < 2 * margin:
        return False
    if round(sx_px) + 2 * margin > 32:
        return False
    return render_spec.max_radius_px <= margin


def drifted_patch_margin(grid_spec, render_spec, bounds, patch_margin=None) -> int:
    """Static patch margin for renders of DRIFTED planes (the fused frame and
    ``render_plane_state``, where positions moved at most one integration past
    their binned cell).

    Defaults to the TIGHT patch — sprite radius + 1 px of drift slack, relying
    on the rasterizer's in-kernel center clamping for drift beyond the slack —
    but never violates the ``stride >= 2*margin`` precondition: on coarse-pixel
    geometries the drift slack shrinks first and the sprite-radius floor is
    kept last (geometries below even that floor fail ``planes_compatible`` and
    must use the general splat).  An explicit ``patch_margin`` requests the
    classic wide patch, still floored at the sprite radius and capped at
    :data:`MARGIN`.
    """
    if bounds is None:  # callers without static bounds keep the uncapped default
        stride_cap = MARGIN
    else:
        x_min, x_max, y_min, y_max = (float(b) for b in bounds)
        sx_px = int(round(grid_spec.cell_width * render_spec.width
                          / (x_max - x_min)))
        sy_px = int(round(grid_spec.cell_size * render_spec.height
                          / (y_max - y_min)))
        stride_cap = min(sx_px, sy_px) // 2
    if patch_margin is None:
        margin = min(render_spec.max_radius_px + 1, stride_cap)
    else:
        margin = min(MARGIN, max(patch_margin, render_spec.max_radius_px))
    return max(margin, render_spec.max_radius_px)


def _placement_consts(tcs, rowpad, lanes, sx_px, pw):
    """One-hot matrices for the in-kernel cells->strip placement.

    E1[t, k] spreads sub-tile cell t to its K-lane group; mj[l, k] selects the
    patch column j = k % rowpad from patch lane l; P[k, x] places (t, j) at strip
    column t*sx_px + j (x-overlapping columns of adjacent cells simply both map —
    the matmul accumulates them).
    """
    K = tcs * rowpad
    E1 = np.zeros((tcs, K), np.float32)
    for t in range(tcs):
        E1[t, t * rowpad : (t + 1) * rowpad] = 1.0
    mj = np.zeros((lanes, K), np.float32)
    for l in range(lanes):
        for k in range(l % rowpad, K, rowpad):
            mj[l, k] = 1.0
    span = tcs * sx_px + pw - sx_px
    span_pad = _round_up(span, 128)
    P = np.zeros((K, span_pad), np.float32)
    for k in range(K):
        j = k % rowpad
        if j < pw:
            P[k, (k // rowpad) * sx_px + j] = 1.0
    return jnp.asarray(E1), jnp.asarray(mj), jnp.asarray(P), K, span_pad


def _clamp_center(q, radius, hi):
    """Clamp a live sprite center into [radius, hi - radius] of its patch so an
    over-drifted sprite renders DISPLACED (mass-preserving) instead of clipped
    at the patch edge; dead slots (parked at ~_FAR) stay parked."""
    qc = jnp.clip(q, radius, hi - radius)
    return jnp.where(q > 0.1 * _FAR, q, qc)


def _make_strip_kernel(gh, wt, C, tcs, rowpad, lanes, K, span_pad,
                       sx_px, sy_px, margin, height, WP, PH_PAD,
                       clamp_drift: bool = False):
    nsub = wt // tcs
    HI = jax.lax.Precision.HIGHEST
    ph = sy_px + 2 * margin
    pw = sx_px + 2 * margin

    def kernel(scal_ref, apix_ref, e1_ref, mj_ref, p_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]  # 1 / (radius - 0.8*radius), eps-guarded
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = height - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((4, 1, PH_PAD, WP), jnp.float32)
        # Static unroll: the seam RMW needs static lane offsets (dynamic lane-dim
        # slices are restricted in Mosaic).
        for t in range(nsub):
            sl = slice(t * tcs, (t + 1) * tcs)
            pxs = px_ref[0, sl, :]                                  # [tcs, C]
            any_live = jnp.max(jnp.where(pxs < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(t=t, sl=sl, pxs=pxs):
                cellx = (t * tcs
                         + jax.lax.broadcasted_iota(jnp.int32, (tcs, 1), 0)
                         ).astype(jnp.float32)
                qx = pxs - (cellx * sx_px - margin)
                qy = py_ref[0, sl, :] - origin_y
                if clamp_drift:
                    qx = _clamp_center(qx, radius, jnp.float32(pw))
                    qy = _clamp_center(qy, radius, jnp.float32(ph))
                cols = jnp.stack(
                    [r_ref[0, sl, :], g_ref[0, sl, :], b_ref[0, sl, :],
                     jnp.ones((tcs, C), jnp.float32)], axis=1)      # [tcs,4,C]
                dx = qx[:, :, None] - apix_ref[0][None, None, :]
                dy = qy[:, :, None] - apix_ref[1][None, None, :]
                dist = jnp.sqrt(dx * dx + dy * dy)                  # [tcs,C,LN]
                tt = jnp.clip((dist - 0.8 * radius) * inv_w, 0.0, 1.0)
                alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                alpha = jnp.where(alpha < 0.01, 0.0, alpha)  # discard rule
                acc = jax.lax.dot_general(
                    cols, alpha, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=HI)
                # cells -> K lanes (one-hot over t), keep (i, j) patch rows
                y = jax.lax.dot_general(
                    acc, e1_ref[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                z = (y * mj_ref[...][None]).reshape(
                    4, lanes // rowpad, rowpad, K)
                zi = jnp.sum(z, axis=2)                             # [4,ph',K]
                r0 = zi.shape[1]
                if r0 < PH_PAD:
                    zi = jnp.concatenate(
                        [zi, jnp.zeros((4, PH_PAD - r0, K), jnp.float32)],
                        axis=1)
                strip = jax.lax.dot_general(
                    zi[:, :PH_PAD, :], p_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                x0 = t * tcs * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + span_pad]
                q_ref[:, 0, :, x0 : x0 + span_pad] = cur + strip

    return kernel


def _make_strip_kernel_v2(gh, wt, C, G, rowpad, sx_px, sy_px, margin,
                          height, WP, PH_PAD, pw, nch: int = 4,
                          clamp_drift: bool = False):
    """Row-sublane rasterizer: one program per cell row; per group of G cells the
    slot planes are routed to lane segments by a one-hot dot, the sprite alphas
    are evaluated on [C, PH_PAD, 128] tiles (i on sublanes, (cell, j) on lanes),
    channels reduce over the slot dim, and one [nch*PH_PAD, 128] x [128, 128] dot
    places the group's patches into the row strip at their x offsets.

    ``nch=3`` is the sum-rule variant: the caller guarantees r+g+b sums to a
    known per-state scalar K, so only (r·α, g·α, α) accumulate and the blue
    channel reconstructs linearly as K·a − r − g downstream (exact for
    energy_color's ramp, K=1, and warm-up white, K=3) — one broadcast-mul and
    one C-deep reduction chain less per pair tile, and q/placement shrink 25%.
    Measured exact vs the 4-channel kernel to 2.4e-6 at 1M/1080p
    (protos/time_splat9.py)."""
    ngroup = wt // G
    HI = jax.lax.Precision.HIGHEST

    def kernel(scal_ref, e8_ref, base_ref, ljc_ref, iy_ref, p8_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref, q_ref):
        radius = scal_ref[0]
        inv_w = scal_ref[1]
        rr = jnp.float32(gh - 1) - jnp.float32(pl.program_id(0))
        origin_y = height - (rr + 1.0) * sy_px - margin
        q_ref[...] = jnp.zeros((nch, 1, PH_PAD, WP), jnp.float32)
        for g in range(ngroup):
            sl = slice(g * G, (g + 1) * G)
            pxg = px_ref[0, sl, :]                                  # [G, C]
            any_live = jnp.max(jnp.where(pxg < 0.5 * _FAR, 1.0, 0.0)) > 0.5

            @pl.when(any_live)
            def _(g=g, sl=sl, pxg=pxg):
                chans = [pxg, py_ref[0, sl, :], r_ref[0, sl, :],
                         g_ref[0, sl, :]]
                if nch == 4:
                    chans.append(b_ref[0, sl, :])
                planes5 = jnp.stack(chans)                       # [nch+1,G,C]
                lanes5 = jax.lax.dot_general(
                    planes5, e8_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                # lanes5[k, c, l]: slot c of cell l//rowpad, channel k
                qxl = lanes5[0] - (base_ref[...] + jnp.float32(g * G * sx_px))
                qyl = lanes5[1] - origin_y                          # [C, 128]
                if clamp_drift:
                    # patch-local x rides base_ref's per-lane frame: the legal
                    # center range within each cell's patch is [r, pw - r].
                    qxl = _clamp_center(qxl, radius, jnp.float32(pw))
                    qyl = _clamp_center(qyl, radius,
                                        jnp.float32(sy_px + 2 * margin))
                dxl = ljc_ref[...] - qxl
                dx2 = dxl * dxl
                dy = iy_ref[...][None] - qyl[:, None, :]            # [C,PH,128]
                d = jnp.sqrt(dy * dy + dx2[:, None, :])
                tt = jnp.clip((d - 0.8 * radius) * inv_w, 0.0, 1.0)
                alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                alpha = jnp.where(alpha < 0.01, 0.0, alpha)  # discard rule
                parts = [jnp.sum(lanes5[k][:, None, :] * alpha, axis=0)
                         for k in range(2, nch + 1)]
                parts.append(jnp.sum(alpha, axis=0))
                accs = jnp.stack(parts)                          # [nch,PH,128]
                strip = jax.lax.dot_general(
                    accs, p8_ref[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI)
                x0 = g * G * sx_px
                cur = q_ref[:, 0, :, x0 : x0 + 128]
                q_ref[:, 0, :, x0 : x0 + 128] = cur + strip

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("grid_spec", "render_spec", "interpret", "bounds_static",
                     "margin", "resolve", "clamp_drift"),
)
def splat_from_planes(px, py, vx, vy, live, particle_size, max_energy,
                      *, bounds_static: tuple, grid_spec: GridSpec,
                      render_spec: RenderSpec,
                      background=(0.0, 0.0, 0.0, 1.0), interpret: bool | None = None,
                      margin: int | None = None, colors=None,
                      resolve: bool = True, color_sum=None,
                      clamp_drift: bool = False):
    """Render from sim cell planes ([gh, gw, C] world-space pos + vel + live mask).

    Colours are the kinetic-energy ramp of (vx, vy), computed per slot — the same
    per-particle colour the step writes into state (compute_shader.wgsl:101-118) —
    unless ``colors`` (an (r, g, b) tuple of [gh, gw, C] planes) supplies them
    directly (the standalone render path, which must draw state.color as-is).
    Returns an [H, W, 4] image (or the raw ``(rgb_acc, a_acc)`` accumulators when
    ``resolve=False`` — additive, for distributed psum composites).

    ``margin`` (static) bounds sprite-center drift outside the binning cell PLUS the
    sprite radius; callers whose planes are exact (no post-binning movement) can pass
    ``render_spec.max_radius_px`` to shrink the patch; the fused frame needs one
    extra pixel of drift slack (ops/pallas/sph_step.py).  Defaults to MARGIN (4).
    Patches <= 16 px wide ride the fast 16-lane row layout; wider ones fall back
    to 32-lane rows (2x the pair lanes — prefer margins that keep stride+2m <= 16).

    ``color_sum`` (traced scalar or None) opts into the SUM-RULE kernel: the
    caller asserts every live slot's r+g+b equals this scalar (energy_color's
    ramp sums to 1 on both segments; warm-up white sums to 3), so the kernel
    accumulates only (r·α, g·α, α) and blue reconstructs linearly as
    color_sum·a − r − g after the fold (psum-composite-safe).  None, or a
    geometry that falls back to the v1 kernel, accumulates all 4 channels.

    ``clamp_drift`` (static) clamps live sprite centers into their patch
    ([radius, patch − radius] per axis): a sprite whose within-frame drift
    exceeds ``margin − radius`` renders DISPLACED by the excess instead of
    clipped at the patch edge — mass-preserving graceful degradation that lets
    the fused frame default to the tight patch.  Off for exact-plane callers
    (standalone renders), where positions cannot leave the patch.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    g, rs = grid_spec, render_spec
    gh, gw, C = px.shape
    if margin is None:
        margin = MARGIN

    x_min, x_max, y_min, y_max = (float(b) for b in bounds_static)
    sx_scale = rs.width / (x_max - x_min)
    sy_scale = rs.height / (y_max - y_min)
    sx_px = int(round(g.cell_width * sx_scale))
    sy_px = int(round(g.cell_size * sy_scale))
    assert abs(sx_px - g.cell_width * sx_scale) < 1e-6, "pixel stride must be integral"
    assert abs(sy_px - g.cell_size * sy_scale) < 1e-6, "pixel stride must be integral"
    assert min(sx_px, sy_px) >= 2 * margin, "pixel stride must be >= 2*margin"
    assert rs.max_radius_px <= margin

    H, W = rs.height, rs.width
    ph = sy_px + 2 * margin
    pw = sx_px + 2 * margin
    assert pw <= 32, "patch width > 32 lanes; use the general splat"
    rowpad = 16 if pw <= 16 else 32
    lanes = _round_up(ph * rowpad, 128)
    off = gh * sy_px - H  # world rows extend above the viewport top
    assert off >= 0
    G = 128 // rowpad  # v2: cells per lane group
    use_v2 = (_KERNEL_V2 and ph <= 32
              and (G - 1) * sx_px + pw <= 128)

    # world -> pixel in plane space (elementwise); dead slots park far away
    ppx = jnp.where(live, (px - x_min) * sx_scale, _FAR)
    ppy = jnp.where(live, (y_max - py) * sy_scale, _FAR)
    if colors is None:
        vel = jnp.stack([vx, vy], axis=-1)
        rgb = energy_color(vel, max_energy)[..., :3]
        rgb = (rgb[..., 0], rgb[..., 1], rgb[..., 2])
    else:
        rgb = colors
    r = jnp.where(live, rgb[0], 0.0)
    gcol = jnp.where(live, rgb[1], 0.0)
    b = jnp.where(live, rgb[2], 0.0)

    tcs = G if use_v2 else _TCS
    wt = _round_up(gw, tcs)
    nsub = wt // tcs

    def plane(a, fill):
        if wt == gw:
            return a
        padc = jnp.full((gh, wt - gw, C), fill, jnp.float32)
        return jnp.concatenate([a, padc], axis=1)

    planes = [plane(ppx, _FAR), plane(ppy, _FAR), plane(r, 0.0),
              plane(gcol, 0.0), plane(b, 0.0)]

    radius_px = particle_size * sx_scale
    inv_w = 1.0 / jnp.maximum(radius_px - 0.8 * radius_px, 1e-6)
    scal = jnp.stack([radius_px, inv_w]).astype(jnp.float32)

    PH_PAD = _round_up(ph, 8)
    in_block = pl.BlockSpec((1, wt, C), lambda rr: (gh - 1 - rr, 0, 0))

    nch = 3 if (color_sum is not None and use_v2) else 4
    if use_v2:
        WP = _round_up((nsub - 1) * G * sx_px + 128, 128)
        lidx = np.arange(128)
        lt, lj = lidx // rowpad, lidx % rowpad
        E8 = jnp.asarray((lidx[None, :] // rowpad
                          == np.arange(G)[:, None]).astype(np.float32))
        base = jnp.asarray((lt * sx_px - margin)[None, :], jnp.float32)
        ljc = jnp.asarray(np.where(lj < pw, lj + 0.5, -_FAR)[None, :],
                          jnp.float32)
        iy = jnp.asarray(np.broadcast_to(
            (np.arange(PH_PAD) + 0.5)[:, None], (PH_PAD, 128)), jnp.float32)
        P8 = np.zeros((128, 128), np.float32)
        for l in range(128):
            if l % rowpad < pw:
                P8[l, (l // rowpad) * sx_px + l % rowpad] = 1.0
        kernel = _make_strip_kernel_v2(gh, wt, C, G, rowpad, sx_px, sy_px,
                                       margin, H, WP, PH_PAD, pw, nch=nch,
                                       clamp_drift=clamp_drift)
        consts = (scal, E8, base, ljc, iy, jnp.asarray(P8))
        const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec((G, 128), lambda rr: (0, 0)),
                       pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                       pl.BlockSpec((1, 128), lambda rr: (0, 0)),
                       pl.BlockSpec((PH_PAD, 128), lambda rr: (0, 0)),
                       pl.BlockSpec((128, 128), lambda rr: (0, 0))]
    else:
        # patch pixel (i, j) on lane i*rowpad + j; dead lanes parked at -FAR
        lidx = np.arange(lanes)
        li, lj = lidx // rowpad, lidx % rowpad
        ldead = (li >= ph) | (lj >= pw)
        apix = jnp.asarray(
            np.stack([np.where(ldead, -_FAR, lj + 0.5),
                      np.where(ldead, -_FAR, li + 0.5)]), jnp.float32)

        E1, mj, P, K, span_pad = _placement_consts(tcs, rowpad, lanes, sx_px,
                                                   pw)
        WP = _round_up((nsub - 1) * tcs * sx_px + span_pad, 128)

        kernel = _make_strip_kernel(gh, wt, C, tcs, rowpad, lanes, K, span_pad,
                                    sx_px, sy_px, margin, H, WP, PH_PAD,
                                    clamp_drift=clamp_drift)
        consts = (scal, apix, E1, mj, P)
        const_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec((2, lanes), lambda rr: (0, 0)),
                       pl.BlockSpec((tcs, K), lambda rr: (0, 0)),
                       pl.BlockSpec((lanes, K), lambda rr: (0, 0)),
                       pl.BlockSpec((K, span_pad), lambda rr: (0, 0))]

    q = pl.pallas_call(
        kernel,
        grid=(gh,),
        in_specs=const_specs + [in_block] * 5,
        out_specs=pl.BlockSpec((nch, 1, PH_PAD, WP), lambda rr: (0, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, gh, PH_PAD, WP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*consts, *planes)

    # y-overlap fold: strip row R' patch row i lands at image row
    # R'*sy_px + i - margin - off.  Two statically-shifted adds.
    img = jnp.zeros((nch, H, W), jnp.float32)
    a_part = q[:, :, :sy_px, :].reshape(nch, gh * sy_px, WP)
    sa = -margin - off
    y0, y1 = max(0, sa), min(H, gh * sy_px + sa)
    img = img.at[:, y0:y1, :].add(
        a_part[:, y0 - sa : y1 - sa, margin : margin + W])
    nb = ph - sy_px  # = 2*margin <= sy_px
    b_part = q[:, :, sy_px:ph, :]
    b_part = jnp.concatenate(
        [b_part, jnp.zeros((nch, gh, sy_px - nb, WP), jnp.float32)], axis=2)
    b_part = b_part.reshape(nch, gh * sy_px, WP)
    sb = sy_px - margin - off
    y0, y1 = max(0, sb), min(H, gh * sy_px + sb)
    img = img.at[:, y0:y1, :].add(
        b_part[:, y0 - sb : y1 - sb, margin : margin + W])

    if nch == 3:
        # Sum-rule reconstruction: every live slot's r+g+b == color_sum, so
        # b_acc = color_sum·a_acc − r_acc − g_acc (linear — composes with psum).
        a_acc = img[2]
        blue = color_sum * a_acc - img[0] - img[1]
        rgb_acc = jnp.stack([img[0], img[1], blue], axis=-1)
    else:
        rgb_acc = jnp.moveaxis(img[:3], 0, -1)
        a_acc = img[3]
    if not resolve:
        # Raw accumulators for distributed composites: sum across shards with a
        # psum (accumulation is commutative), then splat_resolve once.
        return rgb_acc, a_acc
    return splat_resolve(rgb_acc, a_acc, background)
