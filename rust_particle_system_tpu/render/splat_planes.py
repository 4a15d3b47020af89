"""Fused-frame renderer: patch-splat straight from the simulation's cell planes.

The standalone rasterizer (``splat_pallas.py``) re-bins particles into its own pixel
grid — a sort plus wide gathers that cost tens of ms at 1M particles.  But the SPH step
already HAS the particles in cell-dense planes; this renderer consumes those planes
directly (positions + velocity -> colours computed elementwise in plane space), so the
marginal render cost is just the splat kernel + patch reassembly, no binning at all.

Generalizes the 8px patch kernel to the sim grid's anisotropic cell strides: each cell
(cell_w x cell_h world units = sx*cell_w x sy*cell_h pixels) splats into a patch of
(stride + 2*margin) pixels per side; patches overlap neighbors by one stride and the
image reassembles with the same 2x2 quadrant shifted-add.

Requires pixel strides >= 2*margin (quadrant split) and sprite radius <= margin;
the wrapper asserts both statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.kernels import energy_color
from ..ops.grid import GridSpec
from .splat_jax import RenderSpec, splat_resolve

MARGIN = 4
_FAR = 1.0e6
_TC = 8  # cell rows per program


def _round_up(x, m):
    return -(-x // m) * m


def planes_compatible(grid_spec, render_spec, bounds, margin: int) -> bool:
    """True iff the plane rasterizer's static preconditions hold for this geometry:
    integral pixel strides, stride >= 2*margin (quadrant reassembly), and sprite
    radius <= margin.  Callers with other geometry (non-1:1 world-to-pixel scale,
    max_radius_px > MARGIN) must fall back to the general splat."""
    x_min, x_max, y_min, y_max = (float(b) for b in bounds)
    sx_scale = render_spec.width / (x_max - x_min)
    sy_scale = render_spec.height / (y_max - y_min)
    sx_px = grid_spec.cell_width * sx_scale
    sy_px = grid_spec.cell_size * sy_scale
    if abs(sx_px - round(sx_px)) > 1e-6 or abs(sy_px - round(sy_px)) > 1e-6:
        return False
    if min(round(sx_px), round(sy_px)) < 2 * margin:
        return False
    return render_spec.max_radius_px <= margin


def _make_kernel(ph: int, pw: int, lanes: int, sy_px: int, sx_px: int, gw: int,
                 height: int, margin: int):
    """Kernel over [TC cells, cap] planes -> [TC, lanes] patches (lanes >= ph*pw).

    Cell rows index bottom-up in world space while pixel rows run top-down, so cell
    cy's patch sits at pixel row ``height - (cy+1)*sy_px - margin``.

    MXU formulation: all coordinates are PATCH-LOCAL (<= ph px — local coords keep
    the quadratic-form expansion exact in f32; in global pixel coords the
    |p|^2 + |q|^2 - 2pq cancellation would lose ~6 digits).  The pair distances
    arrive as one batched [TC, C, 4] x [TC, 4, lanes] matmul per program and the
    four channel accumulations as one [TC, 4, C] x [TC, C, lanes] matmul, leaving
    only the ~10-op sprite-profile chain on the VPU.
    """

    def kernel(scal_ref, apix_ref, px_ref, py_ref, r_ref, g_ref, b_ref,
               pr_ref, pg_ref, pb_ref, pa_ref):
        radius = scal_ref[0]
        t = pl.program_id(0)

        cell = (t * _TC + jax.lax.broadcasted_iota(jnp.int32, (_TC, 1), 0)).astype(
            jnp.float32
        )
        cy = jnp.floor(cell / gw)
        cx = cell - cy * gw
        origin_x = cx * sx_px - margin  # [TC, 1]
        origin_y = height - (cy + 1.0) * sy_px - margin

        # Patch-local slot coordinates; sentinel slots (1e6) stay far away.
        qx = px_ref[:] - origin_x  # [TC, C]
        qy = py_ref[:] - origin_y

        # d^2 = (qx^2 + qy^2) - 2 qx lx - 2 qy ly + (lx^2 + ly^2) as a K=4 matmul:
        # B [TC, C, 4] = (-2qx, -2qy, qx^2+qy^2, 1);  A [4, lanes] precomputed
        # = (lx, ly, 1, lx^2+ly^2) with dead lanes parked at -FAR.
        bmat = jnp.stack(
            [-2.0 * qx, -2.0 * qy, qx * qx + qy * qy, jnp.ones_like(qx)], axis=-1
        )
        amat = jnp.broadcast_to(apix_ref[:][None], (_TC, 4, lanes))
        d2 = jax.lax.dot_general(
            bmat, amat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TC, C, lanes]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))

        edge0 = 0.8 * radius
        tt = jnp.clip((dist - edge0) / jnp.maximum(radius - edge0, 1e-6), 0.0, 1.0)
        alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
        alpha = jnp.where(alpha < 0.01, 0.0, alpha)

        # Channel accumulation on the MXU: [TC, 4, C] x [TC, C, lanes]
        # (measured: ~1.3 ms/frame faster than four VPU mul+sum reductions).
        cols = jnp.stack(
            [r_ref[:], g_ref[:], b_ref[:], jnp.ones_like(r_ref[:])], axis=1
        )  # [TC, 4, C]
        acc = jax.lax.dot_general(
            cols, alpha, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TC, 4, lanes]
        pr_ref[:] = acc[:, 0, :]
        pg_ref[:] = acc[:, 1, :]
        pb_ref[:] = acc[:, 2, :]
        pa_ref[:] = acc[:, 3, :]

    return kernel


def _assemble(patches, ghc, gwc, ph, pw, sy, sx, height, width, margin):
    """[nc, lanes>=ph*pw] patches -> [H, W] accumulator via 2x2 quadrant adds.

    Cell row cy's patch starts at pixel row ``height - (cy+1)*sy - margin``; flipping
    the cell-row axis makes origins monotonically increasing, with a constant shift
    ``off = ghc*sy - height`` absorbed by the final crop.
    """
    p = patches[:, : ph * pw].reshape(ghc, gwc, ph, pw)[::-1]  # flip cell rows
    canvas = jnp.zeros((ghc + 1, gwc + 1, sy, sx), patches.dtype)
    for qy in range(2):
        for qx in range(2):
            quad = p[:, :, qy * sy : min((qy + 1) * sy, ph),
                     qx * sx : min((qx + 1) * sx, pw)]
            hh, ww = quad.shape[2], quad.shape[3]
            if hh == 0 or ww == 0:
                continue
            quad = jnp.pad(quad, ((0, 0), (0, 0), (0, sy - hh), (0, sx - ww)))
            canvas = canvas.at[qy : qy + ghc, qx : qx + gwc].add(quad)
    img = canvas.transpose(0, 2, 1, 3).reshape((ghc + 1) * sy, (gwc + 1) * sx)
    off = ghc * sy - height  # >= 0: world rows extend above the viewport top
    return img[margin + off : margin + off + height, margin : margin + width]


@functools.partial(
    jax.jit,
    static_argnames=("grid_spec", "render_spec", "interpret", "bounds_static",
                     "margin", "resolve"),
)
def splat_from_planes(px, py, vx, vy, live, particle_size, max_energy,
                      *, bounds_static: tuple, grid_spec: GridSpec,
                      render_spec: RenderSpec,
                      background=(0.0, 0.0, 0.0, 1.0), interpret: bool | None = None,
                      margin: int | None = None, colors=None,
                      resolve: bool = True):
    """Render from sim cell planes ([gh, gw, C] world-space pos + vel + live mask).

    Colours are the kinetic-energy ramp of (vx, vy), computed per slot — the same
    per-particle colour the step writes into state (compute_shader.wgsl:101-118) —
    unless ``colors`` (an (r, g, b) tuple of [gh, gw, C] planes) supplies them
    directly (the standalone render path, which must draw state.color as-is).
    Returns an [H, W, 4] image.  Requires the world->pixel scale to make pixel strides
    integral (true for the default 1 unit = 1 px mapping).

    ``margin`` (static) bounds sprite-center drift outside the binning cell PLUS the
    sprite radius; callers whose planes are exact (no post-binning movement) can pass
    ``render_spec.max_radius_px`` to shrink the patch; the fused frame needs one
    extra pixel of drift slack (ops/pallas/sph_step.py).  Defaults to MARGIN (4).
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

    ph = sy_px + 2 * margin
    pw = sx_px + 2 * margin
    lanes = _round_up(ph * pw, 128)

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

    nc = gh * gw
    nc_pad = _round_up(nc, _TC)

    def flat(a, fill):
        a = a.reshape(nc, C)
        if nc_pad > nc:
            a = jnp.concatenate([a, jnp.full((nc_pad - nc, C), fill, a.dtype)])
        return a

    planes = [flat(ppx, _FAR), flat(ppy, _FAR), flat(r, 0.0), flat(gcol, 0.0),
              flat(b, 0.0)]
    radius_px = particle_size * sx_scale
    scal = jnp.stack([radius_px]).astype(jnp.float32)

    # Precomputed pixel matrix A [4, lanes]: patch-local (lx, ly, 1, lx^2+ly^2),
    # dead lanes (beyond ph*pw) parked at -FAR so every pair distance is huge.
    pidx = jnp.arange(lanes, dtype=jnp.float32)
    prow = jnp.floor(pidx / pw)
    pcol = pidx - prow * pw
    dead = pidx >= ph * pw
    lx = jnp.where(dead, -_FAR, pcol + 0.5)
    ly = jnp.where(dead, -_FAR, prow + 0.5)
    apix = jnp.stack([lx, ly, jnp.ones_like(lx), lx * lx + ly * ly])

    kernel = _make_kernel(ph, pw, lanes, sy_px, sx_px, gw, rs.height, margin)
    block = pl.BlockSpec((_TC, C), lambda t: (t, 0))
    out_block = pl.BlockSpec((_TC, lanes), lambda t: (t, 0))
    pr, pg, pb, pa = pl.pallas_call(
        kernel,
        grid=(nc_pad // _TC,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((4, lanes), lambda t: (0, 0))] + [block] * 5,
        out_specs=tuple([out_block] * 4),
        out_shape=tuple([jax.ShapeDtypeStruct((nc_pad, lanes), jnp.float32)] * 4),
        interpret=interpret,
    )(scal, apix, *planes)

    args = (gh, gw, ph, pw, sy_px, sx_px, rs.height, rs.width, margin)
    rgb_acc = jnp.stack(
        [_assemble(pr[:nc], *args), _assemble(pg[:nc], *args),
         _assemble(pb[:nc], *args)],
        axis=-1,
    )
    a_acc = _assemble(pa[:nc], *args)
    if not resolve:
        # Raw accumulators for distributed composites: sum across shards with a
        # psum (accumulation is commutative), then splat_resolve once.
        return rgb_acc, a_acc
    return splat_resolve(rgb_acc, a_acc, background)
