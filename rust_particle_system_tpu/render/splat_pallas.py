"""Pallas point-splat rasterizer — the TPU production renderer (sub-ms @ 1080p goal).

The reference rasterizes with the GPU's fixed-function instancing + blending
(`src/particle_render.rs:101`, 6 verts x n instances).  TPUs have no rasterizer, and
scatter-adds serialize, so this kernel inverts the problem into streaming dense math:

1. particles are binned into **render cells** of PATCH_STRIDE x PATCH_STRIDE pixels
   (via the same sort-based ``ops.grid`` machinery, in pixel space);
2. a Pallas kernel forward-splats each cell's <=capacity particles into its private
   ``PATCH x PATCH`` pixel patch (cell extent + margin on every side) — a
   ``[cells_per_program, capacity, PATCH*PATCH]`` VPU tile, no scatter, no overlap;
3. XLA reassembles the image: patches overlap their neighbors by exactly one stride,
   so the final image is a **4-term shifted add** of the patch grid (pure slicing).

The sprite profile and the commutative premultiplied blend match ``splat_jax.py``
exactly (its scatter-add implementation is this kernel's parity oracle); the fragment
profile itself mirrors render_shader.wgsl:86-98.

Constraint: the sprite radius in pixels must fit the margin
(``particle_size * scale <= MARGIN``); the wrapper asserts this statically via
``RenderSpec.max_radius_px <= MARGIN``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.grid import GridSpec, build_grid
from .splat_jax import RenderSpec, splat_resolve, world_to_pixel

PATCH_STRIDE = 8  # render-cell extent in pixels
MARGIN = 4  # sprite-radius margin on each side
PATCH = PATCH_STRIDE + 2 * MARGIN  # 16: patch edge in pixels
_PIX = PATCH * PATCH  # 256 lanes
_FAR = 1.0e6

_TC = 8  # cells per program


def _splat_kernel(scal_ref, px_ref, py_ref, r_ref, g_ref, b_ref,
                  pr_ref, pg_ref, pb_ref, pa_ref):
    """Forward-splat one block of cells into their pixel patches.

    Inputs [TC, cap] (pixel-space positions + colors); outputs [TC, PATCH*PATCH].
    """
    radius = scal_ref[0]
    gwc = scal_ref[1]  # render-grid width (f32, exact for small ints)
    t = pl.program_id(0)

    cap = px_ref.shape[1]
    # cell ids of this block -> patch pixel origin (top-left, pixel coords)
    cell = (t * _TC + jax.lax.broadcasted_iota(jnp.int32, (_TC, 1, 1), 0)).astype(jnp.float32)
    cy = jnp.floor(cell / gwc)
    cx = cell - cy * gwc
    origin_x = cx * PATCH_STRIDE - MARGIN
    origin_y = cy * PATCH_STRIDE - MARGIN

    # patch pixel centres [1, 1, PIX]
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _PIX), 2).astype(jnp.float32)
    prow = jnp.floor(pidx / PATCH)
    pcol = pidx - prow * PATCH
    pix_x = origin_x + pcol + 0.5  # [TC, 1, PIX]
    pix_y = origin_y + prow + 0.5

    dx = pix_x - px_ref[:][:, :, None]  # [TC, cap, PIX]
    dy = pix_y - py_ref[:][:, :, None]
    dist = jnp.sqrt(dx * dx + dy * dy)

    # soft-disc coverage: 1 - smoothstep(0.8r, r, d), discard < 0.01
    # (render_shader.wgsl:86-98)
    edge0 = 0.8 * radius
    tt = jnp.clip((dist - edge0) / jnp.maximum(radius - edge0, 1e-6), 0.0, 1.0)
    alpha = 1.0 - tt * tt * (3.0 - 2.0 * tt)
    alpha = jnp.where(alpha < 0.01, 0.0, alpha)

    pr_ref[:] = jnp.sum(alpha * r_ref[:][:, :, None], axis=1)
    pg_ref[:] = jnp.sum(alpha * g_ref[:][:, :, None], axis=1)
    pb_ref[:] = jnp.sum(alpha * b_ref[:][:, :, None], axis=1)
    pa_ref[:] = jnp.sum(alpha, axis=1)


def _assemble(patches, ghc, gwc, height, width):
    """[ncells, PATCH*PATCH] patch plane -> [H, W] image accumulator.

    Every pixel is covered by exactly 2x2 patches (stride 8, extent 16); the image is
    the sum of the four (dy, dx)-shifted patch quadrant grids — pure reshapes/pads.
    """
    p = patches.reshape(ghc, gwc, PATCH, PATCH)
    # Scatter-free: lay each patch at (cy*S - M, cx*S - M) on a padded canvas by
    # splitting the patch into 2x2 stride-sized quadrants; quadrant (qy, qx) of cell
    # (cy, cx) lands at canvas tile (cy + qy, cx + qx) with fixed in-tile offset.
    S, M = PATCH_STRIDE, MARGIN
    canvas = jnp.zeros((ghc + 1, gwc + 1, S, S), patches.dtype)
    for qy in range(2):
        for qx in range(2):
            quad = p[:, :, qy * S : (qy + 1) * S, qx * S : (qx + 1) * S]
            canvas = canvas.at[
                qy : qy + ghc, qx : qx + gwc
            ].add(quad)
    # canvas tile (ty, tx) covers pixels [ty*S - M, ...): crop margin and size
    img = canvas.transpose(0, 2, 1, 3).reshape((ghc + 1) * S, (gwc + 1) * S)
    return img[M : M + height, M : M + width]


@functools.partial(
    jax.jit, static_argnames=("spec", "interpret", "capacity", "return_overflow")
)
def splat_pallas(pos, color, particle_size, bounds, spec: RenderSpec,
                 background=(0.0, 0.0, 0.0, 1.0), capacity: int = 64,
                 interpret: bool | None = None, return_overflow: bool = False,
                 camera=None):
    """Drop-in for ``splat_jax.splat`` (same signature + blend), Pallas-accelerated.

    Sprites beyond ``capacity`` per 8x8px render cell are dropped from the image; pass
    ``return_overflow=True`` to get ``(image, dropped_count)`` and monitor it (dense
    states — e.g. fluid compacted against a wall — can exceed the default 64).
    ``camera`` is a traced (cx, cy, zoom) pan/zoom — binning happens in the SCREEN's
    pixel space, so the camera composes with it for free; keep ``particle_size *
    zoom`` within ``max_radius_px`` world-to-pixel or sprites clip at the margin."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    assert spec.max_radius_px <= MARGIN, (
        f"sprite radius {spec.max_radius_px}px exceeds the {MARGIN}px patch margin"
    )

    px, py, sx, _sy = world_to_pixel(pos, bounds, spec, camera)
    radius_px = particle_size * sx

    # Render grid in pixel space; pad to a multiple of the program tile.
    gwc = -(-spec.width // PATCH_STRIDE)
    ghc = -(-spec.height // PATCH_STRIDE)
    rspec = GridSpec(
        x_min=0.0, y_min=0.0, cell_size=float(PATCH_STRIDE), gw=gwc, gh=ghc,
        capacity=capacity,
    )
    pix = jnp.stack([px, py], axis=-1)
    grid = build_grid(rspec, pix)
    nc = rspec.num_cells
    nc_pad = -(-(nc) // _TC) * _TC

    # TPU gather cost is per ROW and flat in row width, so all five channels ride
    # wide gathers: first sort the [n, 8] value rows once (1 x n rows), then pull
    # cell slots straight from the sorted stream via the table (1 x nc*cap rows) —
    # composing perm[table] instead would issue a SECOND nc*cap-row gather.
    n = pos.shape[0]
    values = jnp.concatenate(
        [
            px[:, None],
            py[:, None],
            color[:, :3],
            jnp.zeros((n, 3), jnp.float32),
        ],
        axis=-1,
    )  # [n, 8]
    fills = jnp.asarray([_FAR, _FAR, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    values_sorted = jnp.concatenate([values[grid.perm], fills[None, :]], axis=0)

    live = grid.table >= 0
    gathered = values_sorted[jnp.where(live, grid.table, n)]  # [nc+1, cap, 8]

    def plane(ch):
        out = gathered[:nc, :, ch]
        if nc_pad > nc:
            out = jnp.concatenate(
                [out, jnp.full((nc_pad - nc, capacity), float(fills[ch]), out.dtype)]
            )
        return out

    planes = [plane(0), plane(1), plane(2), plane(3), plane(4)]
    scal = jnp.stack([radius_px, jnp.float32(gwc)]).astype(jnp.float32)

    block = lambda: pl.BlockSpec((_TC, capacity), lambda t: (t, 0))
    out_block = pl.BlockSpec((_TC, _PIX), lambda t: (t, 0))
    pr, pg, pb, pa = pl.pallas_call(
        _splat_kernel,
        grid=(nc_pad // _TC,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [block() for _ in planes],
        out_specs=tuple([out_block] * 4),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nc_pad, _PIX), jnp.float32)] * 4
        ),
        interpret=interpret,
    )(scal, *planes)

    rgb_acc = jnp.stack(
        [
            _assemble(pr[:nc], ghc, gwc, spec.height, spec.width),
            _assemble(pg[:nc], ghc, gwc, spec.height, spec.width),
            _assemble(pb[:nc], ghc, gwc, spec.height, spec.width),
        ],
        axis=-1,
    )
    a_acc = _assemble(pa[:nc], ghc, gwc, spec.height, spec.width)
    image = splat_resolve(rgb_acc, a_acc, background)
    if return_overflow:
        return image, grid.overflow
    return image
