"""Occupancy-sorted cell processing for the force walks — bound analysis
(VERDICT r4 #3, the one recorded-but-never-executed force lead).

The idea: process cells in occupancy order so slot-padding waste concentrates
into few tiles (BASELINE.md "credible route").  The catch: the pair walks are
STRUCTURAL — each A-unit's neighbors arrive as window slabs of the adjacent
rows/columns, so any cell reordering needs per-offset gathered copies of the
B planes (6 offsets x 6 channels at the force walk = data-dependent [row, 128]
gathers, ~8 ns/row measured in round 2), plus an inverse-permutation return.

This probe settles the thread with numbers BEFORE building kernels, by
computing on a real 1M live table:

  eff_cur     effective issued lanes under the SHIPPED tile gating (tc-row
              tiles, non-uniform chunks) — what the hardware executes today
  eff_group   the best ANY row-reordering could achieve at the same tile
              granularity (rows with a live chunk packed into full tiles)
  eff_row     the infinite-granularity floor (per-row gating, no tiles)

then converting the lane savings to milliseconds via the measured force span
(ms per effective lane), and comparing against the permutation glue's lower
bound (gather cost of rebuilding 6 channels x 3 row-windows in permuted
order + the inverse return, at 8 ns/row — the round-2 measured gather rate).

Run: python protos/occusort_bound.py [force_span_ms]   (CPU ok — pure layout)
"""

from __future__ import annotations

import sys

import numpy as np

FORCE_SPAN_MS = float(sys.argv[1]) if len(sys.argv) > 1 else 21.9

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from rust_particle_system_tpu.ops.grid import GridSpec, build_grid
import rust_particle_system_tpu.ops.pallas.sph as sph

N = 1_000_000
BOUNDS = (-963.0, 963.0, -540.0, 540.0)


def main() -> None:
    spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1,
                                pack2=True)
    C = spec.capacity
    kx, ky = jax.random.split(jax.random.key(7))
    pos = jnp.stack(
        [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
         jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
        axis=-1)
    grid = build_grid(spec, pos)
    nc = spec.num_cells
    live = np.asarray(grid.table >= 0)[:nc]
    np2 = (spec.gw + 1) // 2
    gwp = 2 * np2
    if gwp * spec.gh != nc:
        live = np.concatenate(
            [live.reshape(spec.gh, spec.gw, C),
             np.zeros((spec.gh, 1, C), bool)], axis=1).reshape(-1, C)
    rows = live.reshape(spec.gh, np2, 2 * C)
    _, tc, wt2 = sph.plane_geometry(np2, 2 * C)
    if wt2 > np2:
        rows = np.concatenate(
            [rows, np.zeros((spec.gh, wt2 - np2, 2 * C), bool)], axis=1)
    flat = rows.reshape(-1, 2 * C)  # all A-unit rows
    ntiles = flat.shape[0] // tc

    pts = sorted({min(C, max(0, int(round(f * C))))
                  for f in sph.CHUNK_SPLITS} | {0, C})
    segs = [(s * C + a, s * C + b)
            for s in (0, 1) for a, b in zip(pts[:-1], pts[1:])]

    eff_cur = eff_group = eff_row = 0
    for a, b in segs:
        w = b - a
        chunk_live = flat[:, a:b].any(axis=1)  # per A-row
        tiles = chunk_live.reshape(ntiles, tc).any(axis=1)
        eff_cur += int(tiles.sum()) * tc * w
        nlive_rows = int(chunk_live.sum())
        eff_group += -(-nlive_rows // tc) * tc * w  # pack live rows into tiles
        eff_row += nlive_rows * w
    lanes = 128  # sublane pair depth per issued lane row
    print(f"A-rows {flat.shape[0]} (tiles {ntiles} x tc={tc}), chunks {segs}")
    print(f"eff_cur   {eff_cur:>12,} lane-rows "
          f"({eff_cur * 6 * lanes / 1e9:.2f} G pair-lanes/walk)")
    print(f"eff_group {eff_group:>12,} ({100 * (1 - eff_group / eff_cur):.1f}% "
          "fewer) — best ANY reorder at tile granularity")
    print(f"eff_row   {eff_row:>12,} ({100 * (1 - eff_row / eff_cur):.1f}% "
          "fewer) — infinite-granularity floor")

    ms_per_lane = FORCE_SPAN_MS / eff_cur
    save_group = (eff_cur - eff_group) * ms_per_lane
    save_row = (eff_cur - eff_row) * ms_per_lane
    print(f"\nforce span {FORCE_SPAN_MS} ms -> savings bound: "
          f"{save_group:.2f} ms (grouped) / {save_row:.2f} ms (per-row floor)")

    # Glue lower bound: permuted-order copies of the B window planes.  The
    # fused force walk consumes 6 halo channels x 3 row-offsets; a cell
    # permutation makes each a data-dependent [row, 128] gather (~8 ns/row,
    # round-2 measured, protos era) + the inverse-permutation return of 2
    # velocity planes, twice (density walk needs 2 channels x 3).
    nrows = flat.shape[0]
    g_force = 6 * 3 * nrows * 8e-6  # ms
    g_dens = 2 * 3 * nrows * 8e-6
    g_back = 2 * nrows * 8e-6
    glue = g_force + g_dens + g_back
    print(f"glue lower bound (gathers @8ns/row): {glue:.2f} ms "
          f"({nrows} rows; force {g_force:.2f} + density {g_dens:.2f} + "
          f"return {g_back:.2f})")
    verdict = ("GO (savings clear glue)" if save_group > glue * 1.5
               else "NO-GO (savings do not clear the permutation glue)")
    print(f"\nVERDICT: {verdict}")


if __name__ == "__main__":
    main()
