"""Flagship model: the 2D SPH fluid, capability-matching the whole reference app.

Bundles the reference's full per-frame pipeline (grid build -> density -> pressure +
viscosity -> integrate -> bounce -> colour, `src/particle_compute.rs:91-195`) plus its
render pass into the Model protocol.  Backend selection:

* ``backend="pallas"`` — Pallas force kernels over cell planes (production TPU path).
  By default the state is PLANE-RESIDENT (``ops/pallas/resident.PlaneState``):
  particles live in their cell slots across frames, re-binned each frame by one
  LOSSLESS local hole-fill kernel (``ops/pallas/rebin.py`` variant 5) instead of
  the full sort + gather + plane-build pipeline; renders feed the MXU rasterizer
  with no binning at all.  Movers that find no free destination slot are retained
  and force-deferred for the frame (the stream path's overflow contract) — no
  particle is ever dropped while stepping.  ``plane_resident=False`` falls back
  to the stream step (sorted-resident rows).
* ``backend="grid"``  — pure-JAX spatial-grid step (default; CPU-friendly)
* ``backend="oracle"`` — all-pairs O(n²) step (small n, exact spec)
"""

from __future__ import annotations

import dataclasses

import jax

from ..core.params import SimParams, make_params
from ..core.state import ParticleState, scatter_init
from ..ops.grid import GridSpec, suggest_capacity
from ..ops.grid_step import grid_step
from ..ops.reference_step import reference_step
from ..render import RenderSpec, splat


@dataclasses.dataclass(frozen=True)
class SPHFluid:
    grid: GridSpec | None
    render_spec: RenderSpec
    bounds: tuple
    backend: str = "grid"
    chunk_cells: int = 256
    # Pallas backend only: carry state in cell planes across frames (the
    # production configuration — no per-frame sort; see ops/pallas/resident.py).
    plane_resident: bool = True

    @classmethod
    def create(
        cls,
        n: int = 50_000,
        bounds=(-960.0, 960.0, -540.0, 540.0),
        cell_size: float | None = None,
        capacity: int | None = None,
        backend: str = "auto",
        render_spec: RenderSpec | None = None,
        capacity_safety: float = 16.0,
        pack2: bool = False,
        plane_resident: bool = True,
    ) -> "SPHFluid":
        if backend == "auto":
            # Pallas force kernels on TPU; the pure-JAX grid path elsewhere.
            import jax

            backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "grid"
        params = make_params(bounds=bounds)
        if cell_size is None:
            # grid cell size = smoothing radius, as the reference ties them (main.rs:88)
            cell_size = float(params.smoothing_radius)
        grid = None
        if backend == "grid":
            if capacity is None:
                capacity = suggest_capacity(n, bounds, cell_size, safety=capacity_safety)
            grid = GridSpec.from_bounds(bounds, cell_size, capacity)
        elif backend == "pallas":
            # Default: the settle-SAFE layout — aspect-1 cells with the full
            # 128-slot lane tile.  Under the default params, gravity settles the
            # fluid into pools of ~101 particles per 9x9 cell (measured at
            # equilibrium, independent of n), which overflows both the 64-slot
            # pair-packed layout and any widened (aspect > 1) cell.  Overflow is
            # worse than slow: overflowing particles lose pressure forces,
            # free-fall, and densify the pile further (a feedback loop — a 50k
            # run reached 12.6k dropped particles on the old pack2 default).
            #
            # The ~2x-faster pair-packed layout (two cells per lane row, 6
            # neighbor offsets — ops/pallas/sph.py) is an explicit opt-in via
            # ``capacity=64, pack2=True`` for regimes whose density profile
            # provably stays under 64/cell (low gravity, short horizons, tuned
            # target_density).  bench.py's uniform 20-frame headline is one.
            if capacity is None:
                grid = GridSpec.from_bounds(bounds, cell_size, 128)
            else:
                grid = GridSpec.from_bounds(bounds, cell_size, capacity,
                                            pack2=pack2)
        return cls(
            grid=grid,
            render_spec=render_spec or RenderSpec(),
            bounds=tuple(float(b) for b in bounds),
            backend=backend,
            plane_resident=bool(plane_resident),
        )

    @property
    def scan_frames(self) -> bool:
        """Host-loop the Pallas backend: same warm throughput as scan, but no
        per-num_frames recompile (see Simulation.run)."""
        return self.backend != "pallas"

    def default_params(self) -> SimParams:
        return make_params(bounds=self.bounds)

    def init(self, key: jax.Array, n: int):
        state = scatter_init(key, n, self.bounds)
        if self.backend == "pallas":
            if self.plane_resident:
                # Production state: cell planes carried across frames; ONE initial
                # binning here is the only sort the simulation ever runs.
                from ..ops.pallas.resident import plane_state_from_particles

                return plane_state_from_particles(state, self.grid)
            # Stream fallback: sorted-resident rows + an ids identity column.
            state = state.with_ids()
        return state

    def step(self, state, params: SimParams):
        if self.backend == "pallas":
            from ..ops.pallas.resident import PlaneState, plane_step
            from ..ops.pallas.sph_step import sph_step_pallas

            if isinstance(state, PlaneState):
                return plane_step(state, params, self.grid)
            return sph_step_pallas(state, params, self.grid,
                                   resident=state.ids is not None)
        if self.backend == "grid":
            return grid_step(state, params, self.grid, self.chunk_cells)
        return reference_step(state, params)

    def render(self, state: ParticleState, params: SimParams, camera=None):
        """Render the state; ``camera`` is a traced (cx, cy, zoom) pan/zoom triple —
        the per-frame view_proj analog (src/particle_buffers.rs:220-236).

        The pallas backend renders through the cell-plane patch rasterizer when the
        camera is the identity (its patch grid is tied to the sim cells) AND the
        geometry meets the plane rasterizer's static preconditions (integral pixel
        strides, stride >= 2*margin, radius <= margin); any other camera or
        geometry falls back to the general splat."""
        from ..ops.pallas.resident import PlaneState

        if self.backend == "pallas" and camera is None and self.grid is not None:
            from ..ops.pallas.sph_step import render_state_planes
            from ..render.splat_planes import MARGIN, planes_compatible

            margin = min(MARGIN, self.render_spec.max_radius_px)
            if planes_compatible(self.grid, self.render_spec, self.bounds, margin):
                if isinstance(state, PlaneState):
                    # Plane-resident render: NO binning at all — the planes feed
                    # the MXU patch rasterizer directly.
                    from ..ops.pallas.resident import render_plane_state

                    return render_plane_state(
                        state, params, self.grid, self.render_spec,
                        bounds_static=self.bounds,
                    )
                return render_state_planes(
                    state, params, self.grid, self.render_spec,
                    bounds_static=self.bounds,
                )
        if isinstance(state, PlaneState):
            state = state.to_particle_state(params)
        return splat(
            state.pos, state.color, params.particle_size, params.bounds,
            self.render_spec, camera=camera,
        )

    def step_and_render(self, state: ParticleState, params: SimParams):
        """Fused frame: physics + image in one program (pallas backend only).

        Reuses the step's cell binning for the rasterizer, so the render adds no
        sort/gather work — see render/splat_planes.py.  Returns (state, image).
        """
        if self.backend != "pallas":
            new_state = self.step(state, params)
            return new_state, self.render(new_state, params)
        from ..ops.pallas.resident import PlaneState, plane_frame
        from ..ops.pallas.sph_step import sph_frame_pallas

        if isinstance(state, PlaneState):
            return plane_frame(state, params, self.grid, self.render_spec,
                               bounds_static=self.bounds)
        return sph_frame_pallas(
            state, params, self.grid, self.render_spec, bounds_static=self.bounds,
            resident=state.ids is not None,
        )
