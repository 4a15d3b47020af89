"""rust_particle_system_tpu — a TPU-native 2D SPH particle-simulation framework.

Built from scratch in JAX (jit / Pallas / shard_map) with the capabilities of the
Rust/wgpu reference simulator mabrams4/Rust-Particle-System (see SURVEY.md for the
structural analysis this build follows, and BASELINE.md for performance targets).

Layout:
    core/      params pytree, SoA particle state, SPH kernel math, initializers
    ops/       simulation steps: O(n²) oracle, spatial-grid pipeline, Pallas kernels
    models/    runnable model families (SPH fluid, flow-field, N-body, attractor)
    parallel/  multi-chip: mesh helpers, shard_map step, halo exchange, composite
    render/    point-splat rasterization to image tensors
    runtime/   scan driver, interactive-parameter loop, checkpointing, benchmarking
    utils/     shared helpers
"""

from .core.params import SimParams, make_params
from .core.state import ParticleState, make_state, scatter_init

__version__ = "0.1.0"

__all__ = [
    "SimParams",
    "make_params",
    "ParticleState",
    "make_state",
    "scatter_init",
    "__version__",
]
