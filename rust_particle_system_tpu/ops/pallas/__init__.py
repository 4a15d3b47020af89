"""Pallas TPU kernels — the native-kernel tier (SURVEY.md §2.2).

These are the TPU equivalents of the reference's WGSL compute/render shaders.  Each has
a pure-JAX twin elsewhere in ``ops``/``render`` that serves as its parity oracle; on
non-TPU backends the kernels run in interpreter mode so the full test suite stays
hardware-independent.
"""

from .nbody import nbody_accel_pallas
from .sph import density_cells_pallas, force_cells_pallas
from .sph_step import sph_frame_pallas, sph_physics_pallas, sph_step_pallas

__all__ = [
    "nbody_accel_pallas",
    "density_cells_pallas",
    "force_cells_pallas",
    "sph_frame_pallas",
    "sph_physics_pallas",
    "sph_step_pallas",
]
