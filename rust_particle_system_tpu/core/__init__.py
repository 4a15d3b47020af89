from .params import SimParams, make_params, with_smoothing_radius, kernel_norms
from .state import ParticleState, make_state, scatter_init
from . import kernels

__all__ = [
    "SimParams",
    "make_params",
    "with_smoothing_radius",
    "kernel_norms",
    "ParticleState",
    "make_state",
    "scatter_init",
    "kernels",
]
