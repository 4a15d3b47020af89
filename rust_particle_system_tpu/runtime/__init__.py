from . import checkpoint
from .simulation import Simulation, run_frames, run_frames_loop, run_frames_trajectory

__all__ = [
    "Simulation",
    "run_frames",
    "run_frames_loop",
    "run_frames_trajectory",
    "checkpoint",
]
