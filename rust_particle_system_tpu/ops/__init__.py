from .reference_step import reference_step

__all__ = ["reference_step"]
