from .splat_jax import (
    RenderSpec,
    splat,
    splat_accumulate,
    splat_resolve,
    to_srgb_u8,
    world_to_pixel,
)

__all__ = [
    "RenderSpec",
    "splat",
    "splat_accumulate",
    "splat_resolve",
    "to_srgb_u8",
    "world_to_pixel",
]
