from .splat_jax import RenderSpec, splat, to_srgb_u8, world_to_pixel

__all__ = ["RenderSpec", "splat", "to_srgb_u8", "world_to_pixel"]
