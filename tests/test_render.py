"""Tests for the point-splat rasterizer."""

import jax.numpy as jnp
import numpy as np

from rust_particle_system_tpu.render import RenderSpec, splat, to_srgb_u8

BOUNDS = jnp.asarray([-96.0, 96.0, -54.0, 54.0], jnp.float32)


def _render(pos, color, size=3.0, spec=None, **kw):
    spec = spec or RenderSpec(width=192, height=108, max_radius_px=4)
    return np.asarray(
        splat(jnp.asarray(pos, jnp.float32), jnp.asarray(color, jnp.float32),
              jnp.float32(size), BOUNDS, spec, **kw)
    ), spec


def test_single_particle_center_pixel_full_color():
    img, spec = _render([[0.0, 0.0]], [[1.0, 0.0, 0.0, 1.0]])
    assert img.shape == (108, 192, 4)
    cy, cx = 54, 96  # world origin
    np.testing.assert_allclose(img[cy, cx], [1, 0, 0, 1], atol=1e-5)
    # far away stays background (black, alpha 1 over opaque bg)
    np.testing.assert_allclose(img[5, 5], [0, 0, 0, 1], atol=1e-6)


def test_sprite_radius_and_soft_edge():
    img, spec = _render([[0.0, 0.0]], [[1.0, 1.0, 1.0, 1.0]], size=3.0)
    cy, cx = 54, 96
    # pixel centres sit at +0.5: cx+1 is d=sqrt(1.5²+0.5²)≈1.58 < 0.8*3 → full
    assert img[cy, cx + 1, 0] > 0.99
    # cx+2 is d≈2.55, inside the soft edge (2.4..3.0) → partial
    assert 0.0 < img[cy, cx + 2, 0] < 1.0
    # cx+3 is d≈3.54 > r → nothing
    assert img[cy, cx + 3, 0] == 0.0


def test_overlapping_particles_blend_commutatively():
    a = [[0.0, 0.0], [1.0, 0.0]]
    cr = [[1.0, 0.0, 0.0, 1.0], [0.0, 0.0, 1.0, 1.0]]
    img_ab, _ = _render(a, cr)
    img_ba, _ = _render(a[::-1], cr[::-1])
    np.testing.assert_array_equal(img_ab, img_ba)  # order independence
    # overlap region mixes red and blue
    cy, cx = 54, 96
    assert img_ab[cy, cx, 0] > 0.1 and img_ab[cy, cx, 2] > 0.1


def test_offscreen_particles_clip_cleanly():
    img, _ = _render([[1e4, 1e4], [-1e4, 0.0]], [[1, 1, 1, 1], [1, 1, 1, 1]])
    np.testing.assert_allclose(img[..., :3].max(), 0.0)


def test_edge_particle_partial_stamp():
    # particle at the left edge: no wraparound to the right side
    img, spec = _render([[-96.0, 0.0]], [[0.0, 1.0, 0.0, 1.0]])
    assert img[54, 0, 1] > 0.0
    assert np.all(img[:, -8:, 1] == 0.0)


def test_to_srgb_u8_roundtrip_properties():
    img, _ = _render([[0.0, 0.0]], [[0.5, 0.5, 0.5, 1.0]])
    u8 = np.asarray(to_srgb_u8(jnp.asarray(img)))
    assert u8.dtype == np.uint8 and u8.shape == img.shape
    # mid-gray linear 0.5 -> srgb ~188
    assert abs(int(u8[54, 96, 0]) - 188) <= 2
    assert u8[54, 96, 3] == 255
