"""SPH smoothing-kernel math, pressure maps, bounce and colour ramp — pure functions.

These are exact functional re-statements of the WGSL helpers in
``assets/compute_shader.wgsl``:

* kernels + derivatives           — compute_shader.wgsl:145-188
* density→pressure maps           — compute_shader.wgsl:191-199
* boundary clamp + damped bounce  — compute_shader.wgsl:69-99
* kinetic-energy colour ramp      — compute_shader.wgsl:101-118

All functions are element-wise over arbitrary-shaped distance arrays and close over
nothing: parameters come in explicitly, so the same code runs under jit, vmap, inside
Pallas kernel bodies, and in the NumPy-oracle tests.
"""

from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------------------------------
# Smoothing kernels (compute_shader.wgsl:145-188).  Each returns 0 for d >= h.
# --------------------------------------------------------------------------------------

def density_kernel(d, h, norm):
    """``norm * (h - d)^2`` inside the radius (compute_shader.wgsl:145-152)."""
    v = h - d
    return jnp.where(d < h, norm * v * v, 0.0)


def density_kernel_derivative(d, h, norm):
    """``-2 * norm * (h - d)`` inside the radius (compute_shader.wgsl:154-161)."""
    v = h - d
    return jnp.where(d < h, -2.0 * norm * v, 0.0)


def near_density_kernel(d, h, norm):
    """``norm * (h - d)^3`` inside the radius (compute_shader.wgsl:163-170)."""
    v = h - d
    return jnp.where(d < h, norm * v * v * v, 0.0)


def near_density_kernel_derivative(d, h, norm):
    """``-3 * norm * (h - d)^2`` inside the radius (compute_shader.wgsl:172-179)."""
    v = h - d
    return jnp.where(d < h, -3.0 * norm * v * v, 0.0)


def viscosity_kernel(d, h, norm):
    """``norm * (h^2 - d^2)^3`` inside the radius (compute_shader.wgsl:181-188)."""
    v = h * h - d * d
    return jnp.where(d < h, norm * v * v * v, 0.0)


# --------------------------------------------------------------------------------------
# Pressure maps (compute_shader.wgsl:191-199).
# --------------------------------------------------------------------------------------

def density_to_pressure(density, target_density, pressure_multiplier):
    return (density - target_density) * pressure_multiplier


def density_to_near_pressure(near_density, near_density_multiplier):
    return near_density * near_density_multiplier


# --------------------------------------------------------------------------------------
# Boundary bounce (compute_shader.wgsl:69-99).
# --------------------------------------------------------------------------------------

def bounce_bounds(pos, vel, bounds, damping_factor):
    """Clamp positions to the screen bounds and reflect+damp velocity.

    Mirrors check_screen_bounds exactly: at/below x_min the x-velocity is forced
    positive via ``abs`` and scaled by the damping factor (even if it already pointed
    inward); symmetric for the other three walls.  Only the violating axis is damped
    (compute_shader.wgsl:80-95).
    """
    x_min, x_max, y_min, y_max = bounds[0], bounds[1], bounds[2], bounds[3]
    x, y = pos[..., 0], pos[..., 1]
    vx, vy = vel[..., 0], vel[..., 1]

    vx = jnp.where(x <= x_min, jnp.abs(vx) * damping_factor, vx)
    vx = jnp.where(x >= x_max, -jnp.abs(vx) * damping_factor, vx)
    x = jnp.clip(x, x_min, x_max)

    vy = jnp.where(y <= y_min, jnp.abs(vy) * damping_factor, vy)
    vy = jnp.where(y >= y_max, -jnp.abs(vy) * damping_factor, vy)
    y = jnp.clip(y, y_min, y_max)

    return jnp.stack([x, y], axis=-1), jnp.stack([vx, vy], axis=-1)


# --------------------------------------------------------------------------------------
# Kinetic-energy colour ramp (compute_shader.wgsl:101-118).
# --------------------------------------------------------------------------------------

def energy_color(vel, max_energy):
    """Blue→green→red ramp on kinetic energy ``0.5 * |v|^2`` (unit mass), alpha 1."""
    speed_sq = jnp.sum(vel * vel, axis=-1)
    energy = 0.5 * speed_sq
    t = jnp.clip(energy / max_energy, 0.0, 1.0)

    lo = t * 2.0  # blue → green on [0, 0.5)
    hi = (t - 0.5) * 2.0  # green → red on [0.5, 1]
    r = jnp.where(t < 0.5, 0.0, hi)
    g = jnp.where(t < 0.5, lo, 1.0 - hi)
    b = jnp.where(t < 0.5, 1.0 - lo, 0.0)
    return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)
