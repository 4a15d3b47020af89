"""Independent NumPy implementation of the bulk-synchronous SPH step.

Deliberately written loop-style (per particle, per neighbor) straight from the WGSL
source (`/root/reference/assets/compute_shader.wgsl`) so that broadcasting mistakes in
the JAX implementations can't hide.  Used only by tests.
"""

from __future__ import annotations

import math

import numpy as np

PI = math.pi


class Params:
    def __init__(
        self,
        smoothing_radius=9.0,
        max_energy=2000.0,
        damping_factor=0.1,
        dt=0.01,
        gravity=0.0,
        target_density=0.011,
        pressure_multiplier=10000.0,
        viscosity_strength=5.0,
        near_density_multiplier=1000.0,
        bounds=(-960.0, 960.0, -540.0, 540.0),
        shader_delay=5,
    ):
        h = smoothing_radius
        self.h = h
        self.max_energy = max_energy
        self.damping = damping_factor
        self.dt = dt
        self.gravity = gravity
        self.target_density = target_density
        self.pressure_multiplier = pressure_multiplier
        self.viscosity_strength = viscosity_strength
        self.near_density_multiplier = near_density_multiplier
        self.bounds = bounds
        self.shader_delay = shader_delay
        self.dn = 10.0 / (PI * h**5)
        self.nn = 15.0 / (PI * h**6)
        self.vn = 4.0 / (PI * h**8)


def density_kernel(d, p):
    if d >= p.h:
        return 0.0
    v = p.h - d
    return p.dn * v * v


def density_kernel_derivative(d, p):
    if d >= p.h:
        return 0.0
    return -2.0 * p.dn * (p.h - d)


def near_density_kernel(d, p):
    if d >= p.h:
        return 0.0
    v = p.h - d
    return p.nn * v * v * v


def near_density_kernel_derivative(d, p):
    if d >= p.h:
        return 0.0
    v = p.h - d
    return -3.0 * p.nn * v * v


def viscosity_kernel(d, p):
    if d >= p.h:
        return 0.0
    v = p.h * p.h - d * d
    return p.vn * v * v * v


def step(pos, vel, p: Params, frame: int):
    """One bulk-synchronous frame.  Returns (pos, vel, color)."""
    pos = np.array(pos, dtype=np.float64)
    vel = np.array(vel, dtype=np.float64)
    n = len(pos)

    if frame < p.shader_delay:
        color = np.full((n, 4), np.nan)  # NaN sentinel: color unspecified in warm-up
        return pos, vel, color

    # gravity + predicted positions
    vel = vel + np.array([0.0, -p.gravity]) * p.dt
    pred = pos + vel * p.dt

    # density (self included)
    density = np.zeros(n)
    near_density = np.zeros(n)
    for i in range(n):
        for j in range(n):
            d2 = np.sum((pred[i] - pred[j]) ** 2)
            if d2 > p.h * p.h:
                continue
            d = math.sqrt(d2)
            density[i] += density_kernel(d, p)
            near_density[i] += near_density_kernel(d, p)

    pressure = (density - p.target_density) * p.pressure_multiplier
    near_pressure = near_density * p.near_density_multiplier

    # pressure force (self excluded) + viscosity over PRE-pressure velocities
    # (spec v2, see ops/reference_step.py): one barrier applies both forces.
    new_vel = vel.copy()
    for i in range(n):
        force = np.zeros(2)
        for j in range(n):
            if j == i:
                continue
            delta = pred[j] - pred[i]
            d2 = np.sum(delta**2)
            if d2 > p.h * p.h:
                continue
            d = math.sqrt(d2)
            if d > 1e-4:
                direction = delta / d
            else:
                direction = np.array([0.0, 1.0])
            pressure_term = pressure[i] / (density[i] ** 2) + pressure[j] / (
                density[j] ** 2
            )
            # reference quirk: ρ_j * ρnear_j denominator
            near_term = near_pressure[i] / (density[i] ** 2) + near_pressure[j] / (
                density[j] * near_density[j]
            )
            force = force + direction * pressure_term * density_kernel_derivative(d, p)
            force = force + direction * near_term * near_density_kernel_derivative(d, p)

        visc = np.zeros(2)
        for j in range(n):
            if j == i:
                continue
            delta = pred[i] - pred[j]
            d2 = np.sum(delta**2)
            if d2 > p.h * p.h:
                continue
            d = math.sqrt(d2)
            visc = visc + (vel[j] - vel[i]) * viscosity_kernel(d, p)

        new_vel[i] = vel[i] + force * p.dt + visc * p.viscosity_strength * p.dt
    vel = new_vel

    # integrate + bounce + colour
    pos = pos + vel * p.dt
    x_min, x_max, y_min, y_max = p.bounds
    color = np.zeros((n, 4))
    for i in range(n):
        if pos[i, 0] <= x_min:
            pos[i, 0] = x_min
            vel[i, 0] = abs(vel[i, 0]) * p.damping
        elif pos[i, 0] >= x_max:
            pos[i, 0] = x_max
            vel[i, 0] = -abs(vel[i, 0]) * p.damping
        if pos[i, 1] <= y_min:
            pos[i, 1] = y_min
            vel[i, 1] = abs(vel[i, 1]) * p.damping
        elif pos[i, 1] >= y_max:
            pos[i, 1] = y_max
            vel[i, 1] = -abs(vel[i, 1]) * p.damping

        energy = 0.5 * np.sum(vel[i] ** 2)
        t = min(max(energy / p.max_energy, 0.0), 1.0)
        if t < 0.5:
            s = t * 2.0
            rgb = (1 - s) * np.array([0.0, 0.0, 1.0]) + s * np.array([0.0, 1.0, 0.0])
        else:
            s = (t - 0.5) * 2.0
            rgb = (1 - s) * np.array([0.0, 1.0, 0.0]) + s * np.array([1.0, 0.0, 0.0])
        color[i] = [rgb[0], rgb[1], rgb[2], 1.0]

    return pos, vel, color
