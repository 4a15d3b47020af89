"""ctypes bindings for the native C++ host engine (see sph_engine.cpp).

The shared library is built on demand with the system compiler (no pybind11 — the
C ABI + ctypes keeps the binding dependency-free).  All entry points raise
``NativeUnavailableError`` if no C++ toolchain exists, so the pure-JAX framework never
hard-depends on the native tier.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sph_engine.cpp")
_LIB = os.path.join(_HERE, "libsph_engine.so")

_lock = threading.Lock()
_lib = None


class NativeUnavailableError(RuntimeError):
    pass


class _SphParams(ctypes.Structure):
    _fields_ = [
        ("smoothing_radius", ctypes.c_float),
        ("max_energy", ctypes.c_float),
        ("damping_factor", ctypes.c_float),
        ("dt", ctypes.c_float),
        ("gravity", ctypes.c_float),
        ("target_density", ctypes.c_float),
        ("pressure_multiplier", ctypes.c_float),
        ("viscosity_strength", ctypes.c_float),
        ("near_density_multiplier", ctypes.c_float),
        ("x_min", ctypes.c_float),
        ("x_max", ctypes.c_float),
        ("y_min", ctypes.c_float),
        ("y_max", ctypes.c_float),
        ("density_norm", ctypes.c_float),
        ("near_density_norm", ctypes.c_float),
        ("viscosity_norm", ctypes.c_float),
    ]


def _build() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailableError(f"building sph_engine failed: {detail}") from e


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.sph_step.restype = ctypes.c_int
        lib.sph_step.argtypes = [
            ctypes.POINTER(_SphParams),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.state_save.restype = ctypes.c_int
        lib.state_save.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.state_load.restype = ctypes.c_int64
        lib.state_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return lib


def _params_struct(params) -> _SphParams:
    b = np.asarray(params.bounds, np.float32)
    return _SphParams(
        smoothing_radius=float(params.smoothing_radius),
        max_energy=float(params.max_energy),
        damping_factor=float(params.damping_factor),
        dt=float(params.dt),
        gravity=float(params.gravity),
        target_density=float(params.target_density),
        pressure_multiplier=float(params.pressure_multiplier),
        viscosity_strength=float(params.viscosity_strength),
        near_density_multiplier=float(params.near_density_multiplier),
        x_min=float(b[0]), x_max=float(b[1]), y_min=float(b[2]), y_max=float(b[3]),
        density_norm=float(params.density_kernel_norm),
        near_density_norm=float(params.near_density_kernel_norm),
        viscosity_norm=float(params.viscosity_kernel_norm),
    )


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_sph_step(pos, vel, params):
    """One bulk-synchronous SPH frame on the CPU (C++ grid engine).

    pos/vel: [n, 2] float32 arrays (copied).  Returns (pos, vel, color) float32.
    """
    lib = _load()
    # np.array(copy=True): the engine steps pos/vel IN PLACE, and
    # ascontiguousarray would alias an already-contiguous f32 input — the
    # caller's arrays must never be mutated (found as a test-oracle corruption:
    # downstream consumers of the same arrays saw the stepped state).
    pos = np.array(pos, np.float32, order="C", copy=True)
    vel = np.array(vel, np.float32, order="C", copy=True)
    n = pos.shape[0]
    color = np.zeros((n, 4), np.float32)
    p = _params_struct(params)
    rc = lib.sph_step(ctypes.byref(p), n, _fp(pos), _fp(vel), _fp(color))
    if rc != 0:
        raise RuntimeError(f"sph_step failed: {rc}")
    return pos, vel, color


def native_state_save(path: str, pos, vel, color) -> None:
    """CRC-protected binary state save (atomicity is the caller's concern)."""
    lib = _load()
    pos = np.ascontiguousarray(np.asarray(pos, np.float32))
    vel = np.ascontiguousarray(np.asarray(vel, np.float32))
    color = np.ascontiguousarray(np.asarray(color, np.float32))
    rc = lib.state_save(path.encode(), pos.shape[0], _fp(pos), _fp(vel), _fp(color))
    if rc != 0:
        raise RuntimeError(f"state_save failed: {rc}")


def native_state_load(path: str):
    """Load a state file written by native_state_save; verifies CRC."""
    lib = _load()
    n = lib.state_load(path.encode(), 0, None, None, None)
    if n < 0:
        raise RuntimeError(f"state_load failed: {n}")
    pos = np.zeros((n, 2), np.float32)
    vel = np.zeros((n, 2), np.float32)
    color = np.zeros((n, 4), np.float32)
    rc = lib.state_load(path.encode(), n, _fp(pos), _fp(vel), _fp(color))
    if rc != n:
        raise RuntimeError(f"state_load failed: {rc}")
    return pos, vel, color
