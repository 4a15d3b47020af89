"""Phase split of the reference-default scene (50k scatter) + a settled 1M state.

Question: where does the 50k frame's 25.6 ms go?  The plane pipeline's rebin and
splat run over every grid cell regardless of occupancy, so a small scene pays the
full-grid floor.  This probe measures, on-chip, the per-phase cost of (a) the 50k
scatter-init state (reference default, `/root/reference/src/main.rs:25,182-216`)
and (b) a 1M state settled for 240 frames (pool at the bottom; most rows air) —
the two states where an air-row skip in the rebin kernel would pay.

Protocol: in-jit xR repetition over jostled inputs with checksum outputs
(runtime/timing.py rules: memoization, non-blocking block_until_ready, ~26 ms RPC).

RESULTS (TPU v5 lite0, R=32, 2026-08-21, this file; "before" = pre-gating):
  50k scatter  : rebin 4.04  forces 12.63  splat 5.30   (fused frame 25.63)
  1M settled   : rebin 4.04  forces 17.43  splat 5.27   (240 settle frames)
  -> the REBIN was exactly grid-bound (4.04 ms at 5% and at 100% occupancy —
     its row programs had no occupancy gating); the force walks' chunk
     gating tracks live cells (12.6 ms at 50k: the scatter band keeps ~55%
     of chunk-windows live across all columns); the splat's group gating
     already captures its share (6.69 uniform -> 5.3).  Consequences:
     (a) a smaller capacity is NOT safe (the rest pool saturates C=64 —
     protos/occupancy_settled.py); (b) an air-WINDOW row skip in the rebin
     kernel was the one phase with no gating at all.

AFTER shipping the skip (rebin.py _make_kernel_v6 air-window branch):
  50k scatter  : rebin 4.06  forces 12.48  splat 5.28   (no live-row change —
                 a fresh normal scatter leaves no row fully empty)
  1M settled@240: rebin 3.96 (splashing keeps ~109/121 rows live at this
                 settle depth; the bench's 238-frame C=128 row gained 2.9 ms)
  50k settled@900: rebin 1.67  forces 2.29  splat 2.26  (7 live rows; the
                 steady-state fused frame dropped 25.6 -> 10.96 ms = 91 fps,
                 bench ref50k_settled row)
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL, rebin_planes
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
    plane_step,
    render_plane_state,
)
from rust_particle_system_tpu.ops.pallas.sph_step import _forces_from_cells
from rust_particle_system_tpu.render import RenderSpec
from rust_particle_system_tpu.runtime.timing import hsync

BOUNDS = (-960.0, 960.0, -540.0, 540.0)
R = 32
NB = 4

spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1, pack2=True)
params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
rspec = RenderSpec(width=1920, height=1080, max_radius_px=2)
rparams = params._replace(particle_size=jnp.float32(2.0))
interp = jax.default_backend() not in ("tpu", "axon")
dt = params.dt


def phase_split(label, mk_state):
    pss = [mk_state(i) for i in range(NB)]
    px8 = jnp.stack([ps.px for ps in pss])
    py8 = jnp.stack([ps.py for ps in pss])
    vx8 = jnp.stack([ps.vx for ps in pss])
    vy8 = jnp.stack([ps.vy for ps in pss])
    id8 = jnp.stack([ps.idsf for ps in pss])

    def predicted(i, base):
        b = i % NB
        eps = 0.003 * jnp.float32(i // NB) + base
        live = px8[b] < 0.5 * SENTINEL
        vx = jnp.where(live, vx8[b], 0.0)
        vy = jnp.where(live, vy8[b] - params.gravity * dt, 0.0)
        predx = jnp.where(live, px8[b] + eps + vx * dt, SENTINEL)
        predy = jnp.where(live, py8[b] + eps + vy * dt, SENTINEL)
        return predx, predy, vx, vy, b

    def upto_rebin(base):
        def body(i, acc):
            predx, predy, vx, vy, b = predicted(i, base)
            planes, _ = rebin_planes([predx, predy, vx, vy, id8[b]], spec,
                                     interpret=interp, variant=6)
            return acc + jnp.sum(planes[0][::32, ::32, 0])
        return body

    def upto_forces(base):
        def body(i, acc):
            predx, predy, vx, vy, b = predicted(i, base)
            planes, _ = rebin_planes([predx, predy, vx, vy, id8[b]], spec,
                                     interpret=interp, variant=6)
            nvx, _ = _forces_from_cells(planes[0], planes[1], planes[2],
                                        planes[3], spec, params, interp)
            return acc + jnp.sum(nvx[::16, ::16, 0])
        return body

    def splat_only(base):
        ps0 = pss[0]
        live = ps0.px < 0.5 * SENTINEL

        def body(i, acc):
            import dataclasses as dc
            eps = 0.003 * jnp.float32(i) + base
            psr = dc.replace(ps0,
                             px=jnp.where(live, ps0.px + eps, SENTINEL),
                             py=jnp.where(live, ps0.py + eps, SENTINEL))
            img = render_plane_state(psr, rparams, spec, rspec,
                                     bounds_static=BOUNDS)
            return acc + jnp.sum(img[::64, ::64, 0])
        return body

    def timed(mk_body):
        fn = jax.jit(lambda base: jax.lax.fori_loop(
            0, R, mk_body(base), jnp.float32(0)))
        hsync(fn(jnp.float32(0.0)))
        t0 = time.perf_counter()
        hsync(fn(jnp.float32(0.0101)))
        return (time.perf_counter() - t0) / R * 1e3

    t_rebin = timed(upto_rebin)
    t_forces = timed(upto_forces)
    t_splat = timed(splat_only)
    print(f"{label}: rebin {t_rebin:.2f}  forces {t_forces - t_rebin:.2f}  "
          f"splat {t_splat:.2f}", flush=True)


def mk50k(i):
    st = rps.scatter_init(jax.random.key(800 + i), 50_000, BOUNDS)
    return plane_state_from_particles(st.with_ids(), spec)


_settled_cache = {}


def mk1m_settled(i):
    if i not in _settled_cache:
        kx, ky = jax.random.split(jax.random.key(900 + i))
        pos = jnp.stack(
            [jax.random.uniform(kx, (1_000_000,), minval=BOUNDS[0], maxval=BOUNDS[1]),
             jax.random.uniform(ky, (1_000_000,), minval=BOUNDS[2], maxval=BOUNDS[3])],
            axis=-1)
        from rust_particle_system_tpu.core.state import make_state
        ps = plane_state_from_particles(make_state(pos).with_ids(), spec)
        sph = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
        for _ in range(240):
            ps = sph(ps)
        hsync(ps.px)
        _settled_cache[i] = ps
    return _settled_cache[i]


_settled50_cache = {}


def mk50k_settled(i):
    """900-frame-settled 50k pool: 7 live rows of 121 (occupancy_settled.py) —
    the state the rebin air-window skip exists for."""
    if i not in _settled50_cache:
        ps = mk50k(i)
        sph = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
        for _ in range(900):
            ps = sph(ps)
        hsync(ps.px)
        _settled50_cache[i] = ps
    return _settled50_cache[i]


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "50k"):
        phase_split("50k scatter ", mk50k)
    if which in ("all", "1m"):
        phase_split("1M settled  ", mk1m_settled)
    if which in ("all", "50ks"):
        phase_split("50k settled ", mk50k_settled)
