"""Headline benchmark: particle-steps/sec/chip on the flagship SPH model (Pallas path).

Prints ONE JSON line:
    {"metric": "particle_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e9, ...extra fields...}

``vs_baseline`` measures against the BASELINE.md north-star target of 1e9
particle-steps/sec/chip at 1M particles (the reference publishes no numbers of its
own — see BASELINE.md).  The headline runs the PLANE-RESIDENT production pipeline
(ops/pallas/resident.py): state lives in cell planes, one lossless hole-fill rebin
per frame, no sort after the initial binning.

STALL-PROOF PROTOCOL (round 4, after BENCH_r03 timed out with zero output):
the result dict is built INCREMENTALLY, every section runs under a wall-clock
budget enforced by SIGALRM, a global deadline (RPS_BENCH_DEADLINE_S, default
1000 s) skips whatever remains, and the ONE JSON line is printed from a
``finally`` block — so a stall or crash in any late section still emits every
number already measured.  SIGTERM (what ``timeout`` sends) also triggers the
emit, so even a driver-side timeout leaves the JSON in the output tail.
Cold-compile-heavy comparison rows (pipeline-variant candidates, v1 splat
fallback, margin-4 fused patch, raw-positions splat) only run under
RPS_BENCH_FULL=1 — each costs a fresh Mosaic compile which under CPU
contention turns ~30 s into many minutes (BASELINE.md toolchain note), which
is exactly how BENCH_r03 died.

Measurement notes (hard-won; see runtime/timing.py): this runtime memoizes
identical-input executions, its block_until_ready can return before completion
(only device->host pulls are true barriers), and every host RPC costs ~10s of
ms — so the chained frame loop ends in ONE host pull, and all unchained
measurements (phases, splat) run as in-jit repetition loops over distinct
inputs with checksum outputs.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time


def _progress(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


import jax

# Persistent compilation cache: cold Mosaic+XLA compiles of the 1M-shape
# pipeline take MINUTES on this 1-core host (BENCH_r03 died to exactly this).
# With the cache populated (any earlier bench run this round), every section
# compiles in seconds.  Absolute path: the driver may run from any cwd.
if os.environ.get("RPS_BENCH_NO_CACHE") != "1":
    _CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass

import jax.numpy as jnp

import rust_particle_system_tpu as rps
from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.models.flow_field import flow_step, make_flow_params
from rust_particle_system_tpu.ops.grid import GridSpec, build_grid
from rust_particle_system_tpu.ops.pallas.sph_step import (
    _forces_from_cells,
    sph_step_pallas,
)
from rust_particle_system_tpu.render import RenderSpec

N = 1_000_000
FRAMES = 40
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
CELL_SIZE = 9.0
# In-jit repetition count for unchained kernels.  Each hsync'd dispatch carries a
# fixed ~26 ms RPC round-trip on this runtime (measured, protos/time_splat4.py /
# time_rebin_v5split.py): R=4 biases a 10 ms kernel by +6.5 ms/iter; R=32 bounds
# the bias at ~0.8 ms.  Iterations jostle the inputs by an i-dependent epsilon so
# XLA cannot hoist the body out of the fori_loop.
R_INJIT = 32
SETTLE_FRAMES = 238  # C=128 row: frames of gravity settling before timing
FLOW_FRAMES = 100
FUSED_REPS = 31
RENDER_WH = (1920, 1080)

FULL = os.environ.get("RPS_BENCH_FULL") == "1"

# Smoke mode (RPS_BENCH_SMOKE=1): tiny shapes that run the SAME code paths in
# interpret-mode Pallas on CPU — validates the bench end-to-end without the chip.
# Numbers printed in this mode are meaningless; it exists to catch protocol bugs.
SMOKE = os.environ.get("RPS_BENCH_SMOKE") == "1"
if SMOKE:
    # The axon plugin overrides jax_platforms at interpreter startup (env vars
    # lose); force CPU the way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
    N = 4096
    FRAMES = 3
    BOUNDS = (-144.0, 144.0, -72.0, 72.0)  # 32x16 cells at cell_size 9
    R_INJIT = 2
    SETTLE_FRAMES = 2
    FLOW_FRAMES = 5
    FUSED_REPS = 2
    RENDER_WH = (288, 144)  # keeps the 1-world-unit-per-pixel integral stride

# ---------------------------------------------------------------------------
# Stall-proofing machinery.
# ---------------------------------------------------------------------------

RESULTS: dict = {
    "metric": "particle_steps_per_sec_per_chip",
    "value": 0.0,
    "unit": "steps/s",
    "vs_baseline": 0.0,
    "n_particles": N,
    "frames": FRAMES,
    "sections": {},
}
_EMITTED = False


def emit() -> None:
    """Print the ONE JSON line exactly once.  Called from the normal exit path,
    from ``finally`` on any crash, and from the SIGTERM handler."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(RESULTS), flush=True)


class SectionTimeout(Exception):
    pass


_DEADLINE = time.monotonic() + float(os.environ.get("RPS_BENCH_DEADLINE_S", "1000"))


def run_section(name: str, budget_s: float, fn, _retry: bool = True) -> bool:
    """Run ``fn`` (which writes its fields into RESULTS) under a SIGALRM
    wall-clock budget, clipped to the global deadline.  Any timeout or exception
    is recorded in RESULTS["sections"] and the bench moves on — a stalled Mosaic
    compile in one section can no longer forfeit the numbers of the others.
    Transient tunnel errors (the remote-compile HTTP channel drops mid-response
    now and then) get ONE retry."""
    remaining = _DEADLINE - time.monotonic()
    if remaining <= 5:
        RESULTS["sections"][name] = "skipped_deadline"
        _progress(f"{name}: skipped (global deadline)")
        return False
    budget = min(budget_s, remaining)
    _progress(f"{name} (budget {budget:.0f}s)...")

    def _on_alarm(signum, frame):
        raise SectionTimeout()

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.setitimer(signal.ITIMER_REAL, budget)
    t0 = time.monotonic()
    try:
        fn()
        RESULTS["sections"][name] = round(time.monotonic() - t0, 1)
        return True
    except SectionTimeout:
        RESULTS["sections"][name] = f"timeout@{budget:.0f}s"
        _progress(f"{name}: TIMED OUT after {budget:.0f}s")
        return False
    except Exception as e:  # noqa: BLE001 — record, never break the bench
        msg = f"{type(e).__name__}: {e}"
        transient = any(s in msg for s in
                        ("remote_compile", "read body", "UNAVAILABLE",
                         "DEADLINE_EXCEEDED", "Socket closed"))
        if _retry and transient:
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, old)
            _progress(f"{name}: transient failure, retrying ({msg[:120]})")
            # Retry on the REMAINING budget, not a fresh one — a section must
            # never consume ~2x its stated budget (it would eat the headroom
            # the late 16M section depends on).
            left = budget - (time.monotonic() - t0)
            return run_section(name, max(5.0, left), fn, _retry=False)
        RESULTS["sections"][name] = f"failed: {msg}"[:300]
        _progress(f"{name}: FAILED ({msg})")
        return False
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def _on_sigterm(signum, frame):
    RESULTS["sections"]["_sigterm"] = "received"
    emit()
    # 143 = conventional SIGTERM exit; the JSON is already on stdout.
    os._exit(143)


signal.signal(signal.SIGTERM, _on_sigterm)

# ---------------------------------------------------------------------------
# Measurement bodies (unchanged protocol from round 3).
# ---------------------------------------------------------------------------


def uniform_init(key, n, bounds):
    x_min, x_max, y_min, y_max = bounds
    kx, ky = jax.random.split(key)
    pos = jnp.stack(
        [
            jax.random.uniform(kx, (n,), minval=x_min, maxval=x_max),
            jax.random.uniform(ky, (n,), minval=y_min, maxval=y_max),
        ],
        axis=-1,
    )
    return make_state(pos)


def measure_phases(spec, params, frame_ms):
    """Per-frame phase split of the PLANE-RESIDENT pipeline via cumulative
    prefixes, each timed as an in-jit repetition loop over distinct inputs with
    a checksum output — the only protocol that survives this runtime's
    identical-input memoization, its non-blocking block_until_ready, AND its ~10s
    of ms per-RPC host-pull cost (see runtime/timing.py).  Differences of
    successive prefixes give the phases: rebin (the only structure work left),
    force kernels, and the elementwise tail.
    """
    from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL, rebin_planes
    from rust_particle_system_tpu.ops.pallas.resident import (
        plane_state_from_particles,
    )
    from rust_particle_system_tpu.runtime.timing import hsync

    R = R_INJIT
    NB = 4  # distinct base states; iterations beyond NB jostle by an epsilon
    interp = jax.default_backend() not in ("tpu", "axon")
    dt = params.dt
    pss = [
        plane_state_from_particles(
            uniform_init(jax.random.key(100 + i), N, BOUNDS).with_ids(), spec
        )
        for i in range(NB)
    ]
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

    def timed(mk_body):
        # The warm and timed calls take DIFFERENT seeds: this runtime can
        # memoize identical-input executions (runtime/timing.py).
        fn = jax.jit(lambda base: jax.lax.fori_loop(
            0, R, mk_body(base), jnp.float32(0)))
        hsync(fn(jnp.float32(0.0)))
        t0 = time.perf_counter()
        hsync(fn(jnp.float32(0.0101)))
        return (time.perf_counter() - t0) / R * 1e3

    t_rebin = timed(upto_rebin)
    t_forces = timed(upto_forces)
    return {
        "rebin_ms": round(t_rebin, 2),
        "force_kernels_ms": round(t_forces - t_rebin, 2),
        "tail_ms": round(frame_ms - t_forces, 2),
        "protocol": f"in-jit x{R} cumulative prefixes; tail = frame - prefix",
    }


def pair_efficiency(spec, pos):
    """Issued vs within-radius pair counts for one frame's force walk."""
    h = CELL_SIZE
    grid = build_grid(spec, pos)
    nc, C = spec.num_cells, spec.capacity
    from rust_particle_system_tpu.ops.grid import gather_to_cells

    pos_s = pos[grid.perm]
    cpos = gather_to_cells(grid, spec, pos_s)
    nids = spec.neighbor_cell_ids()

    def count_chunk(c0):
        own = jax.lax.dynamic_slice(cpos, (c0, 0, 0), (256, C, 2))
        own_live = jax.lax.dynamic_slice(grid.table, (c0, 0), (256, C)) >= 0
        nbr = cpos[jax.lax.dynamic_slice(nids, (c0, 0), (256, 9))].reshape(256, 9 * C, 2)
        nbr_live = (grid.table[jax.lax.dynamic_slice(nids, (c0, 0), (256, 9))]
                    .reshape(256, 9 * C) >= 0)
        d2 = jnp.sum((nbr[:, None, :, :] - own[:, :, None, :]) ** 2, axis=-1)
        ok = (d2 <= h * h) & own_live[:, :, None] & nbr_live[:, None, :]
        # f32 per-chunk counts are exact (a chunk caps at 256*C*9C < 2^24 pairs);
        # the cross-chunk total sums in float64 on the host.  int64 would truncate
        # to int32 without x64 mode and spam the one JSON line users read.
        return jnp.sum(ok, dtype=jnp.float32)

    import numpy as np

    chunks = jnp.arange(0, (nc // 256) * 256, 256)
    useful = int(np.asarray(jax.lax.map(count_chunk, chunks), np.float64).sum())
    if spec.pack2:
        np2 = (spec.gw + 1) // 2
        issued = np2 * spec.gh * 128 * 6 * 128
        # Occupancy gating (ops/pallas/sph.py): own-slot chunks with no live
        # lane skip their 6-offset pair work, so EFFECTIVE issued counts only
        # the lanes of chunks that actually run, derived from the same live
        # mask and split pattern the kernel uses.
        import rust_particle_system_tpu.ops.pallas.sph as _sph

        if _sph.CHUNK_SPLITS is not None:
            live = np.asarray(grid.table >= 0)[:nc]  # [nc, C] (drop pad rows)
            gwp = 2 * np2
            if gwp * spec.gh != nc:  # odd gw: pad the phantom cell dead
                live = np.concatenate(
                    [live.reshape(spec.gh, spec.gw, C),
                     np.zeros((spec.gh, 1, C), bool)], axis=1).reshape(-1, C)
            rows = live.reshape(spec.gh, np2, 2 * C)  # A-unit lane rows
            # The kernel gates per TILE, not per A-unit row: conds take
            # jnp.max over the whole [tc, chunk] block (ops/pallas/sph.py), so
            # a chunk runs — for ALL tc rows of the tile — if ANY row has a
            # live lane there.  Mirror that granularity: pad np2 to the
            # tile-padded width, group tc consecutive A-units, and count every
            # row of a running tile-chunk.
            from rust_particle_system_tpu.ops.pallas.sph import plane_geometry

            _, tcg, wt2 = plane_geometry(np2, 2 * C)
            if wt2 > np2:
                rows = np.concatenate(
                    [rows, np.zeros((spec.gh, wt2 - np2, 2 * C), bool)],
                    axis=1)
            tiles = rows.reshape(spec.gh * (wt2 // tcg), tcg, 2 * C)
            pts = sorted({min(C, max(0, int(round(f * C))))
                          for f in _sph.CHUNK_SPLITS} | {0, C})
            run_lanes = 0
            for s in (0, 1):
                for a, b in zip(pts[:-1], pts[1:]):
                    seg = tiles[:, :, s * C + a : s * C + b]
                    runs = seg.any(axis=(1, 2))  # the kernel's pl.when cond
                    run_lanes += int(runs.sum()) * tcg * (b - a)
            issued_eff = run_lanes * 6 * 128
            return issued, issued_eff, useful
    else:
        cp = max(128, C)
        issued = nc * cp * 9 * cp
    return issued, issued, useful


def main() -> None:
    from rust_particle_system_tpu.ops.pallas.resident import (
        plane_frame,
        plane_state_from_particles,
        plane_step,
        render_plane_state,
    )
    from rust_particle_system_tpu.runtime.timing import hsync, time_chained

    # Primary: PLANE-RESIDENT state over the pair-packed layout (aspect-1 cells,
    # two cells per 128-lane row, half-shifted B-unit neighbors — 6 offsets).
    # The only sort the whole run executes is the initial binning; each frame is
    # one lossless hole-fill rebin + the two force walks + the elementwise tail.
    spec = GridSpec.from_bounds(BOUNDS, CELL_SIZE, capacity=64, cell_aspect=1,
                                pack2=True)
    params = rps.make_params(bounds=BOUNDS, gravity=300.0, shader_delay=0)
    RESULTS["backend"] = "pallas_plane_resident_pack2"
    RESULTS["device"] = str(jax.devices()[0])

    # The tunnel's FIRST device->host pull in a process pays a one-time ~1-2 min
    # channel-warmup tax (measured 115 s; later pulls ~28 ms).  Take it here, in
    # its own budgeted section, so it never lands inside a timed measurement.
    run_section("tunnel_warmup", 300,
                lambda: hsync(jnp.zeros((8,), jnp.float32) + 1.0))

    def sec_headline():
        ps = plane_state_from_particles(
            uniform_init(jax.random.key(0), N, BOUNDS).with_ids(), spec)
        lost_init = int(ps.lost)
        sph = jax.jit(lambda s: plane_step(s, params, spec), donate_argnums=0)
        ps = sph(sph(ps))  # compile + warm
        per, ps = time_chained(sph, ps, FRAMES)
        sph_elapsed = per * FRAMES
        RESULTS["value"] = FRAMES * N / sph_elapsed
        RESULTS["vs_baseline"] = RESULTS["value"] / 1e9
        RESULTS["sph_ms_per_frame"] = round(per * 1e3, 2)
        RESULTS["lost_at_init"] = lost_init
        # lossless contract: must be 0
        RESULTS["lost_while_stepping"] = int(ps.lost) - lost_init

    run_section("headline", 480, sec_headline)

    def sec_phases():
        frame_ms = RESULTS.get("sph_ms_per_frame", 0.0)
        RESULTS["phases"] = measure_phases(spec, params, frame_ms)

    run_section("phases", 300, sec_phases)

    # Second headline row (VERDICT r2 #6): the settle-SAFE DEFAULT configuration
    # (capacity 128, classic layout) measured in the regime it exists for — AT
    # EQUILIBRIUM.  Run the fluid to its settled pool state, then time frames.
    def sec_settled():
        spec128 = GridSpec.from_bounds(BOUNDS, CELL_SIZE, capacity=128)
        ps128 = plane_state_from_particles(
            uniform_init(jax.random.key(3), N, BOUNDS).with_ids(), spec128)
        lost128_init = int(ps128.lost)
        sph128 = jax.jit(lambda s: plane_step(s, params, spec128),
                         donate_argnums=0)
        ps128 = sph128(sph128(ps128))
        for _ in range(SETTLE_FRAMES):
            ps128 = sph128(ps128)
        hsync(ps128.px)
        per128, ps128 = time_chained(sph128, ps128, 20)
        RESULTS["settled_ms_per_frame_c128"] = round(per128 * 1e3, 2)
        RESULTS["settled_steps_per_sec_c128"] = round(N / per128)
        RESULTS["settled_lost_c128"] = int(ps128.lost) - lost128_init

    run_section("settled", 360, sec_settled)

    # Secondary: 1080p point-splat of 1M sprites from the PRODUCTION state — the
    # plane-resident render needs NO binning (the planes feed the MXU patch
    # rasterizer directly).  In-jit x R_INJIT over jostled states, checksum out.
    rspec = RenderSpec(width=RENDER_WH[0], height=RENDER_WH[1], max_radius_px=2)
    rparams = params._replace(particle_size=jnp.float32(2.0))

    def sec_splat():
        import dataclasses as _dc
        from rust_particle_system_tpu.ops.pallas.rebin import SENTINEL as _SEN

        rs0 = plane_state_from_particles(
            uniform_init(jax.random.key(50), N, BOUNDS).with_ids(), spec)
        rlive = rs0.px < 0.5 * _SEN

        @jax.jit
        def splatR(rpx, rpy, rvx, rvy, base):
            def one(i, acc):
                eps = 0.003 * jnp.float32(i) + base
                psr = _dc.replace(
                    rs0,
                    px=jnp.where(rlive, rpx + eps, _SEN),
                    py=jnp.where(rlive, rpy + eps, _SEN),
                    vx=rvx, vy=rvy)
                img = render_plane_state(psr, rparams, spec, rspec,
                                         bounds_static=BOUNDS)
                return acc + jnp.sum(img[::64, ::64, 0])

            return jax.lax.fori_loop(0, R_INJIT, one, jnp.float32(0))

        hsync(splatR(rs0.px, rs0.py, rs0.vx, rs0.vy, jnp.float32(0.0)))
        t0 = time.perf_counter()
        hsync(splatR(rs0.px, rs0.py, rs0.vx, rs0.vy, jnp.float32(0.0101)))
        RESULTS["splat_1080p_ms"] = round(
            (time.perf_counter() - t0) / R_INJIT * 1e3, 3)

    run_section("splat", 240, sec_splat)

    # Secondary: fused step + render p50 frame time (the BASELINE.json p50
    # metric) — physics AND 1080p image from the planes, zero binning work.
    def sec_fused():
        fused = jax.jit(
            lambda s: plane_frame(s, rparams, spec, rspec, bounds_static=BOUNDS),
            donate_argnums=0,
        )
        fps2 = plane_state_from_particles(
            uniform_init(jax.random.key(2), N, BOUNDS).with_ids(), spec)
        fps2, img = fused(fps2)
        fps2, img = fused(fps2)
        hsync(img)
        t0 = time.perf_counter()
        for _ in range(FUSED_REPS):
            fps2, img = fused(fps2)
        hsync((fps2.px, img))
        RESULTS["fused_frame_ms"] = round(
            (time.perf_counter() - t0) / FUSED_REPS * 1e3, 2)

    run_section("fused", 240, sec_fused)

    # Pair-work efficiency (VERDICT r1 #2): issued slot-pairs per walk vs pairs
    # actually within the smoothing radius.
    def sec_pair_efficiency():
        issued, issued_eff, useful = pair_efficiency(
            spec, uniform_init(jax.random.key(7), N, BOUNDS).pos)
        RESULTS["pairs_issued_per_walk"] = issued
        RESULTS["pairs_issued_effective"] = issued_eff
        RESULTS["pairs_useful_per_walk"] = useful
        # headline ratio = what the gated kernel actually executes per useful
        # pair; the ungated ratio is the static layout bound for comparison.
        RESULTS["pair_waste_ratio"] = round(issued_eff / max(useful, 1), 2)
        RESULTS["pair_waste_ratio_ungated"] = round(issued / max(useful, 1), 2)

    run_section("pair_efficiency", 120, sec_pair_efficiency)

    # Secondary: config-2 flow-field fused integrate at 1M, scanned (one dispatch
    # per 100 frames — host dispatch costs ~8 ms/frame on this runtime, which
    # would otherwise dominate an elementwise step).
    def sec_flow():
        from rust_particle_system_tpu.runtime.simulation import run_frames

        fparams = make_flow_params(bounds=BOUNDS)
        fstate = uniform_init(jax.random.key(1), N, BOUNDS)
        fstate = run_frames(flow_step, fstate, fparams, FLOW_FRAMES)
        hsync(fstate.pos)
        t0 = time.perf_counter()
        fstate = run_frames(flow_step, fstate, fparams, FLOW_FRAMES)
        hsync(fstate.pos)
        RESULTS["flow_steps_per_sec"] = round(
            FLOW_FRAMES * N / (time.perf_counter() - t0))

    run_section("flow", 90, sec_flow)


    # 16M particles on the PRODUCTION plane-resident pipeline (BASELINE.json
    # config 5's single-chip leg; VERDICT r3 #4).  Domain scales 4x per axis so
    # density (and per-cell occupancy) stays at the 1M design point.  Runs only
    # when the global deadline leaves room — it is the least timing-sensitive
    # row and the most expensive to compile cold.
    def sec_16m():
        # REAL scatter init (VERDICT r4 #5): rounds 2-4 sidestepped the init
        # with a synthetic analytically-binned state because "the 16M sort-
        # based init took ~113 s" — round-5 measurement (tools/time_init_16m)
        # showed that number was compile+dispatch artifacts: the real init is
        # ~1.2 s warm (~44 s cold incl. its one-off compiles, absorbed by the
        # persistent cache), lost_at_init 0 via the neighbor-spill pass.
        scale = 4.0 if not SMOKE else 2.0
        b16 = tuple(b * scale for b in BOUNDS)
        spec16 = GridSpec.from_bounds(b16, CELL_SIZE, capacity=64,
                                      cell_aspect=1, pack2=True)
        n16 = 16 * N if not SMOKE else 4 * N
        kx2, ky2 = jax.random.split(jax.random.key(4))
        pos16 = jnp.stack(
            [jax.random.uniform(kx2, (n16,), minval=b16[0], maxval=b16[1]),
             jax.random.uniform(ky2, (n16,), minval=b16[2], maxval=b16[3])],
            axis=-1)
        t_init = time.perf_counter()
        ps16 = plane_state_from_particles(
            make_state(pos16).with_ids(), spec16)
        RESULTS["lost_16m_at_init"] = int(ps16.lost)  # true pull = barrier
        RESULTS["init_16m_s"] = round(time.perf_counter() - t_init, 1)
        del pos16
        params16 = rps.make_params(bounds=b16, gravity=300.0, shader_delay=0)
        sph16 = jax.jit(lambda s: plane_step(s, params16, spec16),
                        donate_argnums=0)
        ps16 = sph16(sph16(ps16))
        per16, ps16 = time_chained(sph16, ps16, 10)
        RESULTS["steps_per_sec_16m"] = round(n16 / per16)
        RESULTS["sph_16m_ms_per_frame"] = round(per16 * 1e3, 1)
        RESULTS["lost_16m_stepping"] = (
            int(ps16.lost) - RESULTS["lost_16m_at_init"])
        RESULTS["n_16m"] = n16

    if _DEADLINE - time.monotonic() > 300:
        run_section("sixteen_m", 420, sec_16m)
    else:
        RESULTS["sections"]["sixteen_m"] = "skipped_deadline"

    # Reference-workload row: the reference's DEFAULT scene — 50,000 particles
    # (`/root/reference/src/main.rs:25`), scatter init (uniform x, Normal y —
    # `main.rs:182-216`), full fused step + 1080p render per frame.  The
    # reference redraws its window at display rate (vsync-capped ~60 fps on its
    # one GPU); this row is the end-to-end frames/sec of the same scene here.
    def sec_reference_workload():
        n_ref = 50_000 if not SMOKE else 2048
        rps_state = rps.scatter_init(jax.random.key(8), n_ref, BOUNDS)
        psr = plane_state_from_particles(rps_state.with_ids(), spec)
        RESULTS["ref50k_lost_at_init"] = int(psr.lost)
        fusedr = jax.jit(
            lambda s: plane_frame(s, rparams, spec, rspec, bounds_static=BOUNDS),
            donate_argnums=0,
        )
        psr, img = fusedr(psr)
        psr, img = fusedr(psr)
        hsync(img)
        t0 = time.perf_counter()
        for _ in range(FUSED_REPS):
            psr, img = fusedr(psr)
        hsync((psr.px, img))
        ms = (time.perf_counter() - t0) / FUSED_REPS * 1e3
        RESULTS["ref50k_frame_ms"] = round(ms, 2)
        RESULTS["ref50k_fps"] = round(1e3 / ms, 1)
        # Steady state: the same scene once the fluid has pooled (a settled
        # 50k pool occupies ~7 of 121 cell rows — protos/occupancy_settled.py).
        # The rebin's air-window row skip and the force/splat occupancy gating
        # all engage here; this is the frame rate a long-running user sees.
        settle = 900 if not SMOKE else 5
        for _ in range(settle):
            psr, img = fusedr(psr)
        hsync((psr.px, img))
        t0 = time.perf_counter()
        for _ in range(FUSED_REPS):
            psr, img = fusedr(psr)
        hsync((psr.px, img))
        ms = (time.perf_counter() - t0) / FUSED_REPS * 1e3
        RESULTS["ref50k_settled_frame_ms"] = round(ms, 2)
        RESULTS["ref50k_settled_fps"] = round(1e3 / ms, 1)

    run_section("reference_workload", 240, sec_reference_workload)

    if not FULL:
        return

    # ------------------------------------------------------------------
    # RPS_BENCH_FULL=1 extras — each costs a fresh cold Mosaic compile.
    # ------------------------------------------------------------------

    # Pipeline fallback rows: the production default is rebin v6 + the fused
    # in-kernel frame tail; these rows keep the alternatives honest.
    def mk_candidate(label, v, ft):
        def sec():
            stepc = jax.jit(
                lambda s: plane_step(s, params, spec, variant=v, fuse_tail=ft),
                donate_argnums=0)
            psc = plane_state_from_particles(
                uniform_init(jax.random.key(9), N, BOUNDS).with_ids(), spec)
            lc0 = int(psc.lost)
            psc = stepc(stepc(psc))
            perc, psc = time_chained(stepc, psc, max(FRAMES // 2, 2))
            RESULTS[f"sph_ms_per_frame_{label}"] = round(perc * 1e3, 2)
            RESULTS[f"lost_{label}"] = int(psc.lost) - lc0
        return sec

    for label, v, ft in (("v5_xla_tail", 5, False), ("v6_xla_tail", 6, False)):
        run_section(f"candidate_{label}", 300, mk_candidate(label, v, ft))

    # The classic WIDE patch (margin 4, 32-lane rows) — the default is the tight
    # patch with in-kernel center clamping (render/splat_planes.py).
    def sec_fused_margin4():
        fused3 = jax.jit(
            lambda s: plane_frame(s, rparams, spec, rspec, bounds_static=BOUNDS,
                                  patch_margin=4),
            donate_argnums=0,
        )
        fps3 = plane_state_from_particles(
            uniform_init(jax.random.key(3), N, BOUNDS).with_ids(), spec)
        fps3, img = fused3(fps3)
        fps3, img = fused3(fps3)
        hsync(img)
        t0 = time.perf_counter()
        for _ in range(FUSED_REPS):
            fps3, img = fused3(fps3)
        hsync((fps3.px, img))
        RESULTS["fused_frame_margin4_ms"] = round(
            (time.perf_counter() - t0) / FUSED_REPS * 1e3, 2)

    run_section("fused_margin4", 240, sec_fused_margin4)

    # Raw-positions -> image path (one sort + gather + plane build + rasterize),
    # for users whose positions do NOT already live in planes.
    def sec_splat_raw():
        from rust_particle_system_tpu.ops.pallas.sph_step import (
            render_state_planes,
        )

        raw0 = uniform_init(jax.random.key(70), N, BOUNDS)
        x0s, x1s, y0s, y1s = BOUNDS

        @jax.jit
        def splatRraw(rpos, color, base):
            def one(i, acc):
                eps = 0.003 * jnp.float32(i) + base
                p = jnp.stack([jnp.clip(rpos[:, 0] + eps, x0s, x1s),
                               jnp.clip(rpos[:, 1] + eps, y0s, y1s)], axis=-1)
                img = render_state_planes(
                    make_state(p, color=color), rparams, spec, rspec,
                    bounds_static=BOUNDS,
                )
                return acc + jnp.sum(img[::64, ::64, 0])

            return jax.lax.fori_loop(0, R_INJIT, one, jnp.float32(0))

        hsync(splatRraw(raw0.pos, raw0.color, jnp.float32(0.0)))
        t0 = time.perf_counter()
        hsync(splatRraw(raw0.pos, raw0.color, jnp.float32(0.0101)))
        RESULTS["splat_1080p_raw_ms"] = round(
            (time.perf_counter() - t0) / R_INJIT * 1e3, 3)

    run_section("splat_raw", 240, sec_splat_raw)


if __name__ == "__main__":
    try:
        main()
    finally:
        emit()
