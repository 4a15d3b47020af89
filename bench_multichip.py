"""Multi-chip benchmark / demo — BASELINE.json config 5.

On a real v5e-8 slice (8 chips, bands over ICI):

    python bench_multichip.py --n 16000000 --bands 8 --frames 20

Without a pod, exercise the identical program on a virtual CPU mesh:

    python bench_multichip.py --cpu-mesh --n 8000 --bands 8 --frames 3

The domain scales with sqrt(n/1M) so fluid density (and per-cell occupancy) stays at
the 1M-particle design point — the reference's "fluid fills the screen" regime — which
keeps the Pallas capacity bound satisfied at any n.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force a virtual CPU mesh (testing without a pod)")
    ap.add_argument("--pipeline", choices=["plane", "stream"], default="plane",
                    help="plane = the PRODUCTION plane-resident pipeline "
                         "(lossless rebin as migration, fused psum composite); "
                         "stream = the round-1 sort+migrate step")
    ap.add_argument("--render", default=None, help="write final distributed frame PNG")
    ap.add_argument("--capacity", type=int, default=128,
                    help="grid slots per cell (128 = settle-safe default; "
                         "64 with --pack2 = the uniform-fast configuration)")
    ap.add_argument("--pack2", action="store_true",
                    help="pair-packed force-walk layout (cell_aspect 1)")
    ap.add_argument("--domain-scale", type=float, default=1.0,
                    help="shrink the constant-density domain (<1 raises "
                         "occupancy toward capacity — the crowded-deferral "
                         "regime for exercising lossless retention across "
                         "band boundaries)")
    args = ap.parse_args()

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.bands}"
            ).strip()

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import rust_particle_system_tpu as rps
    from rust_particle_system_tpu.core.state import make_state
    from rust_particle_system_tpu.parallel import (
        check_diags,
        make_band_mesh,
        make_shard_spec,
        make_sharded_render,
        make_sharded_step,
        shard_state,
    )
    from rust_particle_system_tpu.render import RenderSpec

    # constant-density domain scaling around the 1M design point, snapped to
    # whole 9-unit cells so the distributed fused render's 1-unit-per-pixel
    # mapping keeps integral pixel strides (render/splat_planes.py precondition)
    scale = math.sqrt(args.n / 1_000_000) * args.domain_scale
    xh = max(27.0, round(960.0 * scale / 9.0) * 9.0)
    yh = max(27.0, round(540.0 * scale / 9.0) * 9.0)
    bounds = (-xh, xh, -yh, yh)
    params = rps.make_params(bounds=bounds, gravity=300.0, shader_delay=0)
    sspec = make_shard_spec(bounds, cell_size=9.0, n=args.n, n_bands=args.bands,
                            capacity=args.capacity, slack=2.0,
                            cell_aspect=1 if args.pack2 else None,
                            pack2=args.pack2)
    mesh = make_band_mesh(args.bands)

    kx, ky = jax.random.split(jax.random.key(0))
    pos = jnp.stack(
        [jax.random.uniform(kx, (args.n,), minval=bounds[0], maxval=bounds[1]),
         jax.random.uniform(ky, (args.n,), minval=bounds[2], maxval=bounds[3])],
        axis=-1,
    )

    if args.pipeline == "plane":
        # The PRODUCTION pipeline on the mesh: plane-resident state sharded by
        # cell rows, the lossless hole-fill rebin doubling as migration
        # (acceptance masks over ppermute), the production force kernels with
        # ppermute halo ghosts (parallel/plane_sharded.py).
        from rust_particle_system_tpu.ops.pallas.resident import (
            plane_state_from_particles,
        )
        from rust_particle_system_tpu.parallel import (
            check_plane_diags,
            make_plane_sharded_frame,
            make_plane_sharded_step,
            shard_plane_state,
        )

        spec_p = sspec.grid  # gh divides n_bands by construction
        pstate = plane_state_from_particles(
            make_state(pos).with_ids(), spec_p)
        live0 = args.n - int(pstate.lost)
        sstate = shard_plane_state(pstate, mesh)
        step = make_plane_sharded_step(spec_p, mesh)

        for _ in range(2):
            sstate, diags = step(sstate, params)
            jax.block_until_ready(sstate.px)
        # TRUE barrier before the clock: on this runtime block_until_ready can
        # return before completion (runtime/timing.py) — only a device->host
        # pull drains the queue.  Without this the timed window inherits the
        # warm frames + executable load (measured +14 ms/frame at 1M, the
        # round-4 "sharded overhead" artifact).
        float(np.asarray(sstate.px[0, 0, 0]))

        t0 = time.perf_counter()
        all_diags = []
        for _ in range(args.frames):
            sstate, diags = step(sstate, params)
            all_diags.append(diags)
            if args.cpu_mesh:
                jax.block_until_ready(sstate.px)  # CPU collectives need pacing
                check_plane_diags(diags, expect_particles=live0)
            # On hardware the frames CHAIN (each consumes the last state) and
            # the diags trees stay on-device: pulling them per frame costs a
            # host RPC sync per frame (measured 216 -> ~36 ms/frame at 1M,
            # 1 band) and is pure validation, done after the clock below.
        float(np.asarray(sstate.px[0, 0, 0]))
        elapsed = time.perf_counter() - t0
        if not args.cpu_mesh:
            for diags in all_diags:
                check_plane_diags(diags, expect_particles=live0)

        out = {
            "conservation_checked": True,
            "metric": "sharded_particle_steps_per_sec",
            "pipeline": "plane_resident",
            "value": args.frames * args.n / elapsed,
            "unit": "steps/s",
            "n_particles": args.n,
            "bands": args.bands,
            "frames": args.frames,
            "ms_per_frame": round(elapsed / args.frames * 1e3, 2),
            "live_particles": int(diags["live_after"]),
            "deferred": int(diags["deferred"]),
            "lost_at_init": args.n - live0,
            "device0": str(jax.devices()[0]),
        }

        if args.render:
            frame = make_plane_sharded_frame(
                spec_p, mesh,
                RenderSpec(width=int(2 * xh), height=int(2 * yh),
                           max_radius_px=2), bounds)
            sstate, img, diags = frame(sstate, params)
            check_plane_diags(diags, expect_particles=live0)
            from rust_particle_system_tpu.render import to_srgb_u8
            from rust_particle_system_tpu.utils.png import write_png

            write_png(args.render, np.asarray(to_srgb_u8(img)))
            out["render"] = args.render

        print(json.dumps(out))
        return

    step = make_sharded_step(sspec, mesh)
    sstate, dropped = shard_state(make_state(pos), sspec)
    assert dropped == 0, f"slot capacity too small: {dropped} dropped"

    # two warm calls: the second compile absorbs the shard_map output sharding
    for _ in range(2):
        sstate, diags = step(sstate, params)
        jax.block_until_ready(sstate.pos)
    float(np.asarray(sstate.pos[0, 0]))  # true barrier (see plane branch)

    t0 = time.perf_counter()
    for _ in range(args.frames):
        sstate, diags = step(sstate, params)
        if args.cpu_mesh:
            jax.block_until_ready(sstate.pos)  # CPU-mesh collectives need pacing
        # hard guard every frame: violations / buffer drops / conservation breaks
        # are errors, never silently absorbed (VERDICT r1 #8/#9)
        check_diags(diags, expect_particles=args.n)
    # a true completion barrier: block_until_ready alone can return early on
    # tunneled runtimes (runtime/timing.py)
    float(np.asarray(sstate.pos[0, 0]))
    elapsed = time.perf_counter() - t0

    out = {
        "conservation_checked": True,
        "metric": "sharded_particle_steps_per_sec",
        "pipeline": "stream",
        "value": args.frames * args.n / elapsed,
        "unit": "steps/s",
        "n_particles": args.n,
        "bands": args.bands,
        "frames": args.frames,
        "ms_per_frame": round(elapsed / args.frames * 1e3, 2),
        "live_particles": int(diags["live_particles"]),
        "migration_dropped": int(diags["migration_send_dropped"])
        + int(diags["migration_recv_dropped"]),
        "band_violations": int(diags["band_violations"]),
        "grid_overflow": int(diags["grid_overflow"]),
        "device0": str(jax.devices()[0]),
    }

    if args.render:
        render = make_sharded_render(
            mesh, RenderSpec(width=1920, height=1080, max_radius_px=4)
        )
        img = render(sstate, params)
        from rust_particle_system_tpu.render import to_srgb_u8
        from rust_particle_system_tpu.utils.png import write_png

        write_png(args.render, np.asarray(to_srgb_u8(img)))
        out["render"] = args.render

    print(json.dumps(out))


if __name__ == "__main__":
    main()
