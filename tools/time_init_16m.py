"""Time the REAL 16M plane-state init (VERDICT r4 missing #2 / next #5).

Round 4 recorded ~113 s for the 16M sort-based init and sidestepped it with a
synthetic analytically-binned state in bench.py.  Hypothesis: the cost was
never the XLA sort kernel (1M sorts in ~5 ms) but the EAGER composition —
dozens of per-op dispatches + one-off compiles + the tunnel's first-pull tax
landing inside the measurement.  This tool times the init properly:

  eager    plane_state_from_particles as shipped (per-op dispatch)
  jitted   the whole init as ONE jitted program (sort + gather + plane build
           + overflow spill fused into a single dispatch)

Usage (TPU): python tools/time_init_16m.py [n]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from rust_particle_system_tpu.core.state import make_state
from rust_particle_system_tpu.ops.grid import GridSpec
from rust_particle_system_tpu.ops.pallas.resident import (
    plane_state_from_particles,
)
from rust_particle_system_tpu.runtime.timing import hsync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
import math

scale = math.sqrt(N / 1_000_000)
xh = round(960.0 * scale / 9.0) * 9.0
yh = round(540.0 * scale / 9.0) * 9.0
BOUNDS = (-xh, xh, -yh, yh)


def main() -> None:
    spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1,
                                pack2=True)
    kx, ky = jax.random.split(jax.random.key(0))
    pos = jnp.stack(
        [jax.random.uniform(kx, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
         jax.random.uniform(ky, (N,), minval=BOUNDS[2], maxval=BOUNDS[3])],
        axis=-1)
    state = make_state(pos).with_ids()
    hsync(jnp.zeros((8,)) + 1.0)  # absorb the first-pull tax
    print(f"n={N} grid {spec.gh}x{spec.gw} C={spec.capacity}", flush=True)

    t0 = time.perf_counter()
    ps = plane_state_from_particles(state, spec)
    lost = int(ps.lost)
    float(np.asarray(ps.px[0, 0, 0]))
    print(f"eager init (cold):  {time.perf_counter() - t0:6.1f} s  lost={lost}",
          flush=True)
    t0 = time.perf_counter()
    ps = plane_state_from_particles(state, spec)
    lost = int(ps.lost)
    float(np.asarray(ps.px[0, 0, 0]))
    print(f"eager init (warm):  {time.perf_counter() - t0:6.1f} s  lost={lost}",
          flush=True)

    # MEASURED (2026-08-20, one v5e): eager cold 44.1 s (one-off compiles,
    # absorbed by the persistent cache), eager WARM 1.2 s, lost=0 — the
    # round-4 "~113 s init" was compile+dispatch artifacts, not the sort.
    # A whole-init jax.jit wrapper was also tried: it RESOURCE_EXHAUSTs at
    # 16M (no donation for the ~850 MB of init intermediates alongside the
    # eager-path arrays) for no benefit — the eager path is already one
    # cached dispatch per op and 1.2 s total.  Not worth pursuing.
    live = int(jnp.sum(ps.live, dtype=jnp.int32))
    print(f"live={live} (expect {N} - lost)", flush=True)


if __name__ == "__main__":
    main()
