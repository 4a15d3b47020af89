"""Minimal repro: Mosaic rejects tpu.reshape of bf16 broadcast vectors.

Round-2 found that bf16 pair math does NOT compile on this toolchain: any kernel
that broadcasts a bf16 vector across sublanes and reshapes it (the natural way to
form pair tiles) fails in Mosaic's reshape lowering.  bf16 matters because it
halves VPU register pressure in the force kernels (the measured bottleneck is
per-op issue rate, not arithmetic) — retest once per round and record the result
in BASELINE.md.

Run: python protos/bf16_repro.py     (on the TPU; prints OK or the Mosaic error)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    x = x_ref[:]  # [8, 128] bf16
    # broadcast one row across sublanes, then reshape — the pair-tile idiom
    row = x[0:1, :]  # [1, 128]
    tile = jnp.broadcast_to(row, (8, 128)).reshape(4, 256)
    o_ref[:] = tile.astype(jnp.float32)


def main():
    x = jnp.ones((8, 128), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((4, 256), jnp.float32),
        )(x)
        jax.block_until_ready(out)
        print("OK — bf16 broadcast+reshape now compiles; revisit bf16 pair math")
    except Exception as e:  # noqa: BLE001 — report the toolchain error verbatim
        print("STILL BLOCKED:", type(e).__name__)
        print(str(e)[:2000])


if __name__ == "__main__":
    main()


def main_round4():
    """Round-4 addendum: the 2D-repro above now COMPILES (toolchain updated),
    but a sharper instance of the same class remains: casting a 2D array to
    bf16 and THEN adding an axis ([:, :, None] / [:, None, :]) CRASHES the
    compile helper (HTTP 500, subprocess exit 1 — not a graceful reject).
    Newaxis-first-then-cast compiles and runs.  Bisect: /tmp/bf16_shape2.py,
    2026-08-20; rule applied in ops/pallas/sph.py's bf16 pair bodies."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    BF = jnp.bfloat16

    def kernel(a_ref, b_ref, o_ref):
        a = jax.lax.slice(a_ref[...], (0, 0), (8, 40))
        o_ref[...] = (a.astype(BF)[:, :, None]
                      * b_ref[...].astype(BF)[:, None, :]).astype(jnp.float32)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 40, 128), jnp.float32),
        )(jnp.ones((8, 128), jnp.float32), jnp.ones((8, 128), jnp.float32))
        jax.block_until_ready(out)
        print("OK — cast-2D-then-newaxis now compiles too; drop the rule")
    except Exception as e:  # noqa: BLE001
        print("STILL CRASHES (use newaxis-then-cast):", type(e).__name__,
              str(e)[:160])


if __name__ == "__main__":
    main()
    main_round4()
