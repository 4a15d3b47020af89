"""Window gather variants: jnp.take 1-row slices vs lax.gather 2-row slices."""
import time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rust_particle_system_tpu.ops.grid import GridSpec, build_grid
from rust_particle_system_tpu.runtime.timing import hsync

N = 1_000_000
BOUNDS = (-960.0, 960.0, -540.0, 540.0)
spec = GridSpec.from_bounds(BOUNDS, 9.0, capacity=64, cell_aspect=1, pack2=True)
nc = spec.num_cells
nc_pad = -(-nc // 128) * 128
_S = 1.0e6

def prep(pred, vel):
    grid = build_grid(spec, pred)
    packed = jnp.concatenate([pred, vel], axis=-1)[grid.perm]
    nr = -(-N // 64) + 1
    pad = nr * 64 - N
    fills = jnp.asarray([_S, _S, 0.0, 0.0], jnp.float32)
    packed = jnp.concatenate([packed, jnp.broadcast_to(fills, (pad, 4))], axis=0)
    R = packed.reshape(nr, 256)
    starts = grid.starts[:nc]
    q = starts >> 6
    q = jnp.concatenate([q, jnp.zeros((nc_pad - nc,), jnp.int32)])
    return R, q

def w_take(R, q):
    return jnp.take(R, jnp.stack([q, q + 1], axis=1).reshape(-1), axis=0).reshape(nc_pad, 512)

def w_gather2(R, q):
    out = jax.lax.gather(
        R, q[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)),
        slice_sizes=(2, 256), mode="clip")
    return out.reshape(nc_pad, 512)

def main():
    ks = jax.random.split(jax.random.key(0), 8)
    preds = jnp.stack([jnp.stack([
        jax.random.uniform(k, (N,), minval=BOUNDS[0], maxval=BOUNDS[1]),
        jax.random.uniform(jax.random.fold_in(k, 1), (N,), minval=BOUNDS[2], maxval=BOUNDS[3]),
    ], axis=-1) for k in ks])
    vels = jax.random.normal(jax.random.key(9), (8, N, 2)) * 10.0
    print("data ready", flush=True)

    Ra, qa = jax.jit(prep)(preds[0], vels[0])
    print("match:", bool(jnp.all(w_take(Ra, qa) == w_gather2(Ra, qa))), flush=True)

    def timed(body, label):
        @jax.jit
        def loop():
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0))
        hsync(loop())
        print(f"{label}: compiled", flush=True)
        t0 = time.perf_counter()
        hsync(loop())
        print(f"{label}: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)

    def base(i, acc):
        R, q = prep(preds[i], vels[i])
        return acc + jnp.sum(R[::512, 0]) + jnp.sum(q[::64]).astype(jnp.float32)
    def take1(i, acc):
        R, q = prep(preds[i], vels[i])
        return acc + jnp.sum(w_take(R, q)[::512, ::16])
    def gath2(i, acc):
        R, q = prep(preds[i], vels[i])
        return acc + jnp.sum(w_gather2(R, q)[::512, ::16])

    timed(base, "prep only")
    timed(take1, "prep + take 1-row slices")
    timed(gath2, "prep + gather 2-row slices")

if __name__ == "__main__":
    main()
