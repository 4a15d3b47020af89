"""Parity tests: Pallas N-body kernel (interpret mode on CPU) vs the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_particle_system_tpu.models import make_nbody_params, nbody_accel
from rust_particle_system_tpu.ops.pallas.nbody import nbody_accel_pallas


@pytest.mark.parametrize("n", [256, 1024, 1000])  # 1000: exercises padding
def test_pallas_accel_matches_jnp(rng, n):
    pos = jnp.asarray(rng.uniform(-500, 500, (n, 2)), jnp.float32)
    params = make_nbody_params()
    want = np.asarray(nbody_accel(pos, params))
    got = np.asarray(nbody_accel_pallas(pos, params))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_accel_coincident_particles_finite(rng):
    pos = jnp.zeros((256, 2), jnp.float32)
    params = make_nbody_params()
    got = np.asarray(nbody_accel_pallas(pos, params))
    assert np.all(np.isfinite(got))


def test_nbody_model_pallas_backend_step(rng):
    from rust_particle_system_tpu.models import NBody

    model = NBody.create(backend="pallas")
    params = make_nbody_params(bounds=model.bounds)
    state = model.init(jax.random.key(0), 512)
    out = jax.jit(model.step)(state, params)
    ref = jax.jit(NBody.create(backend="jnp").step)(state, params)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), rtol=1e-4, atol=2e-3)
