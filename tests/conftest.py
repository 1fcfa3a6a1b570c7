"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated on
``xla_force_host_platform_device_count=8`` CPU devices (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu"; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def assert_dot_test(op, rng, rtol=1e-4, n_trials=3):
    """Adjoint consistency: <A x, y> == <x, A^H y> (the reference's
    correctness oracle, SURVEY §4)."""
    import jax.numpy as jnp

    for _ in range(n_trials):
        x = jnp.asarray(rng.standard_normal(op.dim_shape), dtype=op.dtype)
        y = jnp.asarray(rng.standard_normal(op.codim_shape), dtype=op.dtype)
        if jnp.issubdtype(jnp.dtype(op.dtype), jnp.complexfloating):
            x = x + 1j * jnp.asarray(rng.standard_normal(op.dim_shape), dtype=jnp.float32)
            y = y + 1j * jnp.asarray(rng.standard_normal(op.codim_shape), dtype=jnp.float32)
        lhs = jnp.vdot(y, op.apply(x))
        rhs = jnp.vdot(op.adjoint(y), x)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=rtol, atol=1e-4)


@pytest.fixture
def dot_test(rng):
    def check(op, rtol=1e-4, n_trials=3):
        assert_dot_test(op, rng, rtol=rtol, n_trials=n_trials)

    return check
