"""Pallas fused TV stencil kernel vs the XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycsou_tpu.kernels.tv import tv_pds_stencil_step, tv_pds_stencil_step_xla


@pytest.mark.parametrize("shape", [(32, 128), (64, 256), (16, 128)])
@pytest.mark.parametrize("nonneg", [True, False])
def test_pallas_tv_step_matches_xla(rng, shape, nonneg):
    H, W = shape
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)), jnp.float32) * 0.1
    # respect the dual invariant (z's last row/col zero), as the solvers do
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)
    kw = dict(tau=0.3, sigma=0.3, rho=0.9, lam=0.05, nonneg=nonneg)
    x1, z1 = tv_pds_stencil_step(x, z, g, interpret=True, **kw)
    x2, z2 = tv_pds_stencil_step_xla(x, z, g, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5, atol=1e-6)


def test_pallas_step_iterated(rng):
    """Invariant preservation: repeated fused steps stay equal to the oracle."""
    H, W = 32, 128
    x1 = x2 = jnp.zeros((H, W), jnp.float32)
    z1 = z2 = jnp.zeros((2, H, W), jnp.float32)
    y = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    kw = dict(tau=0.25, sigma=0.25, rho=0.9, lam=0.1, nonneg=True)
    for _ in range(5):
        g1 = 2 * (x1 - y)
        g2 = 2 * (x2 - y)
        x1, z1 = tv_pds_stencil_step(x1, z1, g1, interpret=True, **kw)
        x2, z2 = tv_pds_stencil_step_xla(x2, z2, g2, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(32, 128), (96, 256), (16, 128), (8, 128)])
@pytest.mark.parametrize("nonneg", [True, False])
def test_sweep_tv_step_matches_xla(rng, shape, nonneg):
    """Scratch-carry sweep kernel == XLA oracle (interpret mode)."""
    from pycsou_tpu.kernels.tv import tv_pds_stencil_step_sweep

    H, W = shape
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)), jnp.float32) * 0.1
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)
    kw = dict(tau=0.3, sigma=0.3, rho=0.9, lam=0.05, nonneg=nonneg)
    x1, z1 = tv_pds_stencil_step_sweep(x, z, g, interpret=True, **kw)
    x2, z2 = tv_pds_stencil_step_xla(x, z, g, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5, atol=1e-6)


def test_sweep_step_iterated(rng):
    from pycsou_tpu.kernels.tv import tv_pds_stencil_step_sweep

    H, W = 64, 128
    x1 = x2 = jnp.zeros((H, W), jnp.float32)
    z1 = z2 = jnp.zeros((2, H, W), jnp.float32)
    y = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    kw = dict(tau=0.25, sigma=0.25, rho=0.9, lam=0.1, nonneg=True)
    for _ in range(5):
        x1, z1 = tv_pds_stencil_step_sweep(x1, z1, 2 * (x1 - y), interpret=True, **kw)
        x2, z2 = tv_pds_stencil_step_xla(x2, z2, 2 * (x2 - y), **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5, atol=1e-6)
