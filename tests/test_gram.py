"""Fused convolution Gram: exactness against adjoint(apply) for all kernel
parities, and the LeastSquaresLoss fusion path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycsou_tpu.ops.conv import Convolve2D


@pytest.mark.parametrize("kshape", [(3, 3), (5, 5), (4, 4), (5, 4), (1, 3), (7, 2)])
@pytest.mark.parametrize("shape", [(16, 16), (17, 13)])
def test_conv2d_gram_exact(rng, kshape, shape):
    h = jnp.asarray(rng.standard_normal(kshape), dtype=jnp.float32)
    A = Convolve2D(shape, h, method="fft")
    g = A.gram
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    expected = A.adjoint(A(x))
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(expected), rtol=1e-3, atol=1e-4)


def test_least_squares_loss_fusion(rng):
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.loss import LeastSquaresLoss

    shape = (16, 16)
    h = jnp.asarray(rng.standard_normal((5, 5)) / 5, dtype=jnp.float32)
    A = Convolve2D(shape, h)
    y = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    F = SquaredL2Loss(shape, data=y) * A
    assert isinstance(F, LeastSquaresLoss)
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(F.gradient(x)), np.asarray(2 * A.adjoint(A(x) - y)), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(F(x)), float(jnp.sum((A(x) - y) ** 2)), rtol=1e-4)
    assert np.isclose(F.diff_lipschitz, 2 * A.lipschitz**2)


def test_least_squares_loss_dense(rng):
    """Generic operators keep working through the same node."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.loss import LeastSquaresLoss
    from pycsou_tpu.ops.basic import DenseOperator

    A = DenseOperator(jnp.asarray(rng.standard_normal((9, 6)), dtype=jnp.float32))
    A.compute_lipschitz_cst()
    y = jnp.asarray(rng.standard_normal(9), dtype=jnp.float32)
    F = SquaredL2Loss((9,), data=y) * A
    assert isinstance(F, LeastSquaresLoss)
    x = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(F.gradient(x)), np.asarray(2 * A.adjoint(A(x) - y)), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("m", [3, 4, 7, 10])
def test_conv1d_gram_exact(rng, m):
    from pycsou_tpu.ops.conv import Convolve1D

    n = 48
    h = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
    A = Convolve1D((n,), h, method="fft")
    g = A.gram
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(g(x)), np.asarray(A.adjoint(A(x))), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("kshape", [(3, 3), (5, 5), (4, 4), (5, 4), (7, 2)])
@pytest.mark.parametrize("shape", [(32, 32), (64, 48), (48, 32)])
def test_conv2d_gram_wrap_exact(rng, kshape, shape):
    """Exact-size circular Gram + wraparound corrections == adjoint(apply)."""
    from pycsou_tpu.ops.conv import ConvGram2D, next_fast_len

    assert all(next_fast_len(n) == n for n in shape)
    h = jnp.asarray(rng.standard_normal(kshape), dtype=jnp.float32)
    A = Convolve2D(shape, h, method="fft")
    g = ConvGram2D(A, wrap=True)
    assert g.wrap
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    expected = A.adjoint(A(x))
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(expected), rtol=2e-3, atol=2e-4)


def test_conv2d_gram_auto_policy(rng):
    from pycsou_tpu.ops.conv import ConvGram2D

    h = jnp.asarray(rng.standard_normal((5, 5)), dtype=jnp.float32)
    assert ConvGram2D(Convolve2D((64, 64), h)).wrap       # fast size
    assert not ConvGram2D(Convolve2D((65, 64), h)).wrap   # 65 not a fast size
    assert not ConvGram2D(Convolve2D((16, 64), h)).wrap   # 16 < 4*5
