"""Operator library tests: dot tests for every operator + ground-truth
comparisons against scipy/numpy (the reference's oracle, SURVEY §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from pycsou_tpu.ops import (
    BlockDiagonalOperator,
    BlockOperator,
    Convolve1D,
    Convolve2D,
    DCTOperator,
    DenseOperator,
    DirectionalGradient,
    DirectionalLaplacian,
    DownSampling,
    FFTOperator,
    FirstDerivative,
    FirstDirectionalDerivative,
    GeneralisedDerivative,
    GeneralisedLaplacian,
    GeneralisedVandermonde,
    Gradient,
    IDCTOperator,
    Integration1D,
    KhatriRaoProduct,
    KroneckerProduct,
    KroneckerSum,
    Laplacian,
    LinOpHStack,
    LinOpVStack,
    MappedDistanceMatrix,
    Masking,
    MovingAverage1D,
    MovingAverage2D,
    NNSampling,
    Pooling,
    SecondDerivative,
    SecondDirectionalDerivative,
    SubSampling,
)


def jarr(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


# ---------------- convolutions ----------------


@pytest.mark.parametrize("m", [5, 6, 13])
@pytest.mark.parametrize("method", ["fft", "direct"])
def test_convolve1d_vs_scipy(rng, dot_test, m, method):
    n = 32
    h = rng.standard_normal(m).astype(np.float32)
    op = Convolve1D((n,), h, method=method)
    x = jarr(rng, n)
    expected = scipy.signal.convolve(np.asarray(x), h, mode="full")
    ofs = m // 2
    np.testing.assert_allclose(op(x), expected[ofs : ofs + n], rtol=1e-3, atol=1e-4)
    dot_test(op)


@pytest.mark.parametrize("shape_k", [(3, 3), (4, 5)])
@pytest.mark.parametrize("method", ["fft", "direct"])
def test_convolve2d_vs_scipy(rng, dot_test, shape_k, method):
    n0, n1 = 12, 10
    h = rng.standard_normal(shape_k).astype(np.float32)
    op = Convolve2D((n0, n1), h, method=method)
    x = jarr(rng, n0, n1)
    full = scipy.signal.convolve2d(np.asarray(x), h, mode="full")
    o0, o1 = shape_k[0] // 2, shape_k[1] // 2
    np.testing.assert_allclose(op(x), full[o0 : o0 + n0, o1 : o1 + n1], rtol=1e-3, atol=1e-4)
    dot_test(op)


def test_conv_lipschitz_bound(rng):
    h = rng.standard_normal(7).astype(np.float32)
    op = Convolve1D((64,), h)
    exact = np.linalg.norm(np.asarray(op.todense().mat), 2)
    assert op.lipschitz >= exact - 1e-4
    assert op.lipschitz <= np.sum(np.abs(h)) + 1e-4


def test_moving_average(rng, dot_test):
    op = MovingAverage1D((20,), 5)
    x = jnp.ones(20)
    np.testing.assert_allclose(np.asarray(op(x))[5:15], 1.0, rtol=1e-5)
    dot_test(op)
    dot_test(MovingAverage2D((8, 8), (3, 3)))


# ---------------- derivatives ----------------


@pytest.mark.parametrize("kind", ["forward", "backward", "centered"])
def test_first_derivative(rng, dot_test, kind):
    op = FirstDerivative((16,), kind=kind, step=0.5)
    dot_test(op)
    x = jnp.arange(16, dtype=jnp.float32)
    y = np.asarray(op(x))
    interior = y[2:-2]
    np.testing.assert_allclose(interior, 2.0, rtol=1e-5)  # slope 1 / step 0.5


def test_first_derivative_axis(rng, dot_test):
    op = FirstDerivative((6, 8), axis=1, kind="forward")
    dot_test(op)


def test_second_derivative(rng, dot_test):
    op = SecondDerivative((12,), step=1.0)
    dot_test(op)
    x = jnp.arange(12, dtype=jnp.float32) ** 2
    np.testing.assert_allclose(np.asarray(op(x))[1:-1], 2.0, rtol=1e-4)


def test_gradient(rng, dot_test):
    op = Gradient((7, 9))
    dot_test(op)
    x = jarr(rng, 7, 9)
    g = op(x)
    assert g.shape == (2, 7, 9)
    np.testing.assert_allclose(g[0][:-1], np.diff(np.asarray(x), axis=0), rtol=1e-5)
    np.testing.assert_allclose(g[1][:, :-1], np.diff(np.asarray(x), axis=1), rtol=1e-5)
    # opnorm bound is valid
    est = op.opnorm()
    assert op.lipschitz >= est - 1e-3


def test_laplacian(rng, dot_test):
    op = Laplacian((8, 8))
    dot_test(op)
    x = jarr(rng, 8, 8)
    # interior matches the 5-point stencil
    expected = (
        np.asarray(x)[:-2, 1:-1] + np.asarray(x)[2:, 1:-1] + np.asarray(x)[1:-1, :-2] + np.asarray(x)[1:-1, 2:]
        - 4 * np.asarray(x)[1:-1, 1:-1]
    )
    np.testing.assert_allclose(np.asarray(op(x))[1:-1, 1:-1], expected, rtol=1e-4, atol=1e-5)


def test_generalised_derivative(rng, dot_test):
    for kind, kw in [
        ("iterated", dict(order=2)),
        ("sobolev", dict(order=1, alpha=2.0)),
        ("exponential", dict(order=2, alpha=0.5)),
        ("polynomial", dict(coeffs=[1.0, -2.0, 1.0])),
    ]:
        op = GeneralisedDerivative((16,), kind=kind, **kw)
        dot_test(op)


def test_generalised_laplacian(rng, dot_test):
    op = GeneralisedLaplacian((8, 8), kind="sobolev", order=1, alpha=1.0)
    dot_test(op)


def test_directional(rng, dot_test):
    v = np.array([1.0, 0.5], dtype=np.float32)
    d1 = FirstDirectionalDerivative((8, 8), v)
    dot_test(d1)
    d2 = SecondDirectionalDerivative((8, 8), v)
    dot_test(d2)
    dg = DirectionalGradient((8, 8), [v, -v])
    dot_test(dg)
    dl = DirectionalLaplacian((8, 8), [v, np.array([0.0, 1.0], np.float32)])
    dot_test(dl)


def test_integration(rng, dot_test):
    op = Integration1D((10,))
    x = jarr(rng, 10)
    np.testing.assert_allclose(op(x), np.cumsum(np.asarray(x)), rtol=1e-5)
    dot_test(op)


# ---------------- transforms ----------------


def test_fft_unitary(rng, dot_test):
    op = FFTOperator((8,))
    x = jnp.asarray(rng.standard_normal(8) + 1j * rng.standard_normal(8), dtype=jnp.complex64)
    np.testing.assert_allclose(op.adjoint(op(x)), x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(op(x))), float(jnp.linalg.norm(x)), rtol=1e-5
    )
    dot_test(op)


def test_dct_unitary(rng, dot_test):
    op = DCTOperator((16,))
    x = jarr(rng, 16)
    np.testing.assert_allclose(op.adjoint(op(x)), x, rtol=1e-4, atol=1e-5)
    import scipy.fft

    np.testing.assert_allclose(op(x), scipy.fft.dct(np.asarray(x), norm="ortho"), rtol=1e-4, atol=1e-5)
    dot_test(op)
    dot_test(IDCTOperator((8, 6)))


def test_unitary_precomp_prox(rng):
    """prox of f o U via the unitary rule (functional.py:302-313)."""
    from pycsou_tpu.func import L1Norm

    U = DCTOperator((16,))
    f = L1Norm((16,)) * U
    x = jarr(rng, 16)
    expected = U.adjoint(jax.nn.relu(jnp.abs(U(x)) - 0.3) * jnp.sign(U(x)))
    np.testing.assert_allclose(f.prox(x, 0.3), expected, rtol=1e-4, atol=1e-5)


# ---------------- sampling ----------------


def test_subsampling_masking(rng, dot_test):
    op = SubSampling((12,), [1, 5, 7])
    x = jarr(rng, 12)
    np.testing.assert_allclose(op(x), np.asarray(x)[[1, 5, 7]], rtol=1e-6)
    dot_test(op)

    mask = rng.standard_normal((6, 6)) > 0
    m = Masking((6, 6), mask)
    xm = jarr(rng, 6, 6)
    np.testing.assert_allclose(m(xm), np.asarray(xm)[mask], rtol=1e-6)
    dot_test(m)
    # round trip: adjoint(apply(x)) == x * mask
    np.testing.assert_allclose(m.adjoint(m(xm)), np.asarray(xm) * mask, rtol=1e-6)


def test_downsampling(rng, dot_test):
    op = DownSampling((12, 9), factor=3)
    x = jarr(rng, 12, 9)
    np.testing.assert_allclose(op(x), np.asarray(x)[::3, ::3], rtol=1e-6)
    dot_test(op)
    op1 = DownSampling((12,), factor=2, axis=0)
    dot_test(op1)


@pytest.mark.parametrize("kind", ["sum", "mean"])
def test_pooling(rng, dot_test, kind):
    op = Pooling((8, 6), (2, 3), kind=kind)
    x = jarr(rng, 8, 6)
    f = np.sum if kind == "sum" else np.mean
    expected = f(np.asarray(x).reshape(4, 2, 2, 3), axis=(1, 3))
    np.testing.assert_allclose(op(x), expected, rtol=1e-5)
    dot_test(op)


def test_nn_sampling(rng, dot_test):
    grid = np.linspace(0, 1, 20)
    samples = rng.uniform(0, 1, 15)
    op = NNSampling(grid, samples, adjoint_mode="sum")
    x = jarr(rng, 20)
    idx = np.argmin(np.abs(samples[:, None] - grid[None, :]), axis=1)
    np.testing.assert_allclose(op(x), np.asarray(x)[idx], rtol=1e-6)
    dot_test(op)
    # mean mode replicates the reference's collision averaging
    op_mean = NNSampling(grid, samples, adjoint_mode="mean")
    y = jarr(rng, 15)
    adj = np.zeros(20)
    cnt = np.zeros(20)
    for i, j in enumerate(idx):
        adj[j] += float(y[i])
        cnt[j] += 1
    adj = adj / np.maximum(cnt, 1)
    np.testing.assert_allclose(op_mean.adjoint(y), adj, rtol=1e-5, atol=1e-6)


def test_vandermonde(rng, dot_test):
    z = np.linspace(0, 1, 11)
    op = GeneralisedVandermonde([lambda t: t**0, lambda t: t, lambda t: t**2], z)
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(op(x), 1 + 2 * z + 3 * z**2, rtol=1e-4)
    dot_test(op)


@pytest.mark.parametrize("backend", ["dense", "matrix-free"])
def test_mapped_distance_matrix(rng, dot_test, backend):
    from pycsou_tpu.math import Matern

    pts1 = rng.uniform(0, 1, (9, 2)).astype(np.float32)
    pts2 = rng.uniform(0, 1, (7, 2)).astype(np.float32)
    op = MappedDistanceMatrix(pts1, pts2, Matern(k=1, epsilon=0.3), backend=backend, block=4)
    dot_test(op)
    a = jarr(rng, 7)
    d = np.linalg.norm(pts1[:, None, :] - pts2[None, :, :], axis=-1)
    expected = Matern(k=1, epsilon=0.3)(d) @ np.asarray(a)
    np.testing.assert_allclose(op(a), expected, rtol=1e-4, atol=1e-5)


# ---------------- kron ----------------


def test_kronecker_product_vs_numpy(rng, dot_test):
    A = rng.standard_normal((4, 3)).astype(np.float32)
    B = rng.standard_normal((5, 2)).astype(np.float32)
    op = KroneckerProduct(A, B)
    x = jarr(rng, 3 * 2).reshape(3, 2)
    expected = (np.kron(A, B) @ np.asarray(x).ravel()).reshape(4, 5)
    np.testing.assert_allclose(op(x), expected, rtol=1e-4, atol=1e-5)
    dot_test(op)


def test_kronecker_matrix_free_factors(rng, dot_test):
    D = FirstDerivative((6,), kind="forward")
    I6 = FirstDerivative((4,), kind="backward")
    op = KroneckerProduct(D, I6)
    dot_test(op)


def test_kronecker_sum(rng, dot_test):
    A = rng.standard_normal((3, 3)).astype(np.float32)
    B = rng.standard_normal((4, 4)).astype(np.float32)
    op = KroneckerSum(A, B)
    x = jarr(rng, 12).reshape(3, 4)
    expected = ((np.kron(A, np.eye(4)) + np.kron(np.eye(3), B)) @ np.asarray(x).ravel()).reshape(3, 4)
    np.testing.assert_allclose(op(x), expected, rtol=1e-4, atol=1e-5)
    dot_test(op)


def test_khatri_rao(rng, dot_test):
    A = rng.standard_normal((4, 6)).astype(np.float32)
    B = rng.standard_normal((5, 6)).astype(np.float32)
    op = KhatriRaoProduct(A, B)
    x = jarr(rng, 6)
    expected = np.stack([np.kron(A[:, j], B[:, j]) for j in range(6)], axis=1) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(op(x)).ravel(), expected, rtol=1e-4, atol=1e-5)
    dot_test(op)


# ---------------- stacks ----------------


def test_vstack(rng, dot_test):
    A = DenseOperator(jarr(rng, 4, 6))
    B = DenseOperator(jarr(rng, 4, 6))
    op = LinOpVStack([A, B])
    x = jarr(rng, 6)
    np.testing.assert_allclose(op(x), jnp.stack([A(x), B(x)]), rtol=1e-5)
    dot_test(op)
    # non-uniform
    C = DenseOperator(jarr(rng, 3, 6))
    op2 = LinOpVStack([A, C])
    assert op2.codim_shape == (7,)
    dot_test(op2)


def test_hstack(rng, dot_test):
    A = DenseOperator(jarr(rng, 4, 6))
    B = DenseOperator(jarr(rng, 4, 6))
    op = LinOpHStack([A, B])
    x = jarr(rng, 2, 6)
    np.testing.assert_allclose(op(x), A(x[0]) + B(x[1]), rtol=1e-5)
    dot_test(op)


def test_block_diagonal(rng, dot_test):
    A = DenseOperator(jarr(rng, 4, 6))
    B = DenseOperator(jarr(rng, 3, 2))
    op = BlockDiagonalOperator([A, B])
    dot_test(op)
    x = jarr(rng, 8)
    np.testing.assert_allclose(
        op(x), jnp.concatenate([A(x[:6]), B(x[6:])]), rtol=1e-5
    )


def test_block_operator(rng, dot_test):
    A = DenseOperator(jarr(rng, 4, 6))
    B = DenseOperator(jarr(rng, 4, 2))
    C = DenseOperator(jarr(rng, 3, 6))
    D = DenseOperator(jarr(rng, 3, 2))
    op = BlockOperator([[A, B], [C, D]])
    dot_test(op)
    x = jarr(rng, 8)
    top = A(x[:6]) + B(x[6:])
    bot = C(x[:6]) + D(x[6:])
    np.testing.assert_allclose(op(x), jnp.concatenate([top, bot]), rtol=1e-5)
    full = np.block(
        [
            [np.asarray(A.mat), np.asarray(B.mat)],
            [np.asarray(C.mat), np.asarray(D.mat)],
        ]
    )
    np.testing.assert_allclose(op(x), full @ np.asarray(x), rtol=1e-4)


def test_gradient_equals_stack_of_derivatives(rng):
    """Reference doctest identity (linop/base.py:211-234)."""
    G1 = Gradient((6, 7))
    G2 = LinOpVStack([FirstDerivative((6, 7), axis=0), FirstDerivative((6, 7), axis=1)])
    x = jarr(rng, 6, 7)
    np.testing.assert_allclose(G1(x), G2(x), rtol=1e-5)
    z = jarr(rng, 2, 6, 7)
    np.testing.assert_allclose(G1.adjoint(z), G2.adjoint(z), rtol=1e-4)


def test_mdm_sparse_backend_equals_dense(rng, dot_test):
    """Compact-support (cKDTree + gather/segment_sum) backend == dense for a
    Wendland kernel (reference sampling.py:975-1019 parity)."""
    from pycsou_tpu.math.green import Wendland
    from pycsou_tpu.ops.sampling import MappedDistanceMatrix

    s1 = rng.uniform(size=(120, 2)).astype(np.float32)
    s2 = rng.uniform(size=(90, 2)).astype(np.float32)
    f = Wendland(k=1, epsilon=0.2)
    dense = MappedDistanceMatrix(s1, s2, f, backend="dense")
    sparse = MappedDistanceMatrix(s1, s2, f, backend="sparse")
    # the neighbour lists are genuinely compact
    assert sparse._nbr_idx.shape[1] < 60
    x = jnp.asarray(rng.standard_normal(90), jnp.float32)
    y = jnp.asarray(rng.standard_normal(120), jnp.float32)
    np.testing.assert_allclose(np.asarray(sparse(x)), np.asarray(dense(x)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sparse.adjoint(y)), np.asarray(dense.adjoint(y)), rtol=1e-4, atol=1e-5
    )
    dot_test(sparse)


def test_mdm_sparse_requires_support(rng):
    from pycsou_tpu.ops.sampling import MappedDistanceMatrix

    s = rng.uniform(size=(10, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="support"):
        MappedDistanceMatrix(s, s, lambda d: jnp.exp(-d), backend="sparse")
    # explicit radius works for kernels without a .support attribute
    op = MappedDistanceMatrix(s, s, lambda d: jnp.maximum(1 - d / 0.3, 0.0), backend="sparse", support=0.3)
    x = jnp.asarray(rng.standard_normal(10), jnp.float32)
    assert op(x).shape == (10,)


def test_pooling_pads_non_dividing_blocks(rng, dot_test):
    """Non-dividing block sizes zero-pad like skimage block_reduce
    (reference sampling.py:525-527)."""
    from pycsou_tpu.ops.sampling import Pooling

    x = jnp.asarray(rng.standard_normal((7, 10)), jnp.float32)
    for kind in ("sum", "mean"):
        P = Pooling((7, 10), (3, 4), kind=kind)
        assert P.codim_shape == (3, 3)
        got = np.asarray(P(x))
        xp = np.zeros((9, 12), np.float32)
        xp[:7, :10] = np.asarray(x)
        want = xp.reshape(3, 3, 3, 4).sum(axis=(1, 3))
        if kind == "mean":
            want = want / 12.0
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        dot_test(P)
