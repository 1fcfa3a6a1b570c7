"""Auxiliary subsystem tests: checkpoint/resume, stacks with Jacobians,
misc utilities."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_checkpoint_roundtrip(rng, tmp_path):
    from pycsou_tpu.utils.checkpoint import latest_checkpoint, load_state, save_state

    state = {
        "x": jnp.asarray(rng.standard_normal(8), dtype=jnp.float32),
        "it": jnp.asarray(42, jnp.int32),
        "nested": {"t": jnp.asarray(1.5, jnp.float32)},
    }
    path = os.path.join(str(tmp_path), "ckpt", "step_42")
    save_state(path, state)
    restored = load_state(path, template=state)
    np.testing.assert_allclose(restored["x"], state["x"], rtol=1e-6)
    assert int(restored["it"]) == 42
    assert latest_checkpoint(os.path.join(str(tmp_path), "ckpt")).endswith("step_42")


def test_solver_checkpoint_resume(rng, tmp_path):
    """A solve interrupted mid-way resumes from the persisted state and
    reaches the same solution."""
    from pycsou_tpu.func import L1Norm, SquaredL2Loss
    from pycsou_tpu.ops.basic import DenseOperator
    from pycsou_tpu.opt import APGD

    A = DenseOperator(jnp.asarray(rng.standard_normal((20, 12)) / 4, dtype=jnp.float32))
    A.compute_lipschitz_cst()
    y = A(jnp.asarray(rng.standard_normal(12), dtype=jnp.float32))
    F = SquaredL2Loss((20,), data=y) * A
    G = 0.1 * L1Norm((12,))

    ckpt = str(tmp_path / "run")
    # phase 1: budget only 50 iterations, checkpoint
    s1 = APGD((12,), F=F, G=G, max_iter=50, min_iter=50, verbose=25)
    info1 = s1.solve(checkpoint_dir=ckpt)
    assert info1.n_iter == 50
    # phase 2: same problem, higher budget -> resumes at 50
    s2 = APGD((12,), F=F, G=G, max_iter=600, accuracy_threshold=1e-9, min_iter=60, verbose=50)
    info2 = s2.solve(checkpoint_dir=ckpt)
    assert info2.n_iter > 50
    # matches an uninterrupted solve
    ref = APGD((12,), F=F, G=G, max_iter=600, accuracy_threshold=1e-9, min_iter=60).solve()
    np.testing.assert_allclose(np.asarray(info2["x_temp"]), np.asarray(ref["x_temp"]), atol=1e-5)


def test_diffmap_stacks(rng, dot_test):
    from pycsou_tpu.func.penalty import SquaredL2Norm
    from pycsou_tpu.ops.stack import DiffMapStack

    f1 = SquaredL2Norm((6,))
    f2 = SquaredL2Norm((6,))
    v = DiffMapStack([f1, f2], axis=0)
    x = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    np.testing.assert_allclose(v(x), jnp.stack([f1(x), f2(x)]), rtol=1e-5)
    assert np.isclose(v.diff_lipschitz, np.sqrt(8))
    J = v.jacobianT(x)
    # J^T [1, 0] = grad f1
    np.testing.assert_allclose(J(jnp.asarray([1.0, 0.0])), 2 * x, rtol=1e-5)
    dot_test(J)

    h = DiffMapStack([f1, f2], axis=1)
    x2 = jnp.asarray(rng.standard_normal((2, 6)), dtype=jnp.float32)
    np.testing.assert_allclose(h(x2), f1(x2[0]) + f2(x2[1]), rtol=1e-5)
    assert h.diff_lipschitz == 2.0


def test_peaks():
    from pycsou_tpu.utils.misc import peaks

    v = peaks(jnp.asarray(0.0), jnp.asarray(0.0))
    expected = 3 * np.exp(-1) - 1 / 3 * np.exp(-1)
    np.testing.assert_allclose(float(v), expected, rtol=1e-5)


def test_profiling_device_time(rng):
    from pycsou_tpu.utils.profiling import device_time

    f = jax.jit(lambda x: x * 2)
    x = jnp.ones(128)
    t = device_time(f, x, reps=3)
    assert t >= 0


# -------------------- spectral robustness (VERDICT r1 task 6) --------------


def test_cond_ill_conditioned(rng):
    """cond() is trustworthy on an ill-conditioned operator via the
    spectrum-fold / CG shift-invert smallest-singular-value paths."""
    import jax.numpy as jnp

    from pycsou_tpu.ops.basic import DenseOperator

    n = 40
    U, _ = np.linalg.qr(rng.standard_normal((n, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.geomspace(1e-3, 1.0, n)  # cond = 1000
    M = (U * s) @ V.T
    A = DenseOperator(jnp.asarray(M, jnp.float32))
    true_cond = np.linalg.cond(M)
    # fold pays an f32 cancellation penalty at high condition numbers
    # (extracting lambda_min = c - lambda_max(folded)); shift-invert is sharp
    for method, tol in (("fold", 0.2), ("shift-invert", 0.05)):
        c = A.cond(maxiter=64, method=method)
        assert abs(c - true_cond) / true_cond < tol, (method, c)
        sv_min = float(A.singularvals(1, "SM", maxiter=64, method=method)[0])
        assert abs(sv_min - s[0]) / s[0] < tol, (method, sv_min)


def test_smallest_eig_psd_direct(rng):
    import jax.numpy as jnp

    from pycsou_tpu.core.linop import SymmetricLinearOperator
    from pycsou_tpu.ops.basic import DenseOperator
    from pycsou_tpu.utils.opnorm import smallest_eig_psd

    n = 24
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.geomspace(0.01, 5.0, n)
    M = (Q * lam) @ Q.T
    A = SymmetricLinearOperator(DenseOperator(jnp.asarray(M, jnp.float32)))
    got = smallest_eig_psd(A, maxiter=48)
    assert abs(got - 0.01) / 0.01 < 0.05
    got_si = smallest_eig_psd(A, maxiter=48, method="shift-invert")
    assert abs(got_si - 0.01) / 0.01 < 0.05
    # eigenvals(which='SM') routes through the robust path now
    sm = float(np.real(A.eigenvals(1, which="SM", maxiter=48)[0]))
    assert abs(sm - 0.01) / 0.01 < 0.05


def test_nonsymmetric_eigenvals_arnoldi(rng):
    """Non-symmetric eigenvals run the on-device Arnoldi (VERDICT r2 task 7):
    no scipy, no host round-trips, no warning; with a complete Krylov space
    the Ritz values are the exact spectrum."""
    import warnings

    import jax.numpy as jnp

    from pycsou_tpu.ops.basic import DenseOperator

    M = rng.standard_normal((12, 12)).astype(np.float32)
    A = DenseOperator(jnp.asarray(M))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ev = A.eigenvals(2, which="LM", symmetric=False)
        assert not any("host-side" in str(x.message) for x in w)
    assert np.iscomplexobj(np.asarray(ev))
    want = np.linalg.eigvals(M)
    want = want[np.argsort(-np.abs(want))][:2]
    np.testing.assert_allclose(np.sort(np.abs(ev)), np.sort(np.abs(want)), rtol=1e-3)
    # complex eigenvalue pairs of a real matrix come out conjugate-paired
    np.testing.assert_allclose(
        np.sort(np.asarray(ev).real), np.sort(want.real), rtol=1e-3, atol=1e-4
    )


def test_dct_fft_path_matches_scipy(rng):
    """The TPU DCT path (length-4N odd-embedding rFFT + linear_transpose
    inverse — jax.scipy dctn is UNIMPLEMENTED on the axon TPU backend)
    reproduces scipy's orthonormal DCT-II/III exactly."""
    import jax
    import jax.numpy as jnp
    from scipy.fft import dctn as sdctn, idctn as sidctn

    from pycsou_tpu.ops.transform import _dct2_1d_fft

    x = rng.standard_normal((8, 12)).astype(np.float32)
    y = _dct2_1d_fft(_dct2_1d_fft(jnp.asarray(x), 0), 1)
    np.testing.assert_allclose(
        np.asarray(y), sdctn(x, type=2, norm="ortho"), atol=2e-6
    )
    fwd = lambda v: _dct2_1d_fft(_dct2_1d_fft(v, 0), 1)
    (xi,) = jax.linear_transpose(fwd, jnp.zeros((8, 12)))(jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(xi), sidctn(np.asarray(y), type=2, norm="ortho"), atol=2e-6
    )
