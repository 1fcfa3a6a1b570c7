"""Penalty/loss tests: prox correctness against closed forms and numpy
reference computations (mirrors the reference's doctest identities, SURVEY §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycsou_tpu.func import (
    KLDivergence,
    L1Ball,
    L1Norm,
    L2Ball,
    L2Norm,
    L21Norm,
    LInftyBall,
    LInftyNorm,
    LogBarrier,
    NonNegativeOrthant,
    QuadraticForm,
    Segment,
    ShannonEntropy,
    SquaredL1Norm,
    SquaredL2Norm,
    SquaredL2Loss,
    L2Loss,
    L1Loss,
    ProximableLoss,
)
from pycsou_tpu.math.prox import lambertw, proj_l1_ball, soft


def _prox_objective(f, x, tau, z):
    """prox definition objective: f(z) + ||z-x||^2/(2 tau)."""
    return float(f(z)) + float(jnp.sum((z - x) ** 2)) / (2 * tau)


def check_prox_is_minimizer(f, x, tau, rng, n_trials=30, scale=0.3):
    """The prox output must (approximately) minimise the prox objective."""
    p = f.prox(x, tau)
    base = _prox_objective(f, x, tau, p)
    for _ in range(n_trials):
        z = p + scale * jnp.asarray(rng.standard_normal(p.shape), dtype=jnp.float32)
        if not np.isfinite(_prox_objective(f, x, tau, z)):
            continue
        assert base <= _prox_objective(f, x, tau, z) + 1e-3


def test_l1_prox_soft(rng):
    f = L1Norm((8,))
    x = jnp.asarray(rng.standard_normal(8), dtype=jnp.float32)
    np.testing.assert_allclose(f.prox(x, 0.4), soft(x, 0.4), rtol=1e-6)
    check_prox_is_minimizer(f, x, 0.4, rng)


def test_l2_prox_block_soft(rng):
    f = L2Norm((8,))
    x = jnp.asarray(rng.standard_normal(8), dtype=jnp.float32)
    tau = 0.7
    expected = jnp.maximum(1 - tau / jnp.linalg.norm(x), 0) * x
    np.testing.assert_allclose(f.prox(x, tau), expected, rtol=1e-5)
    check_prox_is_minimizer(f, x, tau, rng)


def test_sql2_grad_and_prox(rng):
    f = SquaredL2Norm((6,))
    x = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    np.testing.assert_allclose(f.gradient(x), 2 * x, rtol=1e-6)
    np.testing.assert_allclose(f.prox(x, 0.5), x / 2, rtol=1e-6)
    assert f.diff_lipschitz == 2.0


def test_squared_l1_sort_vs_root(rng):
    x = jnp.asarray(rng.standard_normal(10), dtype=jnp.float32)
    f_sort = SquaredL1Norm((10,), prox_computation="sort")
    f_root = SquaredL1Norm((10,), prox_computation="root")
    np.testing.assert_allclose(f_sort.prox(x, 1.0), f_root.prox(x, 1.0), rtol=1e-3, atol=1e-4)
    check_prox_is_minimizer(f_sort, x, 1.0, rng, scale=0.1)


def test_proj_l1_ball_props(rng):
    x = jnp.asarray(rng.standard_normal(12), dtype=jnp.float32) * 3
    p = proj_l1_ball(x, 2.0)
    assert float(jnp.sum(jnp.abs(p))) <= 2.0 + 1e-4
    small = 0.1 * x
    np.testing.assert_allclose(proj_l1_ball(small, 100.0), small, rtol=1e-6)


def test_balls(rng):
    x = jnp.asarray(rng.standard_normal(7), dtype=jnp.float32) * 5
    for ball, norm in [
        (L2Ball((7,), 2.0), lambda v: jnp.linalg.norm(v)),
        (L1Ball((7,), 2.0), lambda v: jnp.sum(jnp.abs(v))),
        (LInftyBall((7,), 2.0), lambda v: jnp.max(jnp.abs(v))),
    ]:
        p = ball.prox(x, 1.0)
        assert float(norm(p)) <= 2.0 + 1e-4
        assert float(ball(p)) == 0.0


def test_linfty_prox_moreau(rng):
    f = LInftyNorm((6,))
    x = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    check_prox_is_minimizer(f, x, 0.5, rng, scale=0.1)


def test_l21_axis_mode(rng):
    f = L21Norm((2, 4, 4), axis=0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4)), dtype=jnp.float32)
    expected = jnp.sum(jnp.sqrt(jnp.sum(x**2, axis=0)))
    np.testing.assert_allclose(f(x), expected, rtol=1e-5)
    tau = 0.4
    norms = jnp.sqrt(jnp.sum(x**2, axis=0, keepdims=True))
    expected_prox = jnp.maximum(1 - tau / norms, 0) * x
    np.testing.assert_allclose(f.prox(x, tau), expected_prox, rtol=1e-5)


def test_l21_groups_mode(rng):
    groups = np.concatenate([np.zeros(5), np.ones(5)])
    f = L21Norm((10,), groups=groups)
    x = jnp.asarray(rng.standard_normal(10), dtype=jnp.float32)
    l2 = L2Norm((5,))
    expected = jnp.concatenate([l2.prox(x[:5], 0.5), l2.prox(x[5:], 0.5)])
    np.testing.assert_allclose(f.prox(x, 0.5), expected, rtol=1e-5)
    # degeneracies (reference penalty.py:525-530)
    assert isinstance(L21Norm((10,), groups=np.arange(10)), L1Norm)
    assert isinstance(L21Norm((10,), groups=np.ones(10)), L2Norm)


def test_indicators(rng):
    x = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    nn = NonNegativeOrthant((6,))
    np.testing.assert_allclose(nn.prox(x, 1.0), jnp.maximum(x, 0), rtol=1e-6)
    seg = Segment((6,), a=-0.5, b=0.5)
    np.testing.assert_allclose(seg.prox(x, 1.0), jnp.clip(x, -0.5, 0.5), rtol=1e-6)


def test_log_barrier(rng):
    f = LogBarrier((5,))
    x = jnp.asarray(rng.standard_normal(5), dtype=jnp.float32)
    p = f.prox(x, 0.3)
    np.testing.assert_allclose(p, (x + jnp.sqrt(x**2 + 4 * 0.3)) / 2, rtol=1e-6)
    assert np.all(np.asarray(p) > 0)
    check_prox_is_minimizer(f, x, 0.3, rng, scale=0.05)


def test_lambertw():
    from scipy.special import lambertw as scipy_w

    z = jnp.asarray([0.0, 0.5, 1.0, 5.0, 100.0], dtype=jnp.float32)
    w = lambertw(z)
    expected = np.real(scipy_w(np.asarray(z, dtype=np.float64)))
    np.testing.assert_allclose(np.asarray(w), expected, rtol=1e-5)


def test_shannon_entropy_prox(rng):
    from scipy.special import lambertw as scipy_w

    f = ShannonEntropy((5,))
    x = jnp.abs(jnp.asarray(rng.standard_normal(5), dtype=jnp.float32)) * 3
    tau = 0.7
    p = f.prox(x, tau)
    expected = np.real(tau * scipy_w(np.exp(-1 + np.asarray(x, np.float64) / tau) / tau))
    np.testing.assert_allclose(np.asarray(p), expected, rtol=1e-4)
    check_prox_is_minimizer(f, x, tau, rng, scale=0.05)


def test_quadratic_form(rng):
    from pycsou_tpu.ops.basic import DenseOperator

    M = rng.standard_normal((5, 5)).astype(np.float32)
    S = DenseOperator(jnp.asarray(M + M.T))
    S.lipschitz = float(S.opnorm())
    q = QuadraticForm((5,), linop=S)
    x = jnp.asarray(rng.standard_normal(5), dtype=jnp.float32)
    np.testing.assert_allclose(q(x), x @ (M + M.T) @ x, rtol=1e-4)
    np.testing.assert_allclose(q.gradient(x), 2 * S(x), rtol=1e-5)
    assert np.isclose(q.diff_lipschitz, 2 * S.lipschitz)


def test_kl_divergence(rng):
    y = jnp.abs(jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)) + 0.5
    f = KLDivergence((6,), data=y)
    x = jnp.abs(jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)) + 0.5
    tau = 0.4
    p = f.prox(x, tau)
    expected = 0.5 * (x - tau + jnp.sqrt((x - tau) ** 2 + 4 * tau * y))
    np.testing.assert_allclose(p, expected, rtol=1e-6)
    check_prox_is_minimizer(f, x, tau, rng, scale=0.05)
    assert float(f(y)) < 1e-5  # D(y||y) = 0


def test_losses_shift_rule(rng):
    y = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    loss = SquaredL2Loss((6,), data=y)
    np.testing.assert_allclose(loss(x), jnp.sum((x - y) ** 2), rtol=1e-5)
    np.testing.assert_allclose(loss.gradient(x), 2 * (x - y), rtol=1e-5)
    assert loss.diff_lipschitz == 2.0

    l1l = L1Loss((6,), data=y)
    np.testing.assert_allclose(l1l.prox(x, 0.5), soft(x - y, 0.5) + y, rtol=1e-5)


def test_loss_compose_operator_is_differentiable(rng):
    """SquaredL2Loss o G must remain a DifferentiableMap with the chain-rule
    beta = 2 ||G||^2 (the auto-step-size input, SURVEY §3.1)."""
    from pycsou_tpu.core.map import DifferentiableMap
    from pycsou_tpu.ops.basic import DenseOperator

    G = DenseOperator(jnp.asarray(rng.standard_normal((7, 5)), dtype=jnp.float32))
    G.lipschitz = float(G.opnorm())
    y = jnp.asarray(rng.standard_normal(7), dtype=jnp.float32)
    F = SquaredL2Loss((7,), data=y) * G
    assert isinstance(F, DifferentiableMap)
    x = jnp.asarray(rng.standard_normal(5), dtype=jnp.float32)
    np.testing.assert_allclose(F.gradient(x), 2 * G.adjoint(G(x) - y), rtol=1e-4)
    assert np.isclose(F.diff_lipschitz, 2 * G.lipschitz**2, rtol=1e-5)
