"""PMYULA sampler and P^2 streaming quantile tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycsou_tpu.func import SquaredL2Loss, L1Norm
from pycsou_tpu.opt.mcmc import PMYULA
from pycsou_tpu.utils.stats import P2Algorithm, p2_add, p2_init, p2_quantile


def test_p2_accuracy_vs_empirical(rng):
    samples = rng.standard_normal((15000, 3)).astype(np.float32)
    state = p2_init(0.9, (3,))

    def run(state, xs):
        def body(s, x):
            return p2_add(s, x), None

        s, _ = jax.lax.scan(body, state, xs)
        return s

    state = jax.jit(run)(state, jnp.asarray(samples))
    est = np.asarray(p2_quantile(state))
    emp = np.quantile(samples, 0.9, axis=0)
    np.testing.assert_allclose(est, emp, rtol=2e-2)


def test_p2_host_wrapper(rng):
    p2 = P2Algorithm(pvalue=0.5)
    xs = rng.standard_normal(3000).astype(np.float32)
    for v in xs[:200]:
        p2.add_sample(v)
    med = p2.q
    assert abs(float(med) - np.median(xs[:200])) < 0.2


def test_pmyula_gaussian(rng):
    """ULA on a Gaussian target: mean and std must match (gamma-biased)."""
    dim = 16
    mu = 2.0 * jnp.ones(dim)
    F = 0.5 * SquaredL2Loss((dim,), data=mu)  # -log pi = ||x - mu||^2 / 2
    sampler = PMYULA(
        (dim,),
        F=F,
        gamma=0.05,
        tau=1.0,
        x0=mu,
        nb_burnin_iterations=500,
        max_iter=6000,
        min_iter=6000,
        accuracy_threshold=0.0,
        pvalues=(0.5,),
        seed=3,
    )
    info = sampler.solve()
    out = info.iterand
    assert int(out["n_samples"]) > 4000
    mmse = np.asarray(out["mmse"])
    std = np.asarray(out["std"])
    assert abs(mmse.mean() - 2.0) < 0.15
    assert abs(std.mean() - 1.0) < 0.2
    med = np.asarray(out["quantiles"][0.5])
    assert abs(med.mean() - 2.0) < 0.25


def test_pmyula_with_prox_and_linops(rng):
    from pycsou_tpu.ops.basic import DiagonalOperator

    dim = 8
    y = jnp.zeros(dim)
    F = 0.5 * SquaredL2Loss((dim,), data=y)
    G = 0.5 * L1Norm((dim,))
    op = DiagonalOperator(2.0 * jnp.ones(dim))
    sampler = PMYULA(
        (dim,),
        F=F,
        G=G,
        nb_burnin_iterations=100,
        max_iter=1500,
        min_iter=1500,
        accuracy_threshold=0.0,
        linops=[op],
        pvalues=(0.25, 0.75),
        seed=0,
    )
    out = sampler.solve().iterand
    # tracked operator stats consistent: mmse_op == 2 * mmse elementwise
    np.testing.assert_allclose(
        np.asarray(out["mmse_linops"][0]), 2 * np.asarray(out["mmse"]), rtol=1e-4, atol=1e-5
    )
    q25 = np.asarray(out["quantiles"][0.25])
    q75 = np.asarray(out["quantiles"][0.75])
    assert np.all(q25 <= q75)
    # symmetric target centred at 0
    assert abs(np.asarray(out["mmse"]).mean()) < 0.3
