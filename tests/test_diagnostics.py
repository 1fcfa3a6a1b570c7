"""MCMC convergence diagnostics (utils/diagnostics.py) + PMYULA integration.

The reference has no sampler diagnostics beyond streamed moments
(/root/reference/pycsou/opt/mcmc.py:126-184); ESS/split-R-hat are validated
here against their analytic values on known processes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pycsou_tpu.utils.diagnostics import autocovariance, effective_sample_size, split_rhat


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_autocovariance_matches_numpy(rng):
    x = rng.standard_normal((3, 64)).astype(np.float32)
    acov = np.asarray(autocovariance(x))
    for c in range(3):
        xc = x[c] - x[c].mean()
        direct = np.array([np.dot(xc[: 64 - t], xc[t:]) / 64 for t in range(64)])
        np.testing.assert_allclose(acov[c], direct, atol=1e-4)


def test_ess_iid_near_full(rng):
    x = rng.standard_normal((4, 2000))
    ess = float(effective_sample_size(x))
    assert 0.5 * 8000 < ess  # iid draws: ESS ~ m*n (estimator noise ~ +-20%)
    assert float(split_rhat(x)) < 1.02


def test_ess_ar1_matches_analytic(rng):
    phi = 0.9
    m, n = 4, 8000
    x = np.zeros((m, n))
    eps = rng.standard_normal((m, n))
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + eps[:, t]
    expected = m * n * (1 - phi) / (1 + phi)  # ~1684
    ess = float(effective_sample_size(x))
    assert 0.5 * expected < ess < 2.0 * expected
    assert float(split_rhat(x)) < 1.05


def test_rhat_detects_nonmixing(rng):
    # two chains stuck at different modes
    x = np.stack([rng.standard_normal(500), 10.0 + rng.standard_normal(500)])
    assert float(split_rhat(x)) > 2.0


def test_single_chain_accepted(rng):
    x = rng.standard_normal(1000)
    assert float(effective_sample_size(x)) > 300
    assert float(split_rhat(x)) < 1.05


def test_pmyula_scalar_diagnostics(rng):
    """PMYULA on a 2-D Gaussian: traces recorded, ESS/R-hat emitted, and the
    chain of a well-mixing sampler diagnoses as converged."""
    from pycsou_tpu.func.loss import SquaredL2Loss
    from pycsou_tpu.opt.mcmc import PMYULA

    F = SquaredL2Loss((4,), jnp.zeros(4))
    sampler = PMYULA(
        (4,),
        F=F,
        scalar_fns=(lambda x: jnp.sum(x), lambda x: jnp.sum(x**2)),
        nb_burnin_iterations=50,
        max_iter=1500,
        min_iter=1400,
        accuracy_threshold=0.0,
        seed=3,
    )
    info = sampler.solve()
    out = info.iterand
    n = int(out["n_samples"])
    assert out["traces"].shape == (2, n) and n > 1000
    assert out["ess"].shape == (2,) and float(out["ess"].min()) > 50.0
    assert float(out["rhat"].max()) < 1.2
    # trace values really are the tracked scalars (spot check the variance
    # trace is positive and the mean trace is centred near 0)
    assert float(jnp.min(out["traces"][1])) > 0.0
    assert abs(float(jnp.mean(out["traces"][0]))) < 1.0
