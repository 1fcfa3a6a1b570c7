"""MCMC convergence diagnostics: effective sample size and split-R-hat.

The reference ships no sampler diagnostics beyond streamed moments/quantiles
(/root/reference/pycsou/opt/mcmc.py:126-184); these fill that gap with the
standard modern pair (Vehtari, Gelman, Simpson, Carpenter, Burkner 2021 —
"Rank-normalization, folding, and localization: an improved R-hat"):

* :func:`effective_sample_size` — multi-chain ESS with FFT autocovariance
  and Geyer's initial-monotone-sequence truncation;
* :func:`split_rhat` — potential scale reduction factor on half-split
  chains (usable on a single chain).

Everything is pure ``jnp`` on static shapes, so the functions run on device
and can be jitted/vmapped over event dimensions — unlike the usual
arviz/numpy post-hoc path, the chains never have to leave HBM.  Geyer's
data-dependent truncation is expressed with masked cumulative ops rather
than a Python loop, keeping it trace-compatible.
"""
from __future__ import annotations

import jax.lax
import jax.numpy as jnp

__all__ = ["autocovariance", "effective_sample_size", "split_rhat"]


def _chains_2d(x) -> jnp.ndarray:
    """Normalise input to (n_chains, n_draws) float32."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2:
        raise ValueError("chains must be (n_draws,) or (n_chains, n_draws); vmap over event dims")
    return x


def autocovariance(x) -> jnp.ndarray:
    """Biased (1/n) autocovariance of each row of ``x`` via one real FFT
    roundtrip; shape (n_chains, n_draws).

    The 1/n normalisation is the one the ESS estimator below expects (it
    makes the Geyer pair sums of a white-noise chain decay, rather than the
    unbiased 1/(n-t) blow-up at large lags).
    """
    x = _chains_2d(x)
    n = x.shape[-1]
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    # next power of two >= 2n to make the circular convolution linear
    nfft = 1 << max(1, int(2 * n - 1).bit_length())
    f = jnp.fft.rfft(xc, n=nfft, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=-1)[:, :n]
    return acov / n


def effective_sample_size(chains) -> jnp.ndarray:
    """Multi-chain effective sample size (scalar).

    ``chains``: (n_chains, n_draws) or (n_draws,).  Implements the Stan/
    Vehtari-et-al estimator: between/within-chain variance pooling, Geyer
    pair sums ``P_k = rho_{2k} + rho_{2k+1}`` truncated at the first
    negative pair and forced monotone non-increasing, then

        ESS = m n / (-1 + 2 sum_k P_k).

    Example — independent draws have ESS ~ n::

        >>> import numpy as np
        >>> from pycsou_tpu.utils.diagnostics import effective_sample_size
        >>> x = np.random.default_rng(0).standard_normal((4, 500))
        >>> bool(float(effective_sample_size(x)) > 1000)
        True

    For i.i.d. draws this is ~ m n; for an AR(1) chain with coefficient
    ``phi`` it approaches ``m n (1 - phi) / (1 + phi)``.
    """
    x = _chains_2d(chains)
    m, n = x.shape
    acov = autocovariance(x)  # (m, n), biased
    mean_acov = jnp.mean(acov, axis=0)  # averaged over chains
    W = jnp.mean(acov[:, 0] * n / (n - 1.0))  # within-chain variance (unbiased)
    if m > 1:
        B_over_n = jnp.var(jnp.mean(x, axis=-1), ddof=1)
        var_plus = W * (n - 1.0) / n + B_over_n
    else:
        var_plus = W * (n - 1.0) / n
    rho = 1.0 - (W - mean_acov) / var_plus  # (n,), rho[0] ~= 1

    # Geyer pair sums over even lags; pad odd tail with zero.
    n_pairs = n // 2
    pair = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
    # truncate at the first non-positive pair (excluding pair 0, which must
    # stay: rho_0 + rho_1 > 0 for any non-degenerate chain)
    pos = pair > 0.0
    keep = jnp.cumprod(pos.at[0].set(True).astype(jnp.int32)) == 1
    # initial monotone sequence: running minimum of the kept pairs
    mono = jax.lax.cummin(jnp.where(keep, pair, 0.0))
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(keep, jnp.maximum(mono, 0.0), 0.0))
    ess = (m * n) / jnp.maximum(tau, 1.0 / (m * n))
    # cap at m*n*log10(m*n) as in Stan (antithetic chains can exceed m*n)
    return jnp.minimum(ess, m * n * jnp.log10(jnp.asarray(float(m * n))))


def split_rhat(chains) -> jnp.ndarray:
    """Split-:math:`\\hat R` (potential scale reduction factor, scalar).

    Each chain is split in half (so a single chain still yields a valid
    diagnostic); values near 1 (< 1.01) indicate convergence of the chain's
    first two moments.

    Example — stationary chains give R-hat near 1::

        >>> import numpy as np
        >>> from pycsou_tpu.utils.diagnostics import split_rhat
        >>> x = np.random.default_rng(0).standard_normal((4, 500))
        >>> bool(abs(float(split_rhat(x)) - 1.0) < 0.05)
        True
    """
    x = _chains_2d(chains)
    m, n = x.shape
    half = n // 2
    x = jnp.concatenate([x[:, :half], x[:, n - half :]], axis=0)  # (2m, half)
    cm = jnp.mean(x, axis=-1)
    W = jnp.mean(jnp.var(x, axis=-1, ddof=1))
    B_over_n = jnp.var(cm, ddof=1)
    var_plus = W * (half - 1.0) / half + B_over_n
    return jnp.sqrt(var_plus / W)
