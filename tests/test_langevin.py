"""Fused PMYULA Langevin kernel (kernels/langevin.py) vs the generic chain.

Interpret mode streams pre-drawn noise (Mosaic PRNG does not lower on CPU),
so the fused step is checked against the generic update with the SAME noise
— exact parity, not a statistical test.  The in-kernel PRNG path runs on
real TPU only (bench.py mcmc row; noise moments checked there).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _plans(rng, H, W, K=9):
    from pycsou_tpu.kernels.tv import (
        make_mega2_lane_plan,
        make_mega3_corr_mats,
        make_mega_band,
    )
    from pycsou_tpu.ops.conv import Convolve2D, SeparableConvGram2D

    ax = np.arange(K) - K // 2
    filt = np.outer(np.exp(-(ax**2) / 8.0), np.exp(-(ax**2) / 4.0)).astype(np.float32)
    filt /= filt.sum()
    A = Convolve2D((H, W), filt)
    gram = A.gram
    assert isinstance(gram, SeparableConvGram2D)
    R = 32
    B = jnp.asarray(make_mega_band(gram.g_rows_acorr, r=R))
    C, F = make_mega2_lane_plan(gram.g_cols_taps, W)
    _, L_r, _, _ = gram.g_meta
    Et, Eb = make_mega3_corr_mats(gram.g_rows_E, L_r)
    return A, gram, B, jnp.asarray(C), jnp.asarray(F), jnp.asarray(Et), jnp.asarray(Eb)


@pytest.mark.parametrize("prox_mode,lam", [("none", 0.0), ("nonneg", 0.0), ("l1", 0.03)])
@pytest.mark.parametrize("w", [1.0, 0.0])
def test_pmyula_kernel_matches_generic_update(rng, prox_mode, lam, w):
    from pycsou_tpu.kernels.langevin import pmyula_mega_step

    H, W = 64, 384
    A, gram, B, C, F, Et, Eb = _plans(rng, H, W)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    m1 = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    m2 = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    gamma, tau = 0.07, 0.2
    si = jnp.zeros((2,), jnp.int32)
    xn, m1n, m2n = pmyula_mega_step(
        x, atb, m1, m2, si, jnp.asarray([w], jnp.float32), B, C, F, Et, Eb,
        gamma=gamma, tau=tau, lam=lam, prox_mode=prox_mode,
        noise_mode="stream", noise=xi, interpret=True,
    )
    # generic update with the same noise (reference mcmc.py:113-118)
    g = 2.0 * (gram.apply(x) - atb)
    ns = np.sqrt(2 * gamma)
    if prox_mode == "none":
        ref = x - gamma * g + ns * xi
    else:
        if prox_mode == "nonneg":
            p = jnp.maximum(x, 0.0)
        else:
            thr = tau * lam
            p = jnp.sign(x) * jnp.maximum(jnp.abs(x) - thr, 0.0)
        ref = (1 - gamma / tau) * x - gamma * g + (gamma / tau) * p + ns * xi
    np.testing.assert_allclose(np.asarray(xn), np.asarray(ref), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(m1n), np.asarray(m1 + w * xn), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2n), np.asarray(m2 + w * xn * xn), rtol=1e-6, atol=1e-6
    )


def test_pmyula_solver_fused_matches_generic_chain(rng):
    """PMYULA(use_pallas='interpret') — the fused engine with streamed noise
    — produces the generic chain's samples and moments EXACTLY (the key is
    split identically, so both draw the same xi)."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L1Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.opt.mcmc import PMYULA

    H, W = 64, 384
    g1 = np.exp(-((np.arange(7) - 3) ** 2) / 4.0)
    h = np.outer(g1, g1).astype(np.float32)
    h /= h.sum()
    A = Convolve2D((H, W), h)
    y = A(jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32))
    mk = lambda up: PMYULA(
        (H, W), F=SquaredL2Loss((H, W), data=y) * A, G=0.02 * L1Norm((H, W)),
        seed=7, nb_burnin_iterations=3, use_pallas=up, max_iter=100,
    )
    fused, generic = mk("interpret"), mk("auto")
    assert fused.engine == "megal-interpret"
    assert generic.engine == ""  # CPU backend: generic chain
    st_f = fused.run_fixed(12)
    st_g = generic.run_fixed(12)
    np.testing.assert_allclose(
        np.asarray(st_f["x"]), np.asarray(st_g["x"]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_f["mmse_raw"]), np.asarray(st_g["mmse_raw"]), rtol=2e-4, atol=2e-4
    )
    assert int(st_f["count"]) == int(st_g["count"]) > 0


def test_pmyula_fused_gating():
    """Trackers (linops/pvalues/scalar_fns) and non-matching G keep the
    generic chain; gates never raise."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.ops.basic import IdentityOperator
    from pycsou_tpu.opt.mcmc import PMYULA

    H, W = 64, 384
    y = jnp.zeros((H, W))
    s = PMYULA(
        (H, W), F=SquaredL2Loss((H, W), data=y), use_pallas="interpret",
        pvalues=(0.5,),
    )
    assert s.engine == ""  # P2 tracking: generic chain
    s2 = PMYULA(
        (H, W), F=SquaredL2Loss((H, W), data=y), use_pallas="interpret",
        linops=[IdentityOperator((H, W))],
    )
    assert s2.engine == ""
    # denoise posterior with no G: fused, prox_mode 'none'
    s3 = PMYULA((H, W), F=SquaredL2Loss((H, W), data=y), use_pallas="interpret")
    assert s3.engine == "megal-interpret" and s3._prox_mode == "none"


def test_pmyula_strip_pallas_twin():
    """with_shardings / strip_pallas drops the fused engine (pallas does not
    partition); the twin runs the generic chain."""
    from pycsou_tpu._module import strip_pallas
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.opt.mcmc import PMYULA

    H, W = 64, 384
    s = PMYULA((H, W), F=SquaredL2Loss((H, W), data=jnp.zeros((H, W))),
               use_pallas="interpret")
    assert s.engine == "megal-interpret"
    twin = strip_pallas(s)
    assert twin.engine == "" and twin._lg_B is None
    st = twin.run_fixed(3)  # generic chain executes
    assert st["x"].shape == (H, W)
