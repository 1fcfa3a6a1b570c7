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


# ---------------------------------------------------------------------------
# Mega kernel (row-Gram fused into the sweep stencil)
# ---------------------------------------------------------------------------


def _mega_problem(rng, H, W, K):
    """Rank-1 Gaussian blur problem + the mega-kernel inputs for one step."""
    from pycsou_tpu.kernels.band import gram_band_cols
    from pycsou_tpu.kernels.tv import MEGA_HG, make_mega_band
    from pycsou_tpu.ops.conv import Convolve2D, SeparableConvGram2D

    ax = np.arange(K) - K // 2
    g1 = np.exp(-(ax**2) / (2 * 2.0**2))
    filt = np.outer(g1, g1).astype(np.float32)
    filt /= filt.sum()
    A = Convolve2D((H, W), filt)
    gram = A.gram
    assert isinstance(gram, SeparableConvGram2D) and gram.g_meta is not None
    B = jnp.asarray(make_mega_band(gram.g_rows_acorr))

    _, L_r, lead_c, L_c = gram.g_meta
    Ec = gram.g_cols_E

    def colgram_and_corr(x):
        w = gram_band_cols(
            x,
            (
                (gram.g_cols_band[0], gram.g_cols_band[1], lead_c),
                Ec[0] if Ec is not None else None,
                Ec[1] if Ec is not None else None,
                L_c,
            ),
        )
        Etr, Ebr = gram.g_rows_E
        K1 = Etr.shape[0]
        top = 2.0 * jnp.matmul(Etr, w[:L_r])
        bot = 2.0 * jnp.matmul(Ebr, w[-L_r:])
        corr = (
            jnp.zeros((2 * MEGA_HG, W), x.dtype)
            .at[:K1].set(top)
            .at[2 * MEGA_HG - K1 :].set(bot)
        )
        return w, corr

    return gram, B, colgram_and_corr


@pytest.mark.parametrize("shape,K", [((128, 160), 15), ((96, 128), 9), ((64, 256), 15), ((128, 128), 5)])
@pytest.mark.parametrize("nonneg", [True, False])
def test_mega_step_matches_gram_plus_xla(rng, shape, K, nonneg):
    """Fused gram+stencil kernel == (full Gram, then XLA stencil oracle)."""
    from pycsou_tpu.kernels.tv import tv_pds_mega_step

    H, W = shape
    gram, B, colgram_and_corr = _mega_problem(rng, H, W, K)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)), jnp.float32) * 0.1
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.05, nonneg=nonneg)

    g_ref = 2.0 * (gram.apply(x) - atb)
    x2, z2 = tv_pds_stencil_step_xla(x, z, g_ref, **kw)

    w, corr = colgram_and_corr(x)
    x1, z1 = tv_pds_mega_step(x, z, w, atb, corr, B, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=3e-5, atol=3e-6)


def test_mega_step_iterated(rng):
    """Repeated fused steps track (Gram + XLA oracle) through real dynamics."""
    from pycsou_tpu.kernels.tv import tv_pds_mega_step

    H, W = 96, 128
    gram, B, colgram_and_corr = _mega_problem(rng, H, W, 15)
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    x1 = x2 = jnp.zeros((H, W), jnp.float32)
    z1 = z2 = jnp.zeros((2, H, W), jnp.float32)
    kw = dict(tau=0.1, sigma=0.1, rho=0.9, lam=0.05, nonneg=True)
    for _ in range(5):
        w, corr = colgram_and_corr(x1)
        x1, z1 = tv_pds_mega_step(x1, z1, w, atb, corr, B, interpret=True, **kw)
        g2 = 2.0 * (gram.apply(x2) - atb)
        x2, z2 = tv_pds_stencil_step_xla(x2, z2, g2, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-4, atol=1e-5)


def test_mega_band_reach_guard():
    from pycsou_tpu.kernels.tv import make_mega_band

    with pytest.raises(ValueError):
        make_mega_band(np.ones(35))  # K-1 = 17 > MEGA_HG - 1


# ---------------------------------------------------------------------------
# Mega2 kernel (BOTH Gram directions fused: in-kernel MXU lane Gram)
# ---------------------------------------------------------------------------


def _mega2_problem(rng, H, W, K):
    from pycsou_tpu.kernels.tv import make_mega2_lane_plan, make_mega_band
    from pycsou_tpu.ops.conv import Convolve2D, SeparableConvGram2D
    from pycsou_tpu.opt.tv import TVDeconvolution

    ax = np.arange(K) - K // 2
    g1 = np.exp(-(ax**2) / (2 * 2.0**2))
    g2 = np.exp(-(ax**2) / (2 * 1.3**2))
    filt = np.outer(g1, g2).astype(np.float32)
    filt /= filt.sum()
    A = Convolve2D((H, W), filt)
    gram = A.gram
    assert isinstance(gram, SeparableConvGram2D) and gram.g_meta is not None
    B = jnp.asarray(make_mega_band(gram.g_rows_acorr))
    C, F = make_mega2_lane_plan(gram.g_cols_taps, W)
    solver = TVDeconvolution.__new__(TVDeconvolution)
    solver.gram = gram
    return gram, B, jnp.asarray(C), jnp.asarray(F), lambda x: TVDeconvolution._mega2_corr(solver, x)


@pytest.mark.parametrize("shape,K", [((64, 384), 15), ((32, 512), 9), ((128, 384), 5), ((64, 384), 4)])
@pytest.mark.parametrize("nonneg", [True, False])
def test_mega2_step_matches_gram_plus_xla(rng, shape, K, nonneg):
    """Fully fused (lane Gram + row Gram + stencil) kernel == oracle."""
    from pycsou_tpu.kernels.tv import tv_pds_mega2_step

    H, W = shape
    gram, B, C, F, corr_of = _mega2_problem(rng, H, W, K)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)), jnp.float32) * 0.1
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.05, nonneg=nonneg)

    g_ref = 2.0 * (gram.apply(x) - atb)
    x2, z2 = tv_pds_stencil_step_xla(x, z, g_ref, **kw)
    x1, za, zb, stats = tv_pds_mega2_step(x, z[0], z[1], atb, corr_of(x), B, C, F, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(jnp.stack([za, zb])), np.asarray(z2), rtol=3e-5, atol=3e-6)
    # kernel-epilogue metric partial sums == full-array reductions
    want = [
        float(jnp.sum((x1 - x) ** 2)), float(jnp.sum(x * x)),
        float(jnp.sum((za - z[0]) ** 2)), float(jnp.sum(z[0] ** 2)),
        float(jnp.sum((zb - z[1]) ** 2)), float(jnp.sum(z[1] ** 2)),
    ]
    np.testing.assert_allclose(np.asarray(stats[0, :6]), want, rtol=1e-4)
    assert not np.any(np.asarray(stats[0, 6:])) and not np.any(np.asarray(stats[1:]))


def test_mega2_step_iterated(rng):
    from pycsou_tpu.kernels.tv import tv_pds_mega2_step

    H, W = 96, 384
    gram, B, C, F, corr_of = _mega2_problem(rng, H, W, 15)
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    x1 = x2 = jnp.zeros((H, W), jnp.float32)
    z1 = z2 = jnp.zeros((2, H, W), jnp.float32)
    kw = dict(tau=0.1, sigma=0.1, rho=0.9, lam=0.05, nonneg=True)
    for _ in range(5):
        x1, za, zb, _ = tv_pds_mega2_step(x1, z1[0], z1[1], atb, corr_of(x1), B, C, F, interpret=True, **kw)
        z1 = jnp.stack([za, zb])
        g2 = 2.0 * (gram.apply(x2) - atb)
        x2, z2 = tv_pds_stencil_step_xla(x2, z2, g2, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-4, atol=1e-5)


def test_mega2_lane_plan_guards():
    from pycsou_tpu.kernels.tv import make_mega2_lane_plan

    taps = np.exp(-((np.arange(15) - 7.0) ** 2) / 8.0)
    with pytest.raises(ValueError):
        make_mega2_lane_plan(taps, 256)  # W < 384
    with pytest.raises(ValueError):
        make_mega2_lane_plan(taps, 4100)  # W % 128 != 0
    with pytest.raises(ValueError):
        make_mega2_lane_plan(np.ones(70), 512)  # reach > one corner


# ---------------------------------------------------------------------------
# Mega3 kernel (TWO fused iterations per pass)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,K", [((64, 384), 15), ((96, 512), 9), ((64, 384), 4), ((64, 384), 1)])
def test_mega3_double_step_matches_two_oracle_iterations(rng, shape, K):
    from pycsou_tpu.kernels.tv import (
        make_mega2_lane_plan,
        make_mega3_corr_mats,
        make_mega_band,
        tv_pds_mega3_step,
    )
    from pycsou_tpu.ops.conv import Convolve2D

    H, W = shape
    if K == 1:
        filt = np.ones((1, 1), np.float32)
    else:
        ax = np.arange(K) - K // 2
        filt = np.outer(np.exp(-(ax**2) / 8.0), np.exp(-(ax**2) / 3.4)).astype(np.float32)
        filt /= filt.sum()
    gram = Convolve2D((H, W), filt).gram
    R = 32
    B = jnp.asarray(make_mega_band(gram.g_rows_acorr, r=R))
    C, F = make_mega2_lane_plan(gram.g_cols_taps, W)
    _, L_r, _, _ = gram.g_meta
    Et_p, Eb_p = make_mega3_corr_mats(gram.g_rows_E, L_r)
    Cj, Fj, Etj, Ebj = map(jnp.asarray, (C, F, Et_p, Eb_p))

    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)), jnp.float32) * 0.1
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.05, nonneg=True)

    x2, z2 = x, z
    xm, zm = x, z  # mid state (after ONE oracle iteration)
    for k in range(2):
        g_ref = 2.0 * (gram.apply(x2) - atb)
        x2, z2 = tv_pds_stencil_step_xla(x2, z2, g_ref, **kw)
        if k == 0:
            xm, zm = x2, z2

    x1, za, zb, stats = tv_pds_mega3_step(
        x, z[0], z[1], atb, B, Cj, Fj, Etj, Ebj, mega_r=R, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(jnp.stack([za, zb])), np.asarray(z2), rtol=3e-5, atol=3e-6)
    # stats measure the SECOND iteration only (single-iteration stopping
    # semantics for the double-step engine, VERDICT r2 task 4)
    want = [
        float(jnp.sum((x2 - xm) ** 2)), float(jnp.sum(xm * xm)),
        float(jnp.sum((z2[0] - zm[0]) ** 2)), float(jnp.sum(zm[0] ** 2)),
        float(jnp.sum((z2[1] - zm[1]) ** 2)), float(jnp.sum(zm[1] ** 2)),
    ]
    np.testing.assert_allclose(np.asarray(stats[0, :6]), want, rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("shape,K0,K1", [((64, 384), 9, 13), ((48, 384), 8, 7), ((64, 512), 15, 15)])
def test_sepconv_sweep_matches_fft(rng, shape, K0, K1):
    """Fused one-pass rank-1 'same' conv sweep (kernels/conv2d.py) == the FFT
    oracle, forward AND adjoint (interpret mode; bf16x3 tolerance)."""
    from pycsou_tpu.kernels.conv2d import make_sepconv_plan, sepconv2d_sweep
    from pycsou_tpu.ops.conv import Convolve2D

    H, W = shape
    u = rng.standard_normal(K0)
    v = rng.standard_normal(K1)
    filt = np.outer(u, v).astype(np.float32)
    o0, o1 = K0 // 2, K1 // 2
    pf = make_sepconv_plan(u, v, o0, o1, (H, W))
    pa = make_sepconv_plan(u[::-1], v[::-1], K0 - 1 - o0, K1 - 1 - o1, (H, W))
    assert pf is not None and pa is not None
    B, C, r = pf
    Ba, Ca, ra = pa
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    A = Convolve2D((H, W), filt, method="fft")
    scale = float(np.abs(filt).sum())
    y1 = sepconv2d_sweep(x, B, C, r=r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(A.apply(x)), rtol=1e-4, atol=3e-5 * scale
    )
    y2 = sepconv2d_sweep(x, Ba, Ca, r=ra, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(A.adjoint(x)), rtol=1e-4, atol=3e-5 * scale
    )


def test_sepconv_plan_gates():
    """Shapes/reaches outside the sweep window return None (band fallback)."""
    from pycsou_tpu.kernels.conv2d import make_sepconv_plan

    u = np.ones(5)
    assert make_sepconv_plan(u, u, 2, 2, (64, 256)) is None  # W < 384
    assert make_sepconv_plan(u, u, 2, 2, (63, 384)) is None  # H % 8
    assert make_sepconv_plan(np.ones(41), u, 20, 2, (64, 384)) is None  # row reach
    assert make_sepconv_plan(u, u, 2, 2, (64, 384)) is not None
    # rank gates: (K, rank) stacks qualify up to rank 4; rank mismatch/5+ -> None
    u2 = np.ones((5, 2))
    assert make_sepconv_plan(u2, u2, 2, 2, (64, 384)) is not None
    assert make_sepconv_plan(u2, np.ones((5, 3)), 2, 2, (64, 384)) is None
    u5 = np.ones((5, 5))
    assert make_sepconv_plan(u5, u5, 2, 2, (64, 384)) is None


@pytest.mark.parametrize("rank,K0,K1", [(2, 9, 7), (3, 7, 9), (4, 5, 5)])
def test_sepconv_sweep_lowrank(rng, rank, K0, K1):
    """Rank 2-4 fused sweeps: in-kernel rank accumulation == the FFT oracle
    for forward, adjoint AND the two-sweep Gram (VERDICT r2 task 5)."""
    from pycsou_tpu.kernels.conv2d import make_sepconv_plan, sepconv2d_sweep
    from pycsou_tpu.ops.conv import Convolve2D

    H, W = 64, 384
    u = rng.standard_normal((K0, rank))
    v = rng.standard_normal((K1, rank))
    filt = (u @ v.T).astype(np.float32)
    o0, o1 = K0 // 2, K1 // 2
    B, C, r = make_sepconv_plan(u, v, o0, o1, (H, W))
    Ba, Ca, ra = make_sepconv_plan(u[::-1], v[::-1], K0 - 1 - o0, K1 - 1 - o1, (H, W))
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    A = Convolve2D((H, W), filt, method="fft")
    scale = float(np.abs(filt).sum())
    y1 = sepconv2d_sweep(x, B, C, r=r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(A.apply(x)), rtol=1e-4, atol=3e-5 * scale
    )
    y2 = sepconv2d_sweep(x, Ba, Ca, r=ra, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(A.adjoint(x)), rtol=1e-4, atol=3e-5 * scale
    )
    # adjoint-sweep o forward-sweep == A^H A (the SeparableConvGram2D sweep
    # route; exact composition of exact 'same' convs — no edge corrections)
    g1 = sepconv2d_sweep(y1, Ba, Ca, r=ra, interpret=True)
    np.testing.assert_allclose(
        np.asarray(g1),
        np.asarray(A.adjoint(A.apply(x))),
        rtol=1e-4,
        atol=3e-5 * scale * scale,
    )


@pytest.mark.parametrize(
    "rank,K0,K1,H",
    [
        (1, 9, 9, 96),
        (2, 9, 7, 96),
        (3, 7, 7, 96),
        # max row reach the plan admits (31 taps -> reach 15 = HG - 1):
        # exercises the full HG-row tail windows and the last1/last2 masks
        (2, 31, 31, 96),
        # H % 32 != 0 -> the R = 16 tile path (tail slice == half a tile)
        (2, 9, 9, 80),
    ],
)
def test_megar_step_matches_oracle(rng, rank, K0, K1, H):
    """Fused rank-r TV step (kernels/tvr.py): forward+adjoint sweeps +
    stencil in ONE kernel == gram-gradient + XLA stencil oracle, chained
    over 3 iterations (ring coverage across 3 tiles), stats included."""
    from pycsou_tpu.kernels.tv import tv_pds_stencil_step_xla
    from pycsou_tpu.kernels.tvr import make_megar_plan, tv_pds_megar_step
    from pycsou_tpu.ops.conv import Convolve2D, lowrank_factors

    W = 384
    u = rng.standard_normal((K0, rank)) * 0.3
    v = rng.standard_normal((K1, rank)) * 0.3
    filt = (u @ v.T).astype(np.float32)
    filt /= np.abs(filt).sum()  # normalized like a physical PSF: keeps the
    # oracle comparison scale-free (bf16x3 rel err ~7e-6 x operator norm)
    fac = lowrank_factors(filt)
    assert fac is not None and fac[0].shape[1] == rank
    Bf, Cf, Ba, Ca, R = make_megar_plan(fac[0], fac[1], (H, W))
    A = Convolve2D((H, W), filt, method="fft")
    y = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    atb = A.adjoint(y)
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.1, nonneg=True)
    x = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    z0 = z1 = jnp.zeros((H, W), jnp.float32)
    x_o, z_o = x, jnp.stack([z0, z1])
    for it in range(3):
        xm, z0m, z1m, stats = tv_pds_megar_step(
            x, z0, z1, atb, Bf, Cf, Ba, Ca, mega_r=R, interpret=True, **kw
        )
        g = 2.0 * (A.adjoint(A.apply(x_o)) - atb)
        x_r, z_r = tv_pds_stencil_step_xla(x_o, z_o, g, **kw)
        np.testing.assert_allclose(np.asarray(xm), np.asarray(x_r), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(z0m), np.asarray(z_r[0]), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(z1m), np.asarray(z_r[1]), rtol=3e-4, atol=3e-5)
        want = [
            float(jnp.sum((xm - x_o) ** 2)), float(jnp.sum(x_o**2)),
            float(jnp.sum((z0m - z_o[0]) ** 2)), float(jnp.sum(z_o[0] ** 2)),
            float(jnp.sum((z1m - z_o[1]) ** 2)), float(jnp.sum(z_o[1] ** 2)),
        ]
        np.testing.assert_allclose(np.asarray(stats[0, :6]), want, rtol=1e-3, atol=1e-6)
        x, z0, z1 = xm, z0m, z1m
        x_o, z_o = x_r, z_r


def test_megar_plan_gates():
    """make_megar_plan applies the sweep-plan gates to BOTH directions and
    carries the gradient 2x in the adjoint row bands."""
    from pycsou_tpu.kernels.tvr import make_megar_plan

    u = np.ones((5, 2))
    assert make_megar_plan(u, u, (64, 384)) is not None
    assert make_megar_plan(u, u, (64, 256)) is None  # W < 384
    assert make_megar_plan(np.ones((41, 1)), np.ones((5, 1)), (64, 384)) is None
    Bf, Cf, Ba, Ca, R = make_megar_plan(np.ones((3, 1)), np.ones((3, 1)), (64, 384))
    # adjoint row band = 2x the forward one for symmetric taps
    np.testing.assert_allclose(np.asarray(Ba[0, 0] + Ba[0, 1]),
                               2.0 * np.asarray(Bf[0, 0] + Bf[0, 1]), atol=1e-6)


@pytest.mark.parametrize("rank", [6, 9, 12, 15])
def test_grouped_sweep_matches_scipy(rng, rank):
    """Rank 5-16 kernels: ceil(r/4) grouped rank<=4 fused sweeps sum to the
    exact 'same' convolution (ops/conv.py _grouped_sweep_plans;
    method='bandg'); rank 9-16 was the r3 FFT cliff (VERDICT r3 task 6)."""
    from scipy.signal import convolve2d

    from pycsou_tpu.kernels.conv2d import sepconv2d_sweep
    from pycsou_tpu.ops.conv import _grouped_sweep_plans, lowrank_factors

    H, W = 64, 384
    # random rank-`rank` kernel: sum of `rank` outer products
    u = rng.standard_normal((15, rank))
    v = rng.standard_normal((15, rank))
    filt = (u @ v.T).astype(np.float32)
    filt /= np.abs(filt).sum()
    fac = lowrank_factors(filt, max_rank=16)
    assert fac is not None and fac[0].shape[1] == rank
    plans = _grouped_sweep_plans(jnp.asarray(filt), (H, W))
    assert plans is not None
    groups, r = plans
    assert len(groups) == -(-rank // 4)

    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    y = sum(sepconv2d_sweep(x, B, C, r=r, interpret=True) for B, C, _, _ in groups)
    ref = convolve2d(np.asarray(x), filt, mode="same")
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)

    # adjoint sweeps = correlation; dot test against the forward sweeps
    w = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    aw = sum(sepconv2d_sweep(w, Ba, Ca, r=r, interpret=True) for _, _, Ba, Ca in groups)
    lhs = float(jnp.vdot(y, w))
    rhs = float(jnp.vdot(x, aw))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_svd_truncated_convolve2d(rng):
    """Opt-in SVD truncation: the operator IS the truncated kernel, with a
    certified op-norm bound ||A - A_t||_2 <= ||h - h_t||_1 on the error."""
    from pycsou_tpu.ops.conv import Convolve2D, lowrank_factors

    # nearly-rank-2 kernel with a tiny full-rank perturbation
    u = rng.standard_normal((7, 2))
    v = rng.standard_normal((7, 2))
    base = (u @ v.T).astype(np.float32)
    noise = 1e-4 * rng.standard_normal((7, 7)).astype(np.float32)
    filt = base + noise
    A = Convolve2D((16, 32), filt, svd_tol=1e-3)
    # truncated kernel has rank 2 -> the banded/low-rank machinery engages
    fac = lowrank_factors(np.asarray(A.filt))
    assert fac is not None and fac[0].shape[1] == 2
    assert A.svd_trunc_bound > 0.0
    # certified: the truncation bound dominates the actual spectral error
    x = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    A_full = Convolve2D((16, 32), filt)
    err = float(jnp.linalg.norm(A_full(x) - A(x)))
    assert err <= A.svd_trunc_bound * float(jnp.linalg.norm(x)) + 1e-6
    # no truncation requested -> bound is exactly zero
    assert Convolve2D((16, 32), filt).svd_trunc_bound == 0.0


def test_explicit_megar_stencil_honored_for_rank1():
    """stencil='megar' must be honored even when the PSF also qualifies for
    mega2/mega3 (megar supports any rank <= 4, including rank 1)."""
    from pycsou_tpu.opt.tv import TVDeconvolution

    g = np.exp(-((np.arange(9) - 4) ** 2) / 4.0)
    h = np.outer(g, g).astype(np.float32)
    h /= h.sum()
    y = jnp.ones((96, 384), jnp.float32)
    s = TVDeconvolution((96, 384), y, 0.05, filt=h, use_pallas=True, stencil="megar")
    assert s.stencil_mode == "megar"
    assert s.megar_Bf is not None


def test_sweep_step_stats_matches_plain_sweep(rng):
    """tv_pds_sweep_step_stats == tv_pds_stencil_step_sweep bitwise, plus
    exact epilogue partial sums (the sweep-engine metric_every=1 path)."""
    from pycsou_tpu.kernels.tv import (
        tv_pds_stencil_step_sweep,
        tv_pds_sweep_step_stats,
    )

    H, W = 64, 256
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.1, nonneg=True)
    x = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)) * 0.01, jnp.float32)
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)  # dual invariants
    g = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    x1, z1 = tv_pds_stencil_step_sweep(x, z, g, interpret=True, **kw)
    x2, z02, z12, stats = tv_pds_sweep_step_stats(
        x, z[0], z[1], g, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(z1[0]), np.asarray(z02))
    np.testing.assert_array_equal(np.asarray(z1[1]), np.asarray(z12))
    want = [
        float(jnp.sum((x2 - x) ** 2)), float(jnp.sum(x**2)),
        float(jnp.sum((z02 - z[0]) ** 2)), float(jnp.sum(z[0] ** 2)),
        float(jnp.sum((z12 - z[1]) ** 2)), float(jnp.sum(z[1] ** 2)),
    ]
    np.testing.assert_allclose(np.asarray(stats[0, :6]), want, rtol=1e-3, atol=1e-7)


def test_element_tiling_infeasible_raises():
    """H without an 8..128 divisor must raise, not silently skip rows."""
    from pycsou_tpu.kernels.tv import _pick_block_rows, element_available

    assert _pick_block_rows(20, 128) == 0
    assert not element_available(20, 128)
    assert element_available(64, 128)


@pytest.mark.parametrize("rank", [1, 2, 3])
def test_sepgram_sweep_one_pass(rng, rank):
    """Fused one-pass Gram cascade (kernels/conv2d.py sepgram2d_sweep) is
    BITWISE the adjoint-sweep o forward-sweep composition, and the
    fused-gradient form equals ``2 (A^H A x - atb)``."""
    from pycsou_tpu.kernels.conv2d import (
        make_sepconv_plan_pair,
        sepconv2d_sweep,
        sepgram2d_sweep,
    )

    H, W = 96, 384
    u = rng.standard_normal((11, rank))
    v = rng.standard_normal((13, rank))
    pp = make_sepconv_plan_pair(u, v, (H, W))
    assert pp is not None
    Bf, Cf, Ba, Ca, r = pp
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    t = sepconv2d_sweep(x, Bf, Cf, r=r, interpret=True)
    oracle = sepconv2d_sweep(t, Ba, Ca, r=r, interpret=True)
    g = sepgram2d_sweep(x, Bf, Cf, Ba, Ca, r=r, interpret=True)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(oracle))

    pp2 = make_sepconv_plan_pair(u, v, (H, W), adj_scale=2.0)
    Bf2, Cf2, Ba2, Ca2, r2 = pp2
    atb = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    grad = sepgram2d_sweep(x, Bf2, Cf2, Ba2, Ca2, r=r2, atb=atb, interpret=True)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(2.0 * (oracle - atb)), rtol=1e-4, atol=1e-4
    )


def test_pds_instats_matches_state_reductions(rng):
    """The generic PDS in-step metric partial sums reproduce the old
    old-vs-new state reductions (same stopping metric and per-variable
    diagnostics), and iterates are unchanged."""
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import PDS

    shape = (16, 16)
    h = rng.standard_normal((3, 3)).astype(np.float32)
    h /= np.abs(h).sum()
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    A = Convolve2D(shape, h)
    mk = lambda me: PDS(
        shape,
        F=SquaredL2Loss(shape, data=y) * A,
        G=NonNegativeOrthant(shape),
        H=0.1 * L21Norm((2,) + shape, axis=0),
        K=Gradient(shape),
        max_iter=40,
        min_iter=5,
        accuracy_threshold=0.0,
        fuse=False,
        metric_every=me,
    )
    fast = mk(1)
    assert fast._instats
    info_f = fast.solve()
    # metric_every=2 disables the in-step sums -> the old reduction path;
    # compare on the rows both measured
    slow = mk(2)
    assert not slow._instats
    info_s = slow.solve()
    np.testing.assert_allclose(
        np.asarray(info_f["x"]), np.asarray(info_s["x"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        info_f.history[1::2], info_s.history[1::2], rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        info_f.diagnostics["z"][1::2], info_s.diagnostics["z"][1::2], rtol=1e-4, atol=1e-7
    )
