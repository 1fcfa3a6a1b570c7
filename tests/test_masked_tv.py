"""Masked (diagonal-Gram) TV: inpainting / zero-fill super-resolution.

``min ||A x - y||^2 + lam TV(x)`` with A a sampling operator
(Masking/DownSampling/SubSampling, reference sampling.py:125-196) has
``A^H A = diag(A^H 1)`` — the fused 'sweepm' engine streams that diagonal
and computes the whole PDS iteration in one kernel pass.  The expression
matcher recognises ``SquaredL2Loss * Masking`` (etc.) and rewrites onto it.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pycsou_tpu.kernels.tv import tv_pds_stencil_step_xla


@pytest.mark.parametrize("iso", [True, False])
@pytest.mark.parametrize("nonneg", [True, False])
def test_sweepm_kernel_matches_xla(rng, iso, nonneg):
    from pycsou_tpu.kernels.tv import tv_pds_sweepm_step_stats

    H, W = 64, 256
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.05, nonneg=nonneg, iso=iso)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, H, W)), jnp.float32) * 0.1
    z = z.at[0, -1].set(0.0).at[1, :, -1].set(0.0)
    m = jnp.asarray((rng.random((H, W)) < 0.4).astype(np.float32))
    atb = m * jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    g = 2.0 * (m * x - atb)
    x2, z2 = tv_pds_stencil_step_xla(x, z, g, **kw)
    x1, z0n, z1n, stats = tv_pds_sweepm_step_stats(
        x, z[0], z[1], m, atb, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z0n), np.asarray(z2[0]), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z1n), np.asarray(z2[1]), rtol=3e-5, atol=3e-6)
    want = [
        float(jnp.sum((x1 - x) ** 2)), float(jnp.sum(x * x)),
        float(jnp.sum((z0n - z[0]) ** 2)), float(jnp.sum(z[0] ** 2)),
        float(jnp.sum((z1n - z[1]) ** 2)), float(jnp.sum(z[1] ** 2)),
    ]
    np.testing.assert_allclose(np.asarray(stats[0, :6]), want, rtol=1e-4)


def test_masked_solver_matches_generic_pds(rng):
    """PDS(F = SquaredL2Loss * Masking, H = lam L21 o Gradient) fuses onto
    the diagonal-Gram TVDeconvolution and computes the generic chain's
    iterates exactly (inpainting oracle)."""
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.ops.sampling import Masking
    from pycsou_tpu.opt import PDS, TVDeconvolution

    H, W = 32, 32
    keep = rng.random((H, W)) < 0.5
    M = Masking((H, W), keep)
    x_true = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    y = M(x_true) + 0.01 * jnp.asarray(rng.standard_normal(int(keep.sum())), jnp.float32)
    mk = lambda fuse: PDS(
        (H, W), F=SquaredL2Loss(M.codim_shape, data=y) * M,
        G=NonNegativeOrthant((H, W)),
        H=0.05 * L21Norm((2, H, W), axis=0), K=Gradient((H, W)),
        max_iter=200, fuse=fuse,
    )
    fused, generic = mk(True), mk(False)
    assert isinstance(fused._fused, TVDeconvolution)
    assert fused._fused.mask is not None
    st_f = fused.run_fixed(60)
    st_g = generic.run_fixed(60)
    np.testing.assert_allclose(
        np.asarray(st_f["x"]), np.asarray(st_g["x"]), rtol=1e-4, atol=1e-5
    )
    z_f = np.stack([np.asarray(st_f["z0"]), np.asarray(st_f["z1"])])
    np.testing.assert_allclose(z_f, np.asarray(st_g["z"]), rtol=1e-4, atol=1e-5)


def test_downsampling_superres_matches_generic_pds(rng):
    """Zero-fill super-resolution: F = SquaredL2Loss * DownSampling."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.ops.sampling import DownSampling
    from pycsou_tpu.opt import PDS, TVDeconvolution

    H, W = 32, 32
    D = DownSampling((H, W), 2)
    x_true = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    y = D(x_true)
    mk = lambda fuse: PDS(
        (H, W), F=SquaredL2Loss(D.codim_shape, data=y) * D,
        H=0.1 * L21Norm((2, H, W), axis=0), K=Gradient((H, W)),
        max_iter=200, fuse=fuse,
    )
    fused, generic = mk(True), mk(False)
    assert isinstance(fused._fused, TVDeconvolution)
    st_f = fused.run_fixed(50)
    st_g = generic.run_fixed(50)
    np.testing.assert_allclose(
        np.asarray(st_f["x"]), np.asarray(st_g["x"]), rtol=1e-4, atol=1e-5
    )


def test_masked_solver_inpaints(rng):
    """End-to-end: TV inpainting fills a hole with values near its rim."""
    from pycsou_tpu.opt.tv import TVDeconvolution

    H, W = 32, 32
    x_true = jnp.ones((H, W))
    keep = np.ones((H, W), bool)
    keep[12:20, 12:20] = False  # hole
    m = jnp.asarray(keep.astype(np.float32))
    y_img = m * x_true
    solver = TVDeconvolution((H, W), y_img, lam=0.1, mask=m, nonneg=True, max_iter=500)
    info = solver.solve()
    hole = np.asarray(info["x"])[12:20, 12:20]
    assert np.all(np.abs(hole - 1.0) < 0.2)


def test_mask_mode_validation():
    from pycsou_tpu.opt.tv import TVDeconvolution

    y = jnp.zeros((16, 16))
    m = jnp.ones((16, 16))
    # filt + mask is now the COMBINED (blur + mask) mode
    s = TVDeconvolution((16, 16), y, 0.1, filt=np.ones((3, 3), np.float32),
                        mask=m, use_pallas=False)
    assert s.conv is not None and s.mask is not None
    with pytest.raises(ValueError, match="mask shape"):
        TVDeconvolution((16, 16), y, 0.1, mask=jnp.ones((8, 8)))
    with pytest.raises(ValueError):
        # sweepm needs a diagonal Gram (mask mode or denoise), not a conv
        TVDeconvolution((16, 16), y, 0.1, filt=np.ones((3, 3), np.float32),
                        stencil="sweepm", use_pallas=True)


def test_masked_objective_scores_observed_pixels_only(rng):
    """objective() in mask mode evaluates the data term over OBSERVED
    pixels only (regression: the gram-is-None branch once scored all
    pixels against the zero-filled back-projection)."""
    from pycsou_tpu.ops.diff import fdiff_forward
    from pycsou_tpu.opt.tv import TVDeconvolution

    H, W = 16, 16
    keep = rng.random((H, W)) < 0.5
    m = jnp.asarray(keep.astype(np.float32))
    y_img = m * jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    s = TVDeconvolution((H, W), y_img, 0.1, mask=m, nonneg=False, use_pallas=False)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    dx, dy = fdiff_forward(x, 0), fdiff_forward(x, 1)
    want = float(
        jnp.sum(m * (x - y_img) ** 2)
        + 0.1 * jnp.sum(jnp.sqrt(dx**2 + dy**2))
    )
    np.testing.assert_allclose(float(s.objective(x)), want, rtol=1e-5)


@pytest.mark.parametrize("iso", [True, False])
def test_sweepm2_double_step_matches_two_single_steps(rng, iso):
    """The two-iteration masked kernel == two sweepm steps == two XLA twin
    steps, chained over 2 double-steps (ring coverage), stats measuring the
    second iteration only."""
    from pycsou_tpu.kernels.tv import tv_pds_sweepm2_step

    H, W = 96, 256
    kw = dict(tau=0.06, sigma=0.04, rho=0.9, lam=0.05, nonneg=True, iso=iso)
    m = jnp.asarray((rng.random((H, W)) < 0.4).astype(np.float32))
    atb = m * jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    x = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    z = jnp.zeros((2, H, W), jnp.float32)
    x_o, z_o = x, z
    for _ in range(2):
        x1m, z0m, z1m, stats = tv_pds_sweepm2_step(
            x, z[0], z[1], m, atb, interpret=True, **kw
        )
        # oracle: two generic iterations; remember the FIRST for the stats
        g = 2.0 * (m * x_o - atb)
        x_mid, z_mid = tv_pds_stencil_step_xla(x_o, z_o, g, **kw)
        g = 2.0 * (m * x_mid - atb)
        x_o, z_o = tv_pds_stencil_step_xla(x_mid, z_mid, g, **kw)
        np.testing.assert_allclose(np.asarray(x1m), np.asarray(x_o), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z0m), np.asarray(z_o[0]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z1m), np.asarray(z_o[1]), rtol=1e-4, atol=1e-5)
        want = [
            float(jnp.sum((x_o - x_mid) ** 2)), float(jnp.sum(x_mid**2)),
            float(jnp.sum((z_o[0] - z_mid[0]) ** 2)), float(jnp.sum(z_mid[0] ** 2)),
            float(jnp.sum((z_o[1] - z_mid[1]) ** 2)), float(jnp.sum(z_mid[1] ** 2)),
        ]
        np.testing.assert_allclose(np.asarray(stats[0, :6]), want, rtol=1e-3, atol=1e-6)
        x, z = x1m, jnp.stack([z0m, z1m])


def test_masked_solver_sweepm2_iteration_units(rng):
    """The sweepm2 engine keeps it/history in ITERATION units
    (iters_per_step=2 bookkeeping) and solves to the same answer as the
    XLA chain."""
    from pycsou_tpu.opt.tv import TVDeconvolution

    H, W = 64, 256
    keep = rng.random((H, W)) < 0.6
    m = jnp.asarray(keep.astype(np.float32))
    y_img = m * jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    # kernel-level parity is covered in interpret mode above; the solver's
    # STATIC bookkeeping (engine choice + iteration units) checks here
    s2 = TVDeconvolution((H, W), y_img, 0.05, mask=m, stencil="sweepm2",
                         use_pallas=True, max_iter=60)
    assert s2.stencil_mode == "sweepm2" and s2.iters_per_step == 2
    # explicit sweepm2 on a 1-tile image raises instead of degrading
    with pytest.raises(ValueError, match="sweepm2"):
        TVDeconvolution((8, 256), jnp.zeros((8, 256)), 0.05,
                        mask=jnp.ones((8, 256)), stencil="sweepm2",
                        use_pallas=True)


def test_megarm_kernel_matches_oracle(rng):
    """Masked megar cascade (forward sweep -> data mask -> adjoint sweep ->
    stencil): chained parity vs the XLA oracle g = 2(A^H(m * A x) - atb)."""
    from pycsou_tpu.kernels.tvr import make_megar_plan, tv_pds_megar_step
    from pycsou_tpu.ops.conv import Convolve2D, lowrank_factors

    H, W = 96, 384
    u = rng.standard_normal((9, 2)) * 0.3
    v = rng.standard_normal((7, 2)) * 0.3
    filt = (u @ v.T).astype(np.float32)
    filt /= np.abs(filt).sum()
    fac = lowrank_factors(filt)
    Bf, Cf, Ba, Ca, R = make_megar_plan(fac[0], fac[1], (H, W))
    A = Convolve2D((H, W), filt, method="fft")
    m = jnp.asarray((rng.random((H, W)) < 0.5).astype(np.float32))
    atb = A.adjoint(m * jnp.asarray(rng.standard_normal((H, W)), jnp.float32))
    kw = dict(tau=0.05, sigma=0.05, rho=0.9, lam=0.1, nonneg=True)
    x = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    z0 = z1 = jnp.zeros((H, W), jnp.float32)
    for _ in range(3):
        xm, z0m, z1m, _ = tv_pds_megar_step(
            x, z0, z1, atb, Bf, Cf, Ba, Ca, mega_r=R, interpret=True, mask=m, **kw
        )
        g = 2.0 * (A.adjoint(m * A.apply(x)) - atb)
        xr, zr = tv_pds_stencil_step_xla(x, jnp.stack([z0, z1]), g, **kw)
        np.testing.assert_allclose(np.asarray(xm), np.asarray(xr), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(z0m), np.asarray(zr[0]), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(z1m), np.asarray(zr[1]), rtol=3e-4, atol=3e-5)
        x, z0, z1 = xm, z0m, z1m


def test_blurred_masking_superres_matches_generic_pds(rng):
    """F = SquaredL2Loss o Masking o Convolve2D (partial blurred
    measurements) fuses onto the COMBINED TVDeconvolution mode and computes
    the generic chain's iterates exactly."""
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.ops.sampling import Masking
    from pycsou_tpu.opt import PDS, TVDeconvolution

    H, W = 32, 32
    g1 = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    h = np.outer(g1, g1).astype(np.float32)
    h /= h.sum()
    A = Convolve2D((H, W), h)
    keep = rng.random((H, W)) < 0.5
    M = Masking((H, W), keep)
    x_true = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    y = M(A(x_true)) + 0.01 * jnp.asarray(
        rng.standard_normal(int(keep.sum())), jnp.float32
    )
    mk = lambda fuse: PDS(
        (H, W), F=SquaredL2Loss(M.codim_shape, data=y) * (M * A),
        G=NonNegativeOrthant((H, W)),
        H=0.05 * L21Norm((2, H, W), axis=0), K=Gradient((H, W)),
        max_iter=200, fuse=fuse,
    )
    fused, generic = mk(True), mk(False)
    assert isinstance(fused._fused, TVDeconvolution)
    assert fused._fused.conv is not None and fused._fused.mask is not None
    st_f = fused.run_fixed(50)
    st_g = generic.run_fixed(50)
    np.testing.assert_allclose(
        np.asarray(st_f["x"]), np.asarray(st_g["x"]), rtol=1e-4, atol=1e-5
    )
    z_f = np.stack([np.asarray(st_f["z0"]), np.asarray(st_f["z1"])])
    np.testing.assert_allclose(z_f, np.asarray(st_g["z"]), rtol=1e-4, atol=1e-5)
    # objective parity with the expression's own value
    xs = jnp.asarray(st_g["x"])
    want = float(mk(False).objective(xs))
    np.testing.assert_allclose(float(fused._fused.objective(xs)), want, rtol=1e-4)


def test_combined_mode_validation(rng):
    from pycsou_tpu.opt.tv import TVDeconvolution

    y = jnp.zeros((32, 32))
    m = jnp.ones((32, 32))
    hf = np.abs(rng.standard_normal((5, 5))).astype(np.float32)  # full rank
    hf /= hf.sum()
    with pytest.raises(ValueError, match="megarm"):
        TVDeconvolution((32, 32), y, 0.1, filt=hf, mask=m, stencil="megarm",
                        use_pallas=True)
    # full-rank PSF + mask: XLA chain fallback, still correct mode
    s = TVDeconvolution((32, 32), y, 0.1, filt=hf, mask=m, use_pallas=False)
    assert s.conv is not None and s.stencil_mode == "xla"


def test_near_miss_note_knows_masked_conv_F(rng, caplog):
    """A masked-conv F is a SUPPORTED slot: the near-miss note for a K-only
    mismatch must blame K, not F (regression: _why_F lagged the matcher)."""
    import logging

    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.ops.sampling import Masking
    from pycsou_tpu.opt import PDS

    H, W = 32, 32
    g1 = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    h = np.outer(g1, g1).astype(np.float32)
    h /= h.sum()
    A = Convolve2D((H, W), h)
    M = Masking((H, W), rng.random((H, W)) < 0.5)
    y = M(A(jnp.ones((H, W))))
    with caplog.at_level(logging.WARNING, logger="pycsou_tpu.fuse"):
        solver = PDS(
            (H, W), F=SquaredL2Loss(M.codim_shape, data=y) * (M * A),
            G=NonNegativeOrthant((H, W)),
            H=0.05 * L21Norm((2, H, W), axis=0),
            K=Gradient((H, W), step=2.0),  # the ONLY mismatch
            max_iter=50,
        )
    assert solver._fused is None
    notes = [r.message for r in caplog.records if "NOT fused" in r.message]
    assert notes and "steps" in notes[0] and "F is" not in notes[0]
