"""Pallas kernels inside shard_map (VERDICT r2 task 1): interpret-mode
equality of the per-shard fused engines against the XLA shard path and the
single-device oracle, on the virtual CPU mesh, for multiple mesh sizes and
all three Gram modes (banded rank-1, FFT fused, forward+adjoint).

The distributed realisation of the reference's hot loop
(/root/reference/pycsou/opt/proxalgs.py:343-355)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pycsou_tpu.ops.conv import Convolve2D
from pycsou_tpu.parallel.solvers import DistributedTVDeconv2D

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")


def _gauss(K, s=2.0):
    ax = np.arange(K) - K // 2
    g = np.exp(-(ax**2) / (2 * s * s))
    return g / g.sum()


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def _problem(rng, H, W, filt):
    y = rng.standard_normal((H, W)).astype(np.float32)
    return jnp.asarray(y)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_megasp_matches_xla_shard_path(rng, n_dev):
    """Fully-fused per-shard mega2 kernel (banded rank-1 mode) == the XLA
    banded shard path, iterates and duals, across mesh sizes."""
    H, W = 256, 384
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    mesh = _mesh(n_dev)
    ref = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas=False)
    assert ref._use_band and ref._sp_engine == ""
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret")
    assert s._sp_engine == "megasp"
    x1, z1 = ref.run(6)
    x2, z2 = s.run(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=3e-5, atol=3e-6)


def test_megasp_matches_single_device_oracle(rng):
    """megasp iterates == the single-device TVDeconvolution flagship (same
    math end to end, two completely different engines)."""
    from pycsou_tpu.opt.tv import TVDeconvolution

    H, W = 256, 384
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=_mesh(4), use_pallas="interpret")
    assert s._sp_engine == "megasp"
    oracle = TVDeconvolution(
        (H, W), y, 0.05, filt=filt, nonneg=True, use_pallas=False,
        tau=s.tau, rho=s.rho, max_iter=50,
    )
    x2, _ = s.run(6)
    st = oracle.run_fixed(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(st["x"]), rtol=3e-5, atol=3e-6)


def test_sweepsp_fft_gram_matches_xla_shard_path(rng):
    """Non-separable PSF -> sweepsp engine over the sharded FFT Gram."""
    H, W = 256, 128
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    filt[0, -1] += 0.03  # break rank-1
    y = _problem(rng, H, W, filt)
    mesh = _mesh(4)
    ref = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas=False)
    assert not ref._use_band and ref._use_gram
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret")
    assert s._sp_engine == "sweepsp"
    x1, z1 = ref.run(6)
    x2, z2 = s.run(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=3e-5, atol=3e-6)


def test_sweepsp_forward_adjoint_mode(rng):
    """Blocks thinner than the kernel (no Gram strips) -> forward+adjoint
    gradient, still through the fused per-shard stencil sweep."""
    H, W = 128, 128
    K = 17
    filt = np.outer(_gauss(K, 4.0), _gauss(K, 4.0)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    mesh = _mesh(8)  # h_loc = 16 < 17 taps
    ref = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas=False)
    assert not ref._use_gram and not ref._use_band
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret")
    assert s._sp_engine == "sweepsp" and not s._use_gram
    x1, z1 = ref.run(5)
    x2, z2 = s.run(5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=3e-5, atol=3e-6)


def test_megasp_solve_stats_metric_matches_xla_history(rng):
    """solve() driven by the kernel-epilogue stats (psum'd partial sums)
    reproduces the XLA path's per-iteration metric history."""
    H, W = 256, 384
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    mesh = _mesh(4)
    kw = dict(max_iter=30, min_iter=5, accuracy_threshold=1e-9)
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret", **kw)
    r = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas=False, **kw)
    im, ix = s.solve(), r.solve()
    np.testing.assert_allclose(im.history, ix.history, rtol=2e-4)
    # 30 iterations of accumulated bf16x3 lane-Gram drift (per-step error
    # ~2e-7 rel, kernels/tv.py LANE_GRAM_PRECISION) — compare accordingly
    np.testing.assert_allclose(np.asarray(im["x"]), np.asarray(ix["x"]), rtol=5e-4, atol=2e-5)
    # per-variable diagnostics present and finite
    assert set(im.diagnostics) == {"x", "z0", "z1"}
    assert np.isfinite(im.diagnostics["z0"][1:]).all()


def test_shard_kernel_stats_match_full_reductions(rng):
    """The psum of the per-shard core-tile partial sums == full-array
    reductions of the global iterate deltas."""
    H, W = 256, 384
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=_mesh(4), use_pallas="interpret")
    st0 = s._wrap_state(s.initial_state())
    st1 = s.step(st0)
    st2 = s.step(st1)
    stats = np.asarray(st2["_stats"])
    want = [
        float(jnp.sum((st2["x"] - st1["x"]) ** 2)), float(jnp.sum(st1["x"] ** 2)),
        float(jnp.sum((st2["z0"] - st1["z0"]) ** 2)), float(jnp.sum(st1["z0"] ** 2)),
        float(jnp.sum((st2["z1"] - st1["z1"]) ** 2)), float(jnp.sum(st1["z1"] ** 2)),
    ]
    np.testing.assert_allclose(stats, want, rtol=1e-4)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_megarsp_matches_xla_shard_path(rng, n_dev):
    """Fully-fused per-shard rank-2 megar kernel (kernels/tvr.py) == the XLA
    FFT-Gram shard path, iterates and duals, across mesh sizes."""
    H, W = 256, 384
    filt = (
        np.outer(_gauss(7), _gauss(7)) + 0.4 * np.outer(_gauss(7, 0.8), _gauss(7, 4.0))
    ).astype(np.float32)
    filt /= filt.sum()
    y = _problem(rng, H, W, filt)
    mesh = _mesh(n_dev)
    ref = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas=False)
    assert ref._sp_engine == "" and not ref._use_band
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret")
    assert s._sp_engine == "megarsp"
    x1, z1 = ref.run(6)
    x2, z2 = s.run(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=3e-5, atol=3e-6)


def test_megarsp_matches_single_device_oracle(rng):
    """megarsp iterates == the single-device TVDeconvolution flagship for a
    rank-2 PSF (two completely different engines, same math end to end)."""
    from pycsou_tpu.opt.tv import TVDeconvolution

    H, W = 256, 384
    filt = (
        np.outer(_gauss(7), _gauss(7)) + 0.4 * np.outer(_gauss(7, 0.8), _gauss(7, 4.0))
    ).astype(np.float32)
    filt /= filt.sum()
    y = _problem(rng, H, W, filt)
    s = DistributedTVDeconv2D((H, W), filt, y, 0.05, mesh=_mesh(4), use_pallas="interpret")
    assert s._sp_engine == "megarsp"
    oracle = TVDeconvolution(
        (H, W), y, 0.05, filt=filt, nonneg=True, use_pallas=False,
        tau=s.tau, rho=s.rho, max_iter=50,
    )
    x2, _ = s.run(6)
    st = oracle.run_fixed(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(st["x"]), rtol=3e-5, atol=3e-6)


def _mesh2d(shape):
    n = shape[0] * shape[1]
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), ("sp0", "sp1"))


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 2), (2, 1), (2, 4)])
def test_megar2d_matches_xla_2d_path(rng, mesh_shape):
    """Fused per-shard megar2d engine on the TRUE 2-D spatial mesh ==
    the pure-XLA banded 2-D chain (VERDICT r3 task 2), iterates and duals,
    across mesh shapes (incl. degenerate 1-D rows/cols)."""
    from pycsou_tpu.parallel.solvers import Spatial2DTVDeconv2D

    H, W = 128, 512
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    mesh = _mesh2d(mesh_shape)
    ref = Spatial2DTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas=False)
    assert ref._sp_engine == ""
    s = Spatial2DTVDeconv2D((H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret")
    assert s._sp_engine == "megar2d"
    x1, z1 = ref.run(6)
    x2, z2 = s.run(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=3e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), rtol=3e-5, atol=1e-5)


def test_megar2d_rank2_matches_single_device_oracle(rng):
    """Rank-2 PSF on the 2-D mesh (lifted restriction, VERDICT r3 task 2):
    megar2d iterates == the single-device TVDeconvolution XLA chain."""
    from pycsou_tpu.opt.tv import TVDeconvolution
    from pycsou_tpu.parallel.solvers import Spatial2DTVDeconv2D

    H, W = 128, 512
    h2 = np.outer(_gauss(7), _gauss(7)) + 0.35 * np.outer(
        _gauss(7, 0.8), _gauss(7, 3.0)
    )
    h2 = (h2 / h2.sum()).astype(np.float32)
    y = _problem(rng, H, W, h2)
    oracle = TVDeconvolution((H, W), y, 0.05, filt=h2, nonneg=True, use_pallas=False, max_iter=50)
    st = oracle.run_fixed(6)
    z_ref = st["z"] if "z" in st else jnp.stack([st["z0"], st["z1"]], 0)
    s = Spatial2DTVDeconv2D(
        (H, W), h2, y, 0.05, mesh=_mesh2d((2, 2)), use_pallas="interpret",
        tau=oracle.tau, rho=oracle.rho,
    )
    assert s._sp_engine == "megar2d" and s.rank == 2
    x2, z2 = s.run(6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(st["x"]), rtol=3e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z_ref), rtol=3e-5, atol=1e-5)


def test_megar2d_solve_stats_metric(rng):
    """megar2d's kernel-epilogue stats drive solve()'s stopping metric and
    per-variable diagnostics on the 2-D mesh (psum over BOTH axes)."""
    from pycsou_tpu.parallel.solvers import Spatial2DTVDeconv2D

    H, W = 128, 512
    filt = np.outer(_gauss(7), _gauss(7)).astype(np.float32)
    y = _problem(rng, H, W, filt)
    mesh = _mesh2d((2, 2))
    s = Spatial2DTVDeconv2D(
        (H, W), filt, y, 0.05, mesh=mesh, use_pallas="interpret",
        max_iter=12, min_iter=3, accuracy_threshold=0.0,
    )
    ref = Spatial2DTVDeconv2D(
        (H, W), filt, y, 0.05, mesh=mesh, use_pallas=False,
        max_iter=12, min_iter=3, accuracy_threshold=0.0,
    )
    info_s, info_r = s.solve(), ref.solve()
    np.testing.assert_allclose(info_s.history, info_r.history, rtol=2e-3, atol=1e-6)
    assert set(info_s.diagnostics) == {"x", "z0", "z1"}


def test_megar2d_rank2_without_engine_raises(rng):
    """A rank >= 2 PSF on the 2-D mesh without the fused engine must raise
    (the XLA banded fallback is rank-1 only)."""
    from pycsou_tpu.parallel.solvers import Spatial2DTVDeconv2D

    h2 = np.outer(_gauss(7), _gauss(7)) + 0.35 * np.outer(
        _gauss(7, 0.8), _gauss(7, 3.0)
    )
    h2 = (h2 / h2.sum()).astype(np.float32)
    y = _problem(rng, 128, 512, h2)
    with pytest.raises(ValueError, match="megar2d"):
        Spatial2DTVDeconv2D((128, 512), h2, y, 0.05, mesh=_mesh2d((2, 2)), use_pallas=False)


def test_megasp_aniso_matches_xla_chain(rng):
    """The fused per-shard mega2 engine with isotropic=False (box dual
    projection threaded into the shard kernel) == the distributed XLA
    chain with the same flag."""
    import numpy as np

    from pycsou_tpu.parallel import DistributedTVDeconv2D, make_mesh

    H, W = 32 * 8, 384
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    h = np.outer(g, g).astype(np.float32)
    h /= h.sum()
    y = np.abs(rng.standard_normal((H, W))).astype(np.float32)
    mesh = make_mesh(axis_names=("sp",))
    mk = lambda up: DistributedTVDeconv2D(
        (H, W), h, y, lam=0.05, nonneg=True, mesh=mesh, isotropic=False,
        use_pallas=up,
    )
    fused, chain = mk("interpret"), mk(False)
    assert fused._sp_engine == "megasp" and not fused.iso
    st_f = fused.run_fixed(5)
    st_c = chain.run_fixed(5)
    z_f = np.stack([np.asarray(st_f["z0"]), np.asarray(st_f["z1"])])
    np.testing.assert_allclose(
        np.asarray(st_f["x"]), np.asarray(st_c["x"]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(z_f, np.asarray(st_c["z"]), rtol=2e-4, atol=2e-5)


def test_sweepsp_masked_matches_xla_chain(rng):
    """The per-shard fused sweepsp engine with the DIAGONAL mask Gram ==
    the distributed XLA chain (interpret mode on the CPU mesh)."""
    import numpy as np

    from pycsou_tpu.parallel import DistributedTVDeconv2D, make_mesh

    H, W = 32 * 8, 256
    keep = rng.random((H, W)) < 0.4
    m = keep.astype(np.float32)
    y_img = m * np.abs(rng.standard_normal((H, W))).astype(np.float32)
    mesh = make_mesh(axis_names=("sp",))
    mk = lambda up: DistributedTVDeconv2D(
        (H, W), None, y_img, lam=0.05, nonneg=True, mesh=mesh, mask=m,
        use_pallas=up,
    )
    fused, chain = mk("interpret"), mk(False)
    assert fused._sp_engine == "sweepsp" and chain._sp_engine == ""
    st_f = fused.run_fixed(5)
    st_c = chain.run_fixed(5)
    z_f = np.stack([np.asarray(st_f["z0"]), np.asarray(st_f["z1"])])
    np.testing.assert_allclose(
        np.asarray(st_f["x"]), np.asarray(st_c["x"]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(z_f, np.asarray(st_c["z"]), rtol=2e-4, atol=2e-5)
