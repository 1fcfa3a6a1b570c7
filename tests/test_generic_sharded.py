"""Generic SPMD solvers (VERDICT r1 task 2): the *generic* PDS/APGD run over
a device mesh for ARBITRARY operator expressions via GSPMD sharding
constraints — no hand-written distributed solver involved — and produce
iterates identical to the single-device run.

Also covers the per-variable diagnostics parity (VERDICT task 7): primal AND
dual relative improvements recorded per iteration, like the reference's
diagnostics frame (/root/reference/pycsou/opt/proxalgs.py:366-394).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pycsou_tpu.parallel import make_mesh


def _gauss(k, s):
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * s**2))
    g2 = np.outer(g, g)
    return jnp.asarray(g2 / g2.sum(), jnp.float32)


def _tv_pds(shape, y, filt, **kw):
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import PDS

    A = Convolve2D(shape, filt)
    F = SquaredL2Loss(shape, data=y) * A
    return PDS(
        shape,
        F=F,
        G=NonNegativeOrthant(shape),
        H=0.05 * L21Norm((2,) + shape, axis=0),
        K=Gradient(shape),
        fuse=False,  # oracle semantics: step the raw expression tree
        **kw,
    )


def test_generic_pds_sharded_tv_equals_single_device(rng):
    """BASELINE config 3 via the GENERIC solver, row-sharded over 8 devices."""
    shape = (64, 64)
    filt = _gauss(7, 1.5)
    x_true = jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32)
    from pycsou_tpu.ops.conv import Convolve2D

    y = Convolve2D(shape, filt)(x_true)

    solver = _tv_pds(shape, y, filt, max_iter=100)
    ref = solver.run_fixed(30)

    mesh = make_mesh(axis_names=("sp",))
    sharded = solver.with_shardings(
        x=NamedSharding(mesh, P("sp", None)),
        z=NamedSharding(mesh, P(None, "sp", None)),
    )
    got = sharded.run_fixed(30)
    # iterates identical (same math, XLA-inserted collectives)
    np.testing.assert_allclose(np.asarray(got["x"]), np.asarray(ref["x"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["z"]), np.asarray(ref["z"]), rtol=1e-4, atol=1e-5)
    # the iterate actually lives sharded on the mesh
    shards = got["x"].sharding
    assert isinstance(shards, NamedSharding) and shards.spec[0] == "sp"
    assert not got["x"].sharding.is_fully_replicated


def test_generic_apgd_sharded_stacked_recovery(rng):
    """BASELINE config 4 (stacked sparse + DCT-lowpass recovery) through the
    generic APGD, sharded over the mesh."""
    from pycsou_tpu.func import L1Norm, SquaredL2Loss
    from pycsou_tpu.ops import DCTOperator, Masking, SubSampling
    from pycsou_tpu.ops.stack import LinOpVStack
    from pycsou_tpu.opt import APGD

    n = 256
    c_true = np.zeros(n, np.float32)
    c_true[rng.choice(100, 12, replace=False)] = rng.standard_normal(12).astype(np.float32)
    dct = DCTOperator((n,))
    x_true = dct.adjoint(jnp.asarray(c_true))
    mask = rng.uniform(size=n) < 0.4
    K = LinOpVStack([Masking((n,), mask), SubSampling((n,), np.arange(24)) * dct])
    K.compute_lipschitz_cst()
    y = K(x_true)

    F = SquaredL2Loss(K.codim_shape, data=y) * K
    G = 0.01 * (L1Norm((n,)) * dct)
    solver = APGD((n,), F=F, G=G, max_iter=200)
    ref = solver.run_fixed(60)

    mesh = make_mesh(axis_names=("sp",))
    sh = NamedSharding(mesh, P("sp"))
    got = solver.with_shardings(x=sh, x_temp=sh).run_fixed(60)
    np.testing.assert_allclose(
        np.asarray(got["x_temp"]), np.asarray(ref["x_temp"]), rtol=1e-4, atol=1e-5
    )


def test_sharded_solve_converges_and_matches(rng):
    """Full solve() (while_loop driver, stopping metric, diagnostics) under
    shardings gives the single-device answer."""
    shape = (32, 64)
    filt = _gauss(5, 1.0)
    x_true = jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32)
    from pycsou_tpu.ops.conv import Convolve2D

    y = Convolve2D(shape, filt)(x_true)
    ref = _tv_pds(shape, y, filt, max_iter=150, accuracy_threshold=1e-5).solve()

    mesh = make_mesh(axis_names=("sp",))
    solver = _tv_pds(shape, y, filt, max_iter=150, accuracy_threshold=1e-5).with_shardings(
        x=NamedSharding(mesh, P("sp", None)),
        z=NamedSharding(mesh, P(None, "sp", None)),
    )
    info = solver.solve()
    assert info.converged == ref.converged
    np.testing.assert_allclose(np.asarray(info["x"]), np.asarray(ref["x"]), rtol=1e-4, atol=1e-5)


def test_per_variable_diagnostics(rng):
    """Primal AND dual relative improvements are recorded (reference
    proxalgs.py:366-394 parity)."""
    shape = (16, 16)
    filt = _gauss(5, 1.0)
    y = jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32)
    info = _tv_pds(shape, y, filt, max_iter=40, accuracy_threshold=0.0).solve()
    assert set(info.diagnostics) == {"x", "z"}
    assert info.diagnostics["x"].shape == (info.n_iter,)
    # the primal diagnostic IS the stopping history
    np.testing.assert_allclose(info.diagnostics["x"], info.history, rtol=1e-6)
    # dual moved too
    assert np.isfinite(info.diagnostics["z"][5:]).all()
    assert (info.diagnostics["z"][5:] > 0).any()


def test_apgd_diagnostics_primary_var(rng):
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.ops.basic import DenseOperator
    from pycsou_tpu.opt import APGD

    A = DenseOperator(jnp.asarray(rng.standard_normal((20, 12)), jnp.float32))
    A.compute_lipschitz_cst()
    y = A(jnp.asarray(rng.standard_normal(12), jnp.float32))
    F = SquaredL2Loss((20,), data=y) * A
    solver = APGD((12,), F=F, max_iter=50, accuracy_threshold=0.0)
    info = solver.solve()
    assert "x_temp" in info.diagnostics and "x" in info.diagnostics
    np.testing.assert_allclose(info.diagnostics["x_temp"], info.history, rtol=1e-6)


def test_tv_solver_with_shardings_matches_single(rng):
    """TVDeconvolution under the generic GSPMD path: sharded == unsharded,
    and the sharded copy must drop to the XLA stencil twin (pallas_call
    does not partition under sharding constraints)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pycsou_tpu.parallel import make_mesh
    from pycsou_tpu.opt import TVDeconvolution

    H, W = 32, 48
    ax = np.arange(7) - 3
    g1 = np.exp(-(ax**2) / 4.0)
    filt = np.outer(g1, g1).astype(np.float32)
    filt /= filt.sum()
    y = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)

    ref = TVDeconvolution((H, W), y, 0.1, filt=filt, max_iter=40).run_fixed(40)

    mesh = make_mesh((jax.device_count(),), ("sp",))
    sh = TVDeconvolution((H, W), y, 0.1, filt=filt, max_iter=40).with_shardings(
        x=NamedSharding(mesh, P("sp", None)),
        z0=NamedSharding(mesh, P("sp", None)),
        z1=NamedSharding(mesh, P("sp", None)),
    )
    assert sh.stencil_mode == "xla" and sh.iters_per_step == 1
    got = sh.run_fixed(40)
    assert not got["x"].sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(got["x"]), np.asarray(ref["x"]), rtol=1e-4, atol=1e-5)


def test_with_shardings_strips_pallas_plans(rng):
    """solver.with_shardings replaces operators with GSPMD-safe twins:
    fused-sweep matvec/Gram plans are dropped (pallas_call does not
    partition under sharding constraints — XLA would silently all-gather
    the full arrays around every kernel on a real pod)."""
    from pycsou_tpu._module import strip_pallas
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.opt import APGD

    H, W = 32, 48
    ax = np.arange(7) - 3
    g1 = np.exp(-(ax**2) / 4.0)
    filt = (np.outer(g1, g1) / np.outer(g1, g1).sum()).astype(np.float32)
    y = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    A = Convolve2D((H, W), filt)
    solver = APGD((H, W), F=SquaredL2Loss((H, W), data=y) * A, G=NonNegativeOrthant((H, W)), max_iter=5)

    # simulate the TPU constructor having built sweep plans (the CPU test
    # backend gates them off) by injecting dummies into the BUILT pytree
    # (dummy plans can't survive constructor-time apply calls)
    from pycsou_tpu._module import Module

    dummy = jnp.zeros((1, 2, 4, 4), jnp.float32)

    def inject(obj):
        if isinstance(obj, Convolve2D):
            obj = obj.replace(mv_B=dummy, mv_C=dummy, mv_Ba=dummy, mv_Ca=dummy, mv_r=16)
        if isinstance(obj, Module):
            return obj.replace(**{n: inject(getattr(obj, n, None)) for n in obj._dyn_fields})
        if isinstance(obj, (tuple, list)):
            return type(obj)(inject(v) for v in obj)
        return obj

    dirty = inject(solver)
    A_dirty = inject(A)
    stripped_A = strip_pallas(A_dirty)
    assert stripped_A.mv_r == 0 and stripped_A.mv_B is None
    assert A_dirty.mv_r == 16  # original untouched

    mesh = make_mesh((jax.device_count(),), ("sp",))
    sh = dirty.with_shardings(x=NamedSharding(mesh, P("sp", None)))
    leaves = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda o: isinstance(o, Convolve2D)
    )
    convs = [l for l in leaves if isinstance(l, Convolve2D)]
    assert convs and all(c.mv_r == 0 for c in convs)


# ---------------------------------------------------------------------------
# Sharded fused routing (VERDICT r4 task 3): a fused TV expression +
# spatial shardings re-dispatches onto the per-shard distributed engines
# ---------------------------------------------------------------------------


def _tv_pds_fused(shape, y, filt, **kw):
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import PDS

    A = Convolve2D(shape, filt)
    return PDS(
        shape,
        F=SquaredL2Loss(shape, data=y) * A,
        G=NonNegativeOrthant(shape),
        H=0.05 * L21Norm((2,) + shape, axis=0),
        K=Gradient(shape),
        fuse=True,
        **kw,
    )


def test_sharded_pds_routes_to_distributed_engine(rng):
    """with_shardings on a fused TV expression with a row partition
    delegates to DistributedTVDeconv2D (per-shard engines) and computes the
    generic chain's iterates exactly."""
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.parallel.solvers import DistributedTVDeconv2D

    shape = (64, 64)
    filt = _gauss(7, 1.5)
    x_true = jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32)
    y = Convolve2D(shape, filt)(x_true)

    mesh = make_mesh(axis_names=("sp",))
    sharded = _tv_pds_fused(shape, y, filt, max_iter=100).with_shardings(
        x=NamedSharding(mesh, P("sp", None)),
        z=NamedSharding(mesh, P(None, "sp", None)),
    )
    assert isinstance(sharded._fused, DistributedTVDeconv2D)

    ref = _tv_pds(shape, y, filt, max_iter=100).run_fixed(30)
    st = sharded.run_fixed(30)
    np.testing.assert_allclose(
        np.asarray(st["x"]), np.asarray(ref["x"]), rtol=2e-4, atol=2e-5
    )
    z_s = (
        np.stack([np.asarray(st["z0"]), np.asarray(st["z1"])])
        if "z0" in st
        else np.asarray(st["z"])
    )
    np.testing.assert_allclose(z_s, np.asarray(ref["z"]), rtol=2e-4, atol=2e-5)
    # the sharded state actually lives on the mesh
    assert len(st["x"].sharding.device_set) == jax.device_count()
    # end-to-end: solve() works on the delegate state layout
    info = _tv_pds_fused(shape, y, filt, max_iter=60).with_shardings(
        x=NamedSharding(mesh, P("sp", None)),
    ).solve()
    assert info.n_iter > 0 and "z" in info.iterand


def test_sharded_pds_routes_to_spatial2d_engine(rng):
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.parallel.solvers import Spatial2DTVDeconv2D

    shape = (64, 128)
    filt = _gauss(7, 1.5)
    x_true = jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32)
    y = Convolve2D(shape, filt)(x_true)

    mesh = make_mesh((2, 4), ("sp0", "sp1"))
    sharded = _tv_pds_fused(shape, y, filt, max_iter=100).with_shardings(
        x=NamedSharding(mesh, P("sp0", "sp1")),
    )
    assert isinstance(sharded._fused, Spatial2DTVDeconv2D)
    ref = _tv_pds(shape, y, filt, max_iter=100).run_fixed(25)
    st = sharded.run_fixed(25)
    np.testing.assert_allclose(
        np.asarray(st["x"]), np.asarray(ref["x"]), rtol=2e-4, atol=2e-5
    )


def test_sharded_routing_declines_gracefully(rng):
    """tau != sigma / unroutable specs fall back to the generic GSPMD chain
    (state_shardings set, no delegate); anisotropic TV ROUTES (the
    distributed engines thread the same iso flag) with exact iterates."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L1Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import PDS
    from pycsou_tpu.parallel.solvers import DistributedTVDeconv2D

    shape = (64, 64)
    filt = _gauss(7, 1.5)
    y = Convolve2D(shape, filt)(jnp.ones(shape))
    mesh = make_mesh(axis_names=("sp",))
    xsh = NamedSharding(mesh, P("sp", None))

    tau_ne = _tv_pds_fused(shape, y, filt, tau=0.1, sigma=0.05, max_iter=50)
    assert tau_ne._fused is not None
    sh1 = tau_ne.with_shardings(x=xsh)
    assert sh1._fused is None and sh1.state_shardings

    mk_aniso = lambda fuse: PDS(
        shape, F=SquaredL2Loss(shape, data=y) * Convolve2D(shape, filt),
        H=0.05 * L1Norm((2,) + shape), K=Gradient(shape), max_iter=100,
        fuse=fuse,
    )
    aniso = mk_aniso(True)
    assert aniso._fused is not None and not aniso._fused.iso
    sh2 = aniso.with_shardings(x=xsh)
    assert isinstance(sh2._fused, DistributedTVDeconv2D) and not sh2._fused.iso
    st_s = sh2.run_fixed(25)
    st_g = mk_aniso(False).run_fixed(25)
    np.testing.assert_allclose(
        np.asarray(st_s["x"]), np.asarray(st_g["x"]), rtol=2e-4, atol=2e-5
    )


def test_cps_delegate_sharding_declines_routing(rng):
    """A CPS-routed denoise delegate carries tau' = tau/(1+2tau) != sigma —
    the distributed engines can't express it, so sharding falls back to the
    generic GSPMD chain with CORRECT iterates (regression: routing once read
    the PDS's own tau instead of the delegate's)."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import CPS

    shape = (32, 32)
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    mk = lambda fuse: CPS(
        shape, G=SquaredL2Loss(shape, data=y),
        H=0.1 * L21Norm((2,) + shape, axis=0), K=Gradient(shape),
        max_iter=100, fuse=fuse,
    )
    cps = mk(True)
    assert cps._fused is not None and cps._fused.tau != cps._fused.sigma
    mesh = make_mesh(axis_names=("sp",))
    sharded = cps.with_shardings(x=NamedSharding(mesh, P("sp", None)))
    assert sharded._fused is None and sharded.state_shardings
    st_s = sharded.run_fixed(25)
    st_g = mk(False).run_fixed(25)
    np.testing.assert_allclose(
        np.asarray(st_s["x"]), np.asarray(st_g["x"]), rtol=2e-4, atol=2e-5
    )


def test_sharded_inpainting_routes_to_distributed_mask_mode(rng):
    """A fused inpainting expression + row sharding re-dispatches onto
    DistributedTVDeconv2D's mask mode with exact iterates."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.ops.sampling import Masking
    from pycsou_tpu.opt import PDS
    from pycsou_tpu.parallel.solvers import DistributedTVDeconv2D

    shape = (64, 64)
    keep = rng.random(shape) < 0.5
    M = Masking(shape, keep)
    y = M(jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32))
    mk = lambda fuse: PDS(
        shape, F=SquaredL2Loss(M.codim_shape, data=y) * M,
        H=0.05 * L21Norm((2,) + shape, axis=0), K=Gradient(shape),
        max_iter=100, fuse=fuse,
    )
    mesh = make_mesh(axis_names=("sp",))
    sharded = mk(True).with_shardings(x=NamedSharding(mesh, P("sp", None)))
    assert isinstance(sharded._fused, DistributedTVDeconv2D)
    assert sharded._fused.mask is not None
    st_s = sharded.run_fixed(25)
    st_g = mk(False).run_fixed(25)
    np.testing.assert_allclose(
        np.asarray(st_s["x"]), np.asarray(st_g["x"]), rtol=2e-4, atol=2e-5
    )


def test_sharded_inpainting_routes_to_spatial2d_mask_mode(rng):
    """A fused inpainting expression + 2-D spatial sharding re-dispatches
    onto Spatial2DTVDeconv2D's mask mode with exact iterates."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.ops.sampling import Masking
    from pycsou_tpu.opt import PDS
    from pycsou_tpu.parallel.solvers import Spatial2DTVDeconv2D

    shape = (32, 64)
    keep = rng.random(shape) < 0.5
    M = Masking(shape, keep)
    y = M(jnp.asarray(np.abs(rng.standard_normal(shape)), jnp.float32))
    mk = lambda fuse: PDS(
        shape, F=SquaredL2Loss(M.codim_shape, data=y) * M,
        H=0.05 * L21Norm((2,) + shape, axis=0), K=Gradient(shape),
        max_iter=100, fuse=fuse,
    )
    mesh = make_mesh((2, 4), ("sp0", "sp1"))
    sharded = mk(True).with_shardings(x=NamedSharding(mesh, P("sp0", "sp1")))
    assert isinstance(sharded._fused, Spatial2DTVDeconv2D)
    assert sharded._fused.mask is not None
    st_s = sharded.run_fixed(25)
    st_g = mk(False).run_fixed(25)
    np.testing.assert_allclose(
        np.asarray(st_s["x"]), np.asarray(st_g["x"]), rtol=2e-4, atol=2e-5
    )
