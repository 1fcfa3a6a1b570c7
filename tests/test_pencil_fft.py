"""Pencil-decomposed distributed FFT == global transforms (8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pycsou_tpu.ops.conv import CircularConvolve
from pycsou_tpu.parallel import PencilCircularConv2D, make_mesh
from pycsou_tpu.parallel.fft import pencil_irfft2, pencil_rfft2


def _gauss(k, s=2.0):
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * s**2))
    f = np.outer(g, g).astype(np.float32)
    return f / f.sum()


@pytest.mark.parametrize("shape", [(64, 96), (64, 64), (32, 50)])
def test_pencil_rfft2_matches_global(rng, shape):
    mesh = make_mesh(axis_names=("sp",))
    n = mesh.shape["sp"]
    H, W = shape
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)

    def fwd(block):
        S = pencil_rfft2(block, "sp")
        return jnp.real(S), jnp.imag(S)

    re, im = jax.jit(
        shard_map(fwd, mesh=mesh, in_specs=(P("sp", None),), out_specs=(P(None, "sp"),) * 2)
    )(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = np.asarray(jnp.fft.rfft2(x))
    np.testing.assert_allclose(got[:, : W // 2 + 1], want, rtol=2e-4, atol=1e-3)
    # padding pencils beyond the half-spectrum are exactly zero
    assert np.all(got[:, W // 2 + 1 :] == 0)


def test_pencil_roundtrip_identity(rng):
    mesh = make_mesh(axis_names=("sp",))
    H, W = 64, 80
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)

    def rt(block):
        return pencil_irfft2(pencil_rfft2(block, "sp"), "sp", W).astype(jnp.float32)

    y = jax.jit(shard_map(rt, mesh=mesh, in_specs=(P("sp", None),), out_specs=P("sp", None)))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_pencil_circular_conv_matches_single_device(rng):
    H, W = 64, 96
    filt = _gauss(9)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    ref = CircularConvolve((H, W), filt)
    mesh = make_mesh(axis_names=("sp",))
    op = PencilCircularConv2D((H, W), filt, mesh=mesh)

    np.testing.assert_allclose(np.asarray(op.apply(x)), np.asarray(ref.apply(x)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(op.adjoint(x)), np.asarray(ref.adjoint(x)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(op.gram.apply(x)),
        np.asarray(ref.adjoint(ref.apply(x))),
        rtol=1e-4, atol=1e-5,
    )
    assert abs(op.lipschitz - ref.lipschitz) < 1e-6


def test_pencil_circular_conv_dot_test(rng):
    """<Ax, y> == <x, A^H y> with sharded inputs."""
    H, W = 32, 48
    op = PencilCircularConv2D((H, W), _gauss(7))
    mesh = op.mesh
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((H, W)), jnp.float32),
        NamedSharding(mesh, P("sp", None)),
    )
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((H, W)), jnp.float32),
        NamedSharding(mesh, P("sp", None)),
    )
    lhs = float(jnp.vdot(op.apply(x), y))
    rhs = float(jnp.vdot(x, op.adjoint(y)))
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))


def test_pencil_pinv_matches_single_device(rng):
    """Damped Fourier pinv: pencil == CircularConvolve.pinv.  (Undamped
    exact recovery is NOT asserted — a Gaussian transfer reaches ~1e-7 at
    Nyquist, beyond f32 inversion regardless of the distribution scheme.)"""
    H, W = 32, 64
    filt = _gauss(7)
    op = PencilCircularConv2D((H, W), filt)
    ref = CircularConvolve((H, W), filt)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    y = op.apply(x)
    a = op.pinv(y, damp=1e-4)
    b = ref.pinv(y, damp=1e-4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_pencil_requires_divisible_rows():
    with pytest.raises(ValueError):
        PencilCircularConv2D((30, 64), _gauss(5))  # 30 % 8 != 0


def test_pencil_in_generic_sharded_solver(rng):
    """PencilCircularConv2D composes with the generic SPMD solve path
    (solver.with_shardings): circular deconvolution via APGD + pencil Gram."""
    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.opt import APGD

    H, W = 32, 48
    filt = _gauss(7)
    mesh = make_mesh(axis_names=("sp",))
    op = PencilCircularConv2D((H, W), filt, mesh=mesh)
    x_true = jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
    y = op.apply(x_true)

    F = SquaredL2Loss((H, W), data=y) * op
    solver = APGD((H, W), F=F, x0=jnp.zeros((H, W), jnp.float32), max_iter=60, min_iter=60)
    sharded = solver.with_shardings(x=NamedSharding(mesh, P("sp", None))).solve()

    ref_op = CircularConvolve((H, W), filt)
    F1 = SquaredL2Loss((H, W), data=y) * ref_op
    single = APGD((H, W), F=F1, x0=jnp.zeros((H, W), jnp.float32), max_iter=60, min_iter=60).solve()
    np.testing.assert_allclose(
        np.asarray(sharded["x"]), np.asarray(single["x"]), rtol=1e-3, atol=1e-4
    )
