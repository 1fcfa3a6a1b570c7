"""Sharded explicit operators: distributed matvec == local matvec."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def test_sharded_dense_matches_local(rng, dot_test):
    from pycsou_tpu.parallel import ShardedDenseOperator, make_mesh

    mesh = make_mesh((8,), ("sp",))
    M = rng.standard_normal((64, 48)).astype(np.float32)
    op = ShardedDenseOperator(M, mesh=mesh, row_axis="sp")
    x = jnp.asarray(rng.standard_normal(48), jnp.float32)
    np.testing.assert_allclose(np.asarray(op(x)), M @ np.asarray(x), rtol=1e-4)
    y = jnp.asarray(rng.standard_normal(64), jnp.float32)
    np.testing.assert_allclose(np.asarray(op.adjoint(y)), M.T @ np.asarray(y), rtol=1e-4)
    dot_test(op)
    # column sharding path
    mesh2 = make_mesh((8,), ("cols",))
    op2 = ShardedDenseOperator(M, mesh=mesh2, row_axis=None, col_axis="cols")
    np.testing.assert_allclose(np.asarray(op2(x)), M @ np.asarray(x), rtol=1e-4)


def test_tosparse_roundtrip(rng):
    from pycsou_tpu.ops.basic import DenseOperator

    M = rng.standard_normal((12, 9)).astype(np.float32)
    M[np.abs(M) < 0.8] = 0.0
    op = DenseOperator(jnp.asarray(M))
    sp = op.tosparse()
    x = jnp.asarray(rng.standard_normal(9), jnp.float32)
    np.testing.assert_allclose(np.asarray(sp(x)), M @ np.asarray(x), rtol=1e-4, atol=1e-5)
