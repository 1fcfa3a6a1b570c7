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


def test_sharded_dense_from_blocks(rng):
    """Out-of-core assembly: per-device row blocks, no full-matrix host copy
    (the Dask-chunked construction analogue, reference base.py:87-99)."""
    from pycsou_tpu.parallel import ShardedDenseOperator, make_mesh

    mesh = make_mesh(axis_names=("sp",))
    blocks = [rng.standard_normal((4, 10)).astype(np.float32) for _ in range(8)]
    op = ShardedDenseOperator.from_blocks(blocks, mesh=mesh)
    M = np.concatenate(blocks, axis=0)
    x = jnp.asarray(rng.standard_normal(10), jnp.float32)
    y = jnp.asarray(rng.standard_normal(32), jnp.float32)
    np.testing.assert_allclose(np.asarray(op(x)), M @ np.asarray(x), rtol=1e-4, atol=1e-5)
    # rmatvec = psum of per-shard partials over the mesh
    np.testing.assert_allclose(np.asarray(op.adjoint(y)), M.T @ np.asarray(y), rtol=1e-4, atol=1e-5)
    assert not op.mat.sharding.is_fully_replicated


def test_sharded_dense_2d_mesh(rng):
    """2-D (rows x cols) sharding: local block contraction + psum over the
    contracted axis, exact vs numpy."""
    from pycsou_tpu.parallel import ShardedDenseOperator, make_mesh

    mesh = make_mesh((4, 2), ("r", "c"))
    M = rng.standard_normal((16, 12)).astype(np.float32)
    op = ShardedDenseOperator(M, mesh=mesh, row_axis="r", col_axis="c")
    x = jnp.asarray(rng.standard_normal(12), jnp.float32)
    y = jnp.asarray(rng.standard_normal(16), jnp.float32)
    np.testing.assert_allclose(np.asarray(jax.jit(op.apply)(x)), M @ np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.jit(op.adjoint)(y)), M.T @ np.asarray(y), rtol=1e-4, atol=1e-5)


def test_sharded_block_diagonal(rng, dot_test):
    """Mesh-sharded block-diagonal: zero-collective per-device blocks
    (reference BlockDiagonal n_jobs promise, base.py:536-539)."""
    from pycsou_tpu.ops.basic import DenseOperator
    from pycsou_tpu.opt.admm import stack_operators
    from pycsou_tpu.parallel import make_mesh
    from pycsou_tpu.parallel.sharded import ShardedBlockDiagonalOperator

    mesh = make_mesh(axis_names=("dp",))
    S, m, n = 8, 6, 5
    mats = [rng.standard_normal((m, n)).astype(np.float32) for _ in range(S)]
    ops = stack_operators([DenseOperator(jnp.asarray(M)) for M in mats])
    B = ShardedBlockDiagonalOperator(ops, n_blocks=S, mesh=mesh)
    assert B.dim_shape == (S, n) and B.codim_shape == (S, m)
    x = jnp.asarray(rng.standard_normal((S, n)), jnp.float32)
    got = np.asarray(B(x))
    want = np.stack([M @ np.asarray(x[i]) for i, M in enumerate(mats)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    dot_test(B)
