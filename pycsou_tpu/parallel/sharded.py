"""Mesh-sharded explicit operators — the TPU replacement for the reference's
Dask-chunked matrices (/root/reference/pycsou/linop/base.py:87-156).

A ``ShardedDenseOperator`` keeps its matrix distributed over a 1-D or 2-D
device mesh as a sharded ``jax.Array``; matvec/rmatvec are ordinary jitted
contractions and XLA's SPMD partitioner inserts the psum/all-gather
collectives (the scaling-book recipe: annotate shardings, let XLA place the
communication on ICI).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pycsou_tpu.ops.basic import DenseOperator
from pycsou_tpu.parallel.mesh import make_mesh

__all__ = ["ShardedDenseOperator"]


from pycsou_tpu._module import static_field


class ShardedDenseOperator(DenseOperator):
    """Dense operator whose matrix lives sharded across a device mesh.

    ``row_axis``/``col_axis`` name the mesh axes over which the matrix's two
    dimensions are partitioned (either may be None).  Outputs follow the row
    sharding; adjoint outputs follow the column sharding.
    """

    # static pytree aux data: survive flatten/unflatten through jit/vmap
    _mesh: Optional[Mesh] = static_field(default=None)
    _row_axis: Optional[str] = static_field(default=None)
    _col_axis: Optional[str] = static_field(default=None)

    def __init__(self, mat, mesh: Optional[Mesh] = None, row_axis: Optional[str] = "sp", col_axis: Optional[str] = None, dtype=None):
        mat = jnp.asarray(mat)
        mesh = mesh if mesh is not None else make_mesh(axis_names=(row_axis or "sp",))
        spec = PartitionSpec(row_axis, col_axis)
        mat = jax.device_put(mat, NamedSharding(mesh, spec))
        super().__init__(mat, dtype=dtype)
        self.mat = mat  # keep the sharded placement
        self._mesh = mesh
        self._row_axis = row_axis
        self._col_axis = col_axis

    @property
    def mesh(self):
        return getattr(self, "_mesh", None)

    @property
    def row_axis(self):
        return self._row_axis

    @property
    def col_axis(self):
        return self._col_axis
