from pycsou_tpu.parallel.fft import PencilCircularConv2D, pencil_irfft2, pencil_rfft2
from pycsou_tpu.parallel.mesh import distributed_init, make_mesh, replicated, shard_along
from pycsou_tpu.parallel.sharded import ShardedBlockDiagonalOperator, ShardedDenseOperator
from pycsou_tpu.parallel.solvers import (
    BatchedDistributedTVDeconv2D,
    DistributedTVDeconv2D,
    Spatial2DTVDeconv2D,
)
from pycsou_tpu.parallel.spatial import (
    halo_from_next,
    halo_from_prev,
    pdot,
    pnorm,
    sharded_conv2d,
    sharded_conv2d_adjoint,
    sharded_fdiff_rows,
    sharded_fdiff_rows_adjoint,
    sharded_grad2d,
    sharded_grad2d_adjoint,
)
