from pycsou_tpu.ops.basic import (
    DenseOperator,
    DiagonalOperator,
    ExplicitLinearOperator,
    HomothetyOperator,
    IdentityOperator,
    NullOperator,
    PolynomialOperator,
    SparseOperator,
)
