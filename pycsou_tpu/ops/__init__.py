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
from pycsou_tpu.ops.conv import Convolve1D, Convolve2D, MovingAverage1D, MovingAverage2D
from pycsou_tpu.ops.diff import (
    DirectionalGradient,
    DirectionalLaplacian,
    FirstDerivative,
    FirstDirectionalDerivative,
    GeneralisedDerivative,
    GeneralisedLaplacian,
    Gradient,
    Integration1D,
    Laplacian,
    SecondDerivative,
    SecondDirectionalDerivative,
)
from pycsou_tpu.ops.kron import KhatriRaoProduct, KroneckerProduct, KroneckerSum
from pycsou_tpu.ops.sampling import (
    DownSampling,
    GeneralisedVandermonde,
    MappedDistanceMatrix,
    Masking,
    NNSampling,
    Pooling,
    SubSampling,
)
from pycsou_tpu.ops.stack import (
    BlockDiagonalOperator,
    BlockOperator,
    LinOpHStack,
    LinOpStack,
    LinOpVStack,
    MapHStack,
    MapStack,
    MapVStack,
)
from pycsou_tpu.ops.transform import DCTOperator, FFTOperator, IDCTOperator
