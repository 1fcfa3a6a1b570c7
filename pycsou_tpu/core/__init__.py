from pycsou_tpu.core.map import (
    DifferentiableMap,
    DiffMapComp,
    DiffMapShifted,
    DiffMapSum,
    Map,
    MapComp,
    MapShifted,
    MapSum,
)
from pycsou_tpu.core.linop import (
    AdjointOperator,
    JacobianTOperator,
    LinearOperator,
    LinOpComp,
    LinOpSum,
    PinvOperator,
    SymmetricLinearOperator,
    TransposeOperator,
    UnitaryMixin,
)
from pycsou_tpu.core.functional import (
    DifferentiableFunctional,
    Functional,
    LinearFunctional,
    ProxFuncAffineSum,
    ProxFuncPostComp,
    ProxFuncPreComp,
    ProxFuncPreCompUnitOp,
    ProximableFunctional,
)
