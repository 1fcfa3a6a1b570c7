from pycsou_tpu.func.base import (
    DiffFuncHStack,
    ExplicitLinearFunctional,
    IndicatorFunctional,
    LpNorm,
    NullDifferentiableFunctional,
    NullProximableFunctional,
    ProxFuncHStack,
)
