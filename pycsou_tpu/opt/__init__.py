from pycsou_tpu.opt.proxalgs import (
    APGD,
    CPS,
    DRS,
    FBS,
    PDS,
    AcceleratedProximalGradientDescent,
    ChambollePockSplitting,
    DouglasRachfordSplitting,
    ForwardBackwardSplitting,
    PrimalDualSplitting,
)
