from pycsou_tpu.opt.admm import ConsensusADMM
from pycsou_tpu.opt.lasso import LassoDeconvolution
from pycsou_tpu.opt.mcmc import PMYULA
from pycsou_tpu.opt.tv import TVDeconvolution
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
