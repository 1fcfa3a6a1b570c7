from pycsou_tpu.math.green import (
    CausalGreenExponential,
    CausalGreenIteratedDerivative,
    Matern,
    SubGaussian,
    Wendland,
)
from pycsou_tpu.math.prox import (
    lambertw,
    proj_l1_ball,
    proj_l2_ball,
    proj_linfty_ball,
    proj_nonnegative_orthant,
    proj_segment,
    sign,
    soft,
)
