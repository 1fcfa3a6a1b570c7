from pycsou_tpu.utils.diagnostics import autocovariance, effective_sample_size, split_rhat
from pycsou_tpu.utils.opnorm import lanczos_eigs, power_iteration
from pycsou_tpu.utils.shapes import as_shape, size_of
