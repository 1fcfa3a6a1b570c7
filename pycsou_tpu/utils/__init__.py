from pycsou_tpu.utils.opnorm import lanczos_eigs, power_iteration
from pycsou_tpu.utils.shapes import as_shape, size_of
