"""Miscellaneous utilities: test functions, shape broadcasting helpers.

Equivalent of /root/reference/pycsou/util/misc.py:15-127 (``beamer2rst`` is
doc tooling, deliberately dropped).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["peaks", "is_range_broadcastable", "range_broadcast_shape"]


def peaks(x, y):
    """MATLAB's peaks test surface (reference util/misc.py:91-127), jittable.

    Example::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.utils.misc import peaks
        >>> round(float(peaks(jnp.array(0.0), jnp.array(0.0))), 4)
        0.981
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    return (
        3 * (1 - x) ** 2 * jnp.exp(-(x**2) - (y + 1) ** 2)
        - 10 * (x / 5 - x**3 - y**5) * jnp.exp(-(x**2) - y**2)
        - 1 / 3 * jnp.exp(-((x + 1) ** 2) - y**2)
    )


def is_range_broadcastable(shape1: Tuple[int, int], shape2: Tuple[int, int]) -> bool:
    """Matrix-style shapes (m, n): domains must agree, ranges must agree or
    one be 1 (reference util/misc.py:15-55)."""
    if shape1[1] != shape2[1]:
        return False
    return shape1[0] == shape2[0] or 1 in (shape1[0], shape2[0])


def range_broadcast_shape(shape1: Tuple[int, int], shape2: Tuple[int, int]) -> Tuple[int, int]:
    """Broadcast shape of two range-broadcastable shapes (misc.py:58-88)."""
    if not is_range_broadcastable(shape1, shape2):
        raise ValueError(f"shapes {shape1} and {shape2} are not range-broadcastable")
    return (max(shape1[0], shape2[0]), shape1[1])
