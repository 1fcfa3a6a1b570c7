"""Arithmetic dispatch: picks the most specific wrapper node so linearity,
differentiability and proximability survive composition.

Centralises what the reference spreads over ``Map.__add__``/``__mul__``
overrides in three class ladders (/root/reference/pycsou/core/map.py:198-334,
linop.py:442-553, functional.py:225-313).  All nodes built here are pytrees
whose ``apply``/``adjoint``/``prox`` trace into a single XLA computation.
"""
from __future__ import annotations

from numbers import Number

import jax.numpy as jnp
import numpy as np

from pycsou_tpu.core.functional import (
    LinearFunctional,
    ProxFuncAffineSum,
    ProxFuncPreComp,
    ProxFuncPreCompUnitOp,
    ProximableFunctional,
)
from pycsou_tpu.core.linop import LinearOperator, LinOpComp, LinOpSum, UnitaryMixin
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

__all__ = ["add", "compose", "scale_input", "scale_output", "shift"]


def add(m1: Map, m2: Map) -> Map:
    if isinstance(m1, ProximableFunctional) and isinstance(m2, LinearFunctional):
        return ProxFuncAffineSum(m1, linear_part=m2, intercept=0.0)
    if isinstance(m2, ProximableFunctional) and isinstance(m1, LinearFunctional):
        return ProxFuncAffineSum(m2, linear_part=m1, intercept=0.0)
    if isinstance(m1, LinearOperator) and isinstance(m2, LinearOperator):
        return LinOpSum(m1, m2)
    if isinstance(m1, DifferentiableMap) and isinstance(m2, DifferentiableMap):
        return DiffMapSum(m1, m2)
    return MapSum(m1, m2)


def compose(m1: Map, m2: Map) -> Map:
    from pycsou_tpu.ops.basic import HomothetyOperator

    if isinstance(m1, ProximableFunctional):
        if isinstance(m2, HomothetyOperator):
            return ProxFuncPreComp(m1, scale=m2.constant, shift=0.0)
        if isinstance(m2, UnitaryMixin):
            return ProxFuncPreCompUnitOp(m1, m2)
    if isinstance(m2, LinearOperator):
        data = _squared_l2_data(m1)
        if data is not None:
            # ||. - y||^2 o A -> fused least-squares node whose gradient goes
            # through A's (possibly FFT-fused) Gram: 2(A^H A x - A^H y)
            from pycsou_tpu.func.loss import LeastSquaresLoss

            return LeastSquaresLoss(m2, data=data)
    if isinstance(m1, LinearOperator) and isinstance(m2, LinearOperator):
        return LinOpComp(m1, m2)
    if isinstance(m1, DifferentiableMap) and isinstance(m2, DifferentiableMap):
        return DiffMapComp(m1, m2)
    return MapComp(m1, m2)


def _squared_l2_data(m: Map):
    """Return y if ``m`` is ``||. - y||^2`` (a SquaredL2Norm, possibly
    data-shifted with unit scale), else None."""
    import jax.numpy as jnp

    from pycsou_tpu.func.penalty import SquaredL2Norm

    if isinstance(m, SquaredL2Norm):
        return jnp.zeros(m.dim_shape, jnp.float32)
    if isinstance(m, ProxFuncPreComp) and isinstance(m.func, SquaredL2Norm):
        scale = np.asarray(m.scale)
        if scale.ndim == 0 and scale == 1.0:
            return -m.shift
    return None


def scale_input(m: Map, alpha) -> Map:
    """``x -> f(alpha x)`` (reference ``Map.__mul__`` scalar path, map.py:253)."""
    from pycsou_tpu.ops.basic import HomothetyOperator

    if isinstance(alpha, Number) and alpha == 1:
        return m
    if isinstance(m, ProximableFunctional):
        return ProxFuncPreComp(m, scale=alpha, shift=0.0)
    dtype = getattr(m, "dtype", np.float32)
    return compose(m, HomothetyOperator(alpha, m.dim_shape, dtype=dtype))


def scale_output(m: Map, alpha) -> Map:
    """``x -> alpha f(x)`` (reference ``Map.__rmul__`` scalar path, map.py:550)."""
    from pycsou_tpu.ops.basic import HomothetyOperator

    if isinstance(alpha, Number) and alpha == 1:
        return m
    if isinstance(m, ProximableFunctional) and isinstance(alpha, Number) and alpha > 0:
        from pycsou_tpu.core.functional import ProxFuncPostComp

        return ProxFuncPostComp(m, scale=float(alpha), shift=0.0)
    dtype = getattr(m, "dtype", np.float32)
    return compose(HomothetyOperator(alpha, m.codim_shape, dtype=dtype), m)


def shift(m: Map, s) -> Map:
    """``x -> f(x + s)`` (reference ``shifter``, map.py:177)."""
    if isinstance(m, ProximableFunctional):
        return ProxFuncPreComp(m, scale=1.0, shift=s)
    if isinstance(m, DifferentiableMap):
        return DiffMapShifted(m, s)
    return MapShifted(m, s)
