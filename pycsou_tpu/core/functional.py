"""Functional calculus: differentiable / linear / proximable functionals and
automatic proximation rules.

Re-design of /root/reference/pycsou/core/functional.py:20-313.  Gradients of
differentiable functionals default to ``jax.grad`` of the (pure, jittable)
``apply`` — the reference hand-writes each gradient.  The prox transformation
rules ([ProxAlg] Section 2.2) are kept verbatim: they are mathematical
identities XLA cannot derive, and each rule node's ``prox`` remains a pure
jittable function of ``(x, tau)`` so the whole solver iteration fuses.
"""
from __future__ import annotations

from numbers import Number
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pycsou_tpu._module import static_field
from pycsou_tpu.core.linop import LinearOperator, UnitaryMixin
from pycsou_tpu.core.map import DifferentiableMap, Map
from pycsou_tpu.utils.shapes import as_shape

__all__ = [
    "Functional",
    "DifferentiableFunctional",
    "LinearFunctional",
    "ProximableFunctional",
    "ProxFuncPostComp",
    "ProxFuncAffineSum",
    "ProxFuncPreComp",
    "ProxFuncPreCompUnitOp",
]

_INF = float("inf")


class Functional(Map):
    """Scalar-valued map (reference functional.py:20): ``codim_shape == ()``."""

    def __init__(self, dim_shape, lipschitz: float = _INF):
        Map.__init__(self, dim_shape, (), lipschitz=lipschitz)


class DifferentiableFunctional(Functional, DifferentiableMap):
    """Differentiable functional (reference functional.py:48).

    ``gradient`` defaults to ``jax.grad(self.apply)`` — closed-form overrides
    only where cheaper (e.g. quadratic forms).
    """

    def __init__(self, dim_shape, lipschitz: float = _INF, diff_lipschitz: float = _INF):
        DifferentiableMap.__init__(self, dim_shape, (), lipschitz=lipschitz, diff_lipschitz=diff_lipschitz)

    def jacobianT(self, x) -> jax.Array:
        """Gradient *array* at ``x`` (the reference convention for
        functionals; the chain-rule node evaluates operators on it)."""
        return jax.grad(self.apply)(jnp.asarray(x))

    def gradient(self, x) -> jax.Array:
        """Alias for :meth:`jacobianT` (gradient array at ``x``)."""
        return self.jacobianT(x)


class LinearFunctional(LinearOperator, Functional):
    """Linear functional ``x -> <v, x>`` (reference functional.py:78)."""

    def __init__(self, dim_shape, lipschitz: float = _INF, dtype=np.float32):
        LinearOperator.__init__(self, dim_shape, (), lipschitz=lipschitz, dtype=dtype)

    def asvector(self) -> jax.Array:
        """The Riesz representer ``v = A^H 1``."""
        one = jnp.ones((), dtype=self.dtype)
        return self.adjoint(one)


class ProximableFunctional(Functional):
    """Convex functional with a tractable proximity operator
    (reference functional.py:90).

    ``prox(x, tau)`` must be a pure jittable function.  ``fenchel_prox``
    follows from Moreau's identity (functional.py:176-207).

    Example — the prox rules are automatic (reference functional.py:122-132)::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.func.penalty import L1Norm
        >>> f = L1Norm((3,))
        >>> x, tau = jnp.array([2.0, -0.5, 1.0]), 0.5
        >>> g = 2.0 * f                            # ProxFuncPostComp node
        >>> bool(jnp.allclose(g.prox(x, tau), f.prox(x, 2.0 * tau)))
        True
        >>> # Moreau identity: x = prox_f(x) + prox_{f*}(x) at tau = 1
        >>> bool(jnp.allclose(f.prox(x, 1.0) + f.fenchel_prox(x, 1.0), x))
        True
    """

    def prox(self, x: jax.Array, tau) -> jax.Array:
        """Proximity operator ``argmin_u f(u) + ||u - x||^2 / (2 tau)``
        (pure/jittable; reference functional.py:150)."""
        raise NotImplementedError

    def fenchel_prox(self, z: jax.Array, sigma) -> jax.Array:
        """prox of the sigma-scaled Fenchel conjugate via Moreau's identity:
        ``prox_{sigma f*}(z) = z - sigma * prox_{f/sigma}(z/sigma)``."""
        z = jnp.asarray(z)
        return z - sigma * self.prox(z / sigma, 1.0 / sigma)

    def shifter(self, shift) -> "ProxFuncPreComp":
        """Shifted functional keeping the prox (reference functional.py:209)."""
        return ProxFuncPreComp(self, scale=1.0, shift=shift)

    # -- prox-preserving arithmetic (reference functional.py:225-250) ------
    def __add__(self, other):
        if isinstance(other, LinearFunctional):
            return ProxFuncAffineSum(self, linear_part=other, intercept=0.0)
        return super().__add__(other)

    def __mul__(self, other):
        from pycsou_tpu.ops.basic import HomothetyOperator

        if isinstance(other, Number):
            return ProxFuncPreComp(self, scale=other, shift=0.0)
        if isinstance(other, (np.ndarray, jax.Array)) and not isinstance(other, Map):
            # diagonal precomposition rule — valid for separable functionals
            # (reference functional.py:233 applies the same formula)
            return ProxFuncPreComp(self, scale=jnp.asarray(other), shift=0.0)
        if isinstance(other, HomothetyOperator):
            return ProxFuncPreComp(self, scale=other.constant, shift=0.0)
        if isinstance(other, UnitaryMixin):
            return ProxFuncPreCompUnitOp(self, other)
        return super().__mul__(other)

    def __rmul__(self, other):
        if isinstance(other, Number) and other > 0:
            return ProxFuncPostComp(self, scale=float(other), shift=0.0)
        return super().__rmul__(other)


# ---------------------------------------------------------------------------
# Automatic proximation rule nodes (reference functional.py:253-313)
# ---------------------------------------------------------------------------


def _diff_variant(cls, func):
    """If the wrapped functional is differentiable, build the node as its
    *differentiable* subclass so downstream arithmetic keeps the chain rule
    (e.g. ``SquaredL2Loss * G`` must stay a DifferentiableMap)."""
    diff_cls = _PLAIN_TO_DIFF.get(cls)
    if diff_cls is not None and isinstance(func, DifferentiableMap):
        return object.__new__(diff_cls)
    return object.__new__(cls)


class ProxFuncPostComp(ProximableFunctional):
    """``alpha * f + c`` for ``alpha > 0``:
    ``prox_{tau g} = prox_{tau alpha f}`` (functional.py:253)."""

    func: ProximableFunctional = None
    scale: float = static_field(default=1.0)
    shift: float = static_field(default=0.0)

    def __new__(cls, func, *args, **kwargs):
        return _diff_variant(cls, func)

    def __init__(self, func: ProximableFunctional, scale: float, shift: float = 0.0):
        super().__init__(func.dim_shape, lipschitz=abs(scale) * func.lipschitz)
        self.func = func
        self.scale = float(scale)
        self.shift = float(shift)

    def apply(self, x):
        return self.scale * self.func.apply(x) + self.shift

    def prox(self, x, tau):
        return self.func.prox(x, tau * self.scale)

    # gradient passthrough when the base functional is differentiable
    def gradient(self, x):
        """Chain rule: ``alpha * grad f(x)`` (wrapped func differentiable)."""
        return self.scale * self.func.gradient(x)

    @property
    def diff_lipschitz(self):
        """beta of the wrapped differentiable functional, scaled by the rule."""
        return abs(self.scale) * getattr(self.func, "diff_lipschitz", _INF)


class ProxFuncAffineSum(ProximableFunctional):
    """``f + <a, .> + c``: ``prox(x) = prox_f(x - tau a)`` (functional.py:268)."""

    func: ProximableFunctional = None
    linear_part: LinearFunctional = None
    intercept: float = static_field(default=0.0)

    def __new__(cls, func, *args, **kwargs):
        return _diff_variant(cls, func)

    def __init__(self, func: ProximableFunctional, linear_part: LinearFunctional, intercept: float = 0.0):
        if as_shape(linear_part.dim_shape) != func.dim_shape:
            raise ValueError("affine part has mismatched domain")
        super().__init__(func.dim_shape, lipschitz=func.lipschitz + linear_part.lipschitz)
        self.func = func
        self.linear_part = linear_part
        self.intercept = float(intercept)

    def apply(self, x):
        return self.func.apply(x) + self.linear_part.apply(x) + self.intercept

    def prox(self, x, tau):
        a = self.linear_part.asvector()
        return self.func.prox(x - tau * a, tau)

    def gradient(self, x):
        """``grad f(x) + a`` (affine part adds its Riesz representer)."""
        return self.func.gradient(x) + self.linear_part.asvector()

    @property
    def diff_lipschitz(self):
        """beta of the wrapped differentiable functional, scaled by the rule."""
        return getattr(self.func, "diff_lipschitz", _INF)


class ProxFuncPreComp(ProximableFunctional):
    """``f(scale * x + shift)`` for scalar or elementwise ``scale``:
    ``prox(x, tau) = (prox_f(scale x + shift, tau scale^2) - shift)/scale``
    (functional.py:286; elementwise scale valid for separable ``f``)."""

    func: ProximableFunctional = None
    scale: jax.Array = None
    shift: jax.Array = None
    _max_scale: Optional[float] = static_field(default=None)

    def __new__(cls, func, *args, **kwargs):
        return _diff_variant(cls, func)

    def __init__(self, func: ProximableFunctional, scale, shift):
        try:
            scl = float(np.max(np.abs(np.asarray(scale))))
            lip = func.lipschitz * scl
        except Exception:
            scl, lip = None, _INF
        super().__init__(func.dim_shape, lipschitz=lip)
        self.func = func
        self.scale = jnp.asarray(scale)
        self.shift = jnp.asarray(shift)
        self._max_scale = scl

    def apply(self, x):
        return self.func.apply(self.scale * x + self.shift)

    def prox(self, x, tau):
        s = self.scale
        if s.ndim == 0:
            return (self.func.prox(s * x + self.shift, tau * s**2) - self.shift) / s
        # Elementwise scale: coordinates with scale == 0 do not influence
        # f(scale*x + shift), so the prox is the identity there — the naive
        # formula divides by zero (ADVICE r1).  Valid for separable f only,
        # which is the contract of elementwise precomposition already.
        safe = jnp.where(s == 0, 1.0, s)
        p = (self.func.prox(s * x + self.shift, tau * s**2) - self.shift) / safe
        return jnp.where(s == 0, x, p)

    def gradient(self, x):
        """Chain rule through the affine precomposition."""
        return self.scale * self.func.gradient(self.scale * x + self.shift)

    @property
    def diff_lipschitz(self):
        """beta of the wrapped functional through the precomposition scale."""
        scl = getattr(self, "_max_scale", None)
        if scl is None:
            return _INF
        return scl**2 * getattr(self.func, "diff_lipschitz", _INF)


class ProxFuncPreCompUnitOp(ProximableFunctional):
    """``f o U`` with ``U`` unitary: ``prox = U^H prox_f(U x, tau)``
    (functional.py:302)."""

    func: ProximableFunctional = None
    unitary: LinearOperator = None

    def __new__(cls, func, *args, **kwargs):
        return _diff_variant(cls, func)

    def __init__(self, func: ProximableFunctional, unitary: LinearOperator):
        if not isinstance(unitary, UnitaryMixin):
            raise TypeError("operator must be unitary for this prox rule")
        super().__init__(unitary.dim_shape, lipschitz=func.lipschitz)
        self.func = func
        self.unitary = unitary

    def apply(self, x):
        return self.func.apply(self.unitary.apply(x))

    def prox(self, x, tau):
        return self.unitary.adjoint(self.func.prox(self.unitary.apply(x), tau))

    def gradient(self, x):
        """Chain rule ``U^H grad f(U x)`` through the unitary map."""
        return self.unitary.adjoint(self.func.gradient(self.unitary.apply(x)))

    @property
    def diff_lipschitz(self):
        """beta of the wrapped differentiable functional, scaled by the rule."""
        return getattr(self.func, "diff_lipschitz", _INF)


# ---------------------------------------------------------------------------
# Differentiable variants of the prox-rule nodes.  Chosen automatically by
# ``__new__`` when the wrapped functional is differentiable, so composed
# losses (e.g. a shifted SquaredL2Norm) stay DifferentiableMaps and the chain
# rule / auto step-size machinery keeps working.
# ---------------------------------------------------------------------------


class DiffProxFuncPostComp(ProxFuncPostComp, DifferentiableFunctional):
    pass


class DiffProxFuncAffineSum(ProxFuncAffineSum, DifferentiableFunctional):
    pass


class DiffProxFuncPreComp(ProxFuncPreComp, DifferentiableFunctional):
    pass


class DiffProxFuncPreCompUnitOp(ProxFuncPreCompUnitOp, DifferentiableFunctional):
    pass


_PLAIN_TO_DIFF = {
    ProxFuncPostComp: DiffProxFuncPostComp,
    ProxFuncAffineSum: DiffProxFuncAffineSum,
    ProxFuncPreComp: DiffProxFuncPreComp,
    ProxFuncPreCompUnitOp: DiffProxFuncPreCompUnitOp,
}
