"""Green function / radial basis kernels: Matern, Wendland, causal Green
functions, sub-Gaussians.

Jittable equivalents of /root/reference/pycsou/math/green.py:16-344; each
kernel is a pure callable usable inside ``MappedDistanceMatrix`` and traced
into XLA (the reference evaluates with host numpy).  Wendland k=0 support
radius fixes the reference's attribute/method collision quirk (green.py:162
vs :177 — SURVEY §7).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "Matern",
    "Wendland",
    "CausalGreenIteratedDerivative",
    "CausalGreenExponential",
    "SubGaussian",
]


class Matern:
    """Matern radial kernel of half-integer order k in {0,1,2,3}
    (reference green.py:16-107).

    Example::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.math.green import Matern
        >>> phi = Matern(k=0, epsilon=1.0)        # exp(-r)
        >>> float(phi(jnp.array(0.0)))
        1.0
        >>> round(float(phi(jnp.array(1.0))), 5)
        0.36788
    """

    def __init__(self, k: int = 0, epsilon: float = 1.0):
        if k not in (0, 1, 2, 3):
            raise ValueError("k must be in {0, 1, 2, 3}")
        self.k = int(k)
        self.epsilon = float(epsilon)

    def __call__(self, r):
        r = jnp.asarray(r)
        e = self.epsilon
        if self.k == 0:
            return jnp.exp(-r / e)
        if self.k == 1:
            s = math.sqrt(3)
            return (1 + s * r / e) * jnp.exp(-s * r / e)
        if self.k == 2:
            s = math.sqrt(5)
            return (1 + s * r / e + (5 * r**2) / (3 * e**2)) * jnp.exp(-s * r / e)
        s = math.sqrt(7)
        return (
            1 + s * r / e + (42 * r**2) / (15 * e**2) + (7 * s * r**3) / (15 * e**3)
        ) * jnp.exp(-s * r / e)

    def support(self, sigmas: float = 3.0) -> float:
        """Effective support radius (reference green.py:107)."""
        return sigmas * self.epsilon


class Wendland:
    """Compactly supported Wendland kernels, k in {0,1,2,3}
    (reference green.py:110-178, closed forms of [FuncSphere] Fig. 8.2)."""

    def __init__(self, k: int = 0, epsilon: float = 1.0):
        if k not in (0, 1, 2, 3):
            raise ValueError("k must be in {0, 1, 2, 3}")
        self.k = int(k)
        self.epsilon = float(epsilon)

    @property
    def support(self) -> float:
        """Compact support radius (the Wendland cutoff ``epsilon``)."""
        return self.epsilon

    def __call__(self, r):
        r = jnp.asarray(r)
        e = self.epsilon
        t = jnp.maximum(1 - r / e, 0.0)
        if self.k == 0:
            return t**2
        if self.k == 1:
            return t**4 * (1 + 4 * r / e)
        if self.k == 2:
            return t**6 * (1 + 6 * r / e + 35 * r**2 / (3 * e**2))
        return t**8 * (1 + 8 * r / e + 25 * r**2 / e**2 + 32 * r**3 / e**3)


class CausalGreenIteratedDerivative:
    """Green function of D^k: ``x^{k-1} 1_{x>=0}`` (reference green.py:181-221,
    up to the 1/(k-1)! normalisation the reference also omits)."""

    def __init__(self, k: int = 1):
        self.k = int(k)

    def __call__(self, x):
        x = jnp.asarray(x)
        return jnp.where(x >= 0, x ** (self.k - 1), 0.0)


class CausalGreenExponential:
    """Green function of (D + alpha I)^k: ``x^{k-1} e^{-alpha x} 1_{x>=0}``
    (reference green.py:224-269)."""

    def __init__(self, k: int = 1, alpha: float = 1.0):
        self.k = int(k)
        self.alpha = float(alpha)

    def __call__(self, x):
        x = jnp.asarray(x)
        return jnp.where(x >= 0, x ** (self.k - 1) * jnp.exp(-self.alpha * jnp.maximum(x, 0.0)), 0.0)


class SubGaussian:
    """``exp(-r^alpha / epsilon)`` (reference green.py:272-344)."""

    def __init__(self, alpha: float = 1.0, epsilon: float = 1.0):
        if not 0 < alpha <= 2:
            raise ValueError("alpha must be in (0, 2]")
        self.alpha = float(alpha)
        self.epsilon = float(epsilon)

    def __call__(self, r):
        r = jnp.asarray(r)
        return jnp.exp(-(r**self.alpha) / self.epsilon)
