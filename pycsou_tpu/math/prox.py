"""Proximal kernels: projections, soft-thresholding, Lambert W.

Jittable re-design of /root/reference/pycsou/math/prox.py:17-343.  All
functions are pure and trace into the surrounding solver iteration; the
reference's `scipy.brentq` root-finding projections (prox.py:158-164) are
replaced by sort/cumsum formulations that XLA can fuse (O(n log n) on device,
no host round-trip per iteration); Lambert W (used by the Shannon-entropy
prox) is a fixed-iteration Halley solve instead of scipy.special.lambertw.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sign",
    "soft",
    "proj_l1_ball",
    "proj_l2_ball",
    "proj_linfty_ball",
    "proj_nonnegative_orthant",
    "proj_segment",
    "lambertw",
]


def sign(x):
    """Complex-aware sign: x/|x|, 0 at 0.

    Parity note: the reference returns the CONJUGATE phase conj(x)/|x|
    (math/prox.py:17), which makes its complex soft-threshold flip the phase
    of every entry — mathematically wrong for the prox of |.| (which is
    ``(|x|-tau)_+ * x/|x|``).  We deliberately fix the convention here, the
    same way the DiagonalOperator Lipschitz quirk is fixed (SURVEY §7)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        mag = jnp.abs(x)
        return jnp.where(mag == 0, 0.0 + 0.0j, x / jnp.where(mag == 0, 1.0, mag))
    return jnp.sign(x)


def soft(x, tau):
    """Soft-thresholding / shrinkage operator (reference math/prox.py:67).

    Example::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.math.prox import soft
        >>> soft(jnp.array([2.0, -0.5, -3.0]), tau=1.0).tolist()
        [1.0, -0.0, -2.0]
    """
    x = jnp.asarray(x)
    return jnp.maximum(jnp.abs(x) - tau, 0.0) * sign(x)


def proj_l2_ball(x, radius):
    """Projection onto the l2 ball (reference math/prox.py:167).

    Example::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.math.prox import proj_l2_ball
        >>> proj_l2_ball(jnp.array([3.0, 4.0]), radius=1.0).tolist()
        [0.6000000238418579, 0.800000011920929]
    """
    x = jnp.asarray(x)
    nrm = jnp.sqrt(jnp.real(jnp.vdot(x, x)))
    scale = jnp.where(nrm <= radius, 1.0, radius / jnp.maximum(nrm, 1e-30))
    return scale * x


def proj_linfty_ball(x, radius):
    """Projection onto the l-infinity ball: elementwise clip of the modulus
    (reference math/prox.py:253; the reference mutates its input — we are
    pure by construction)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        mag = jnp.abs(x)
        return jnp.where(mag <= radius, x, x * (radius / jnp.maximum(mag, 1e-30)))
    return jnp.clip(x, -radius, radius)


def proj_l1_ball(x, radius):
    """Projection onto the l1 ball via sort/cumsum (jittable replacement for
    the reference's brentq root-finding, math/prox.py:158-164).

    Standard simplex-projection: with u = sort(|x|, desc), find the largest
    j with u_j > (cumsum(u)_j - radius)/j; threshold at that level.

    Example::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.math.prox import proj_l1_ball
        >>> proj_l1_ball(jnp.array([2.0, -1.0]), radius=1.0).tolist()
        [1.0, -0.0]
        >>> proj_l1_ball(jnp.array([0.25, -0.25]), radius=1.0).tolist()  # inside
        [0.25, -0.25]
    """
    x = jnp.asarray(x)
    mag = jnp.abs(x).reshape(-1)
    u = jnp.sort(mag)[::-1]
    css = jnp.cumsum(u)
    j = jnp.arange(1, u.size + 1, dtype=u.dtype)
    theta_cand = (css - radius) / j
    valid = u > theta_cand
    rho = jnp.maximum(jnp.sum(valid) - 1, 0)
    theta = jnp.maximum(theta_cand[rho], 0.0)
    inside = jnp.sum(mag) <= radius
    shrunk = soft(x, theta)
    return jnp.where(inside, x, shrunk)


def proj_nonnegative_orthant(x):
    """Projection onto x >= 0 (reference math/prox.py:296)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.maximum(jnp.real(x), 0.0).astype(x.dtype)
    return jnp.maximum(x, 0.0)


def proj_segment(x, a=0.0, b=1.0):
    """Projection onto the segment [a, b] per coordinate (math/prox.py:320)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.clip(jnp.real(x), a, b).astype(x.dtype)
    return jnp.clip(x, a, b)


def lambertw(z, iters: int = 24):
    """Principal branch W0 of the Lambert W function by Halley iteration —
    jittable replacement for scipy.special.lambertw used by the reference's
    Shannon-entropy prox (func/penalty.py:905-922). Valid for z >= 0 (the
    only regime the entropy prox needs).

    Example — ``W(e) = 1``::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.math.prox import lambertw
        >>> round(float(lambertw(jnp.exp(1.0))), 5)
        1.0
    """
    z = jnp.asarray(z, dtype=jnp.float32)
    # initial guess: log(1+z) is within ~10% on z >= 0
    w = jnp.log1p(z)

    def body(_, w):
        ew = jnp.exp(w)
        f = w * ew - z
        wp1 = w + 1.0
        denom = ew * wp1 - (w + 2.0) * f / (2.0 * wp1)
        return w - f / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)

    return jax.lax.fori_loop(0, iters, body, w)
