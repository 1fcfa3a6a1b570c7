"""Expression recognition: rewrite generic solver configurations onto the
fused Pallas engines.

The reference's product is duck-typed solver/operator composition — users
write ``PDS(F=SquaredL2Loss * Convolve2D, H=lam * L21Norm, K=Gradient, ...)``
(/root/reference/pycsou/opt/proxalgs.py:343-355) and the solver runs whatever
expression tree it is handed.  On TPU the same mathematics has a hand-fused
realisation (``opt.tv.TVDeconvolution``: kernel-resident Grams, one Pallas
pass per iteration, epilogue metric partial sums) that is ~6x faster than
stepping the expression tree through XLA.

This module is the bridge: a *pattern matcher* over the (F, G, H, K)
expression tree that recognises configurations with a fused realisation and
returns the specialised solver — the operator-algebra analogue of a compiler
rewrite rule.  Matching is strictly structural (exact node types, default
stencil conventions, ``tau == sigma``) so a rewrite NEVER changes the
mathematics: the fused engine computes the same Condat-Vu iterates to
floating-point tolerance (tests/test_fuse.py asserts this against the
unfused chain).  Anything unrecognised runs generically, as before.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def match_tv_deconvolution(
    dim_shape,
    F,
    G,
    H,
    K,
    tau: float,
    sigma: float,
    rho: float,
    metric_every: int = 1,
):
    """Return a :class:`~pycsou_tpu.opt.tv.TVDeconvolution` computing the
    same Condat-Vu iterates as ``PDS(dim_shape, F, G, H, K, tau, sigma,
    rho)``, or ``None`` when the expression does not match.

    Recognised pattern (the reference's flagship problem,
    /root/reference/pycsou/opt/proxalgs.py:91-119)::

        min_x ||A x - y||^2 + lam ||grad x||_{2,1} (+ i_{x>=0})

    i.e. ``F = SquaredL2Loss(y) * Convolve2D`` (or plain ``SquaredL2Loss(y)``
    for denoising), ``G = NonNegativeOrthant`` or absent, ``H = lam *
    L21Norm(axis=0)``, ``K = Gradient(kind='forward', step=1)``.  Any
    ``tau, sigma > 0`` pair is supported — the fused kernels plumb both
    scalars into the stencil.  All checks are exact node-type checks —
    subclasses with overridden behavior do not match.
    """
    from pycsou_tpu.core.functional import (
        DiffProxFuncPostComp,
        DiffProxFuncPreComp,
        ProxFuncPostComp,
        ProxFuncPreComp,
    )
    from pycsou_tpu.func.base import IndicatorFunctional, NullProximableFunctional
    from pycsou_tpu.func.loss import LeastSquaresLoss
    from pycsou_tpu.func.penalty import L21Norm, SquaredL2Norm
    from pycsou_tpu.math.prox import proj_nonnegative_orthant
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt.tv import TVDeconvolution

    dim_shape = tuple(dim_shape)
    if len(dim_shape) != 2:
        return None
    if not (tau > 0 and sigma > 0):
        return None

    # -- K: forward-difference Gradient with unit steps ----------------------
    if not (
        type(K) is Gradient
        and K.kind == "forward"
        and all(s == 1.0 for s in K.steps)
        and tuple(K.dim_shape) == dim_shape
    ):
        return None

    # -- H: lam * L21Norm(axis=0) over the (2, H, W) gradient field ----------
    lam = 1.0
    h = H
    if type(h) in (ProxFuncPostComp, DiffProxFuncPostComp):
        try:
            shift = float(np.asarray(h.shift))
        except Exception:
            return None
        if shift != 0.0 or not np.isscalar(h.scale) or h.scale <= 0:
            return None
        lam = float(h.scale)
        h = h.func
    if not (
        type(h) is L21Norm
        and h.mode == "axis"
        and h.axis == 0
        and tuple(h.dim_shape) == (2,) + dim_shape
    ):
        return None

    # -- G: i_{x >= 0} or absent (exact node types: subclasses may override
    # prox/apply and must not be rewritten) -----------------------------------
    if (
        type(G) is IndicatorFunctional
        and G.projection_fn is proj_nonnegative_orthant
    ):
        nonneg = True
    elif type(G) is NullProximableFunctional:
        nonneg = False
    else:
        return None

    # -- F: ||A x - y||^2 (A a 2-D convolution) or ||x - y||^2 (denoising) ---
    if type(F) is LeastSquaresLoss and type(F.op) is Convolve2D:
        if tuple(F.op.dim_shape) != dim_shape:
            return None
        filt = np.asarray(F.op.filt)
        if not np.isrealobj(filt):
            return None
        y = F.data
    elif type(F) in (ProxFuncPreComp, DiffProxFuncPreComp) and type(F.func) is SquaredL2Norm:
        # SquaredL2Loss(dim, data) == SquaredL2Norm o (x - y)
        scale = np.asarray(F.scale)
        if scale.ndim != 0 or float(scale) != 1.0:
            return None
        filt, y = None, -F.shift
    else:
        return None
    if tuple(np.shape(y)) != dim_shape:
        return None

    return TVDeconvolution(
        dim_shape,
        y,
        lam,
        filt=filt,
        nonneg=nonneg,
        tau=float(tau),
        sigma=float(sigma),
        rho=float(rho),
        metric_every=metric_every,
    )
