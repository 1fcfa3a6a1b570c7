"""Tuned flagship solver: TV-regularised 2-D deconvolution/denoising.

Mathematically identical to the generic ``PrimalDualSplitting`` configured
with ``F = SquaredL2Loss o Convolve2D``, ``H = lam L21(axis=0)``,
``K = Gradient``, ``G = NonNegativeOrthant`` — but with both flagship
optimisations applied:

* data-term gradient through the fused convolution Gram (2 large FFTs per
  iteration instead of 4; ops/_gram.py);
* the entire stencil/prox/momentum chain fused into one Pallas pass
  (kernels/tv.py) instead of ~6 XLA HBM round-trips.

This is the benchmark path (bench.py) and the recommended API for production
TV deconvolution on one chip; the multi-chip version is
``parallel.solvers.DistributedTVDeconv2D``.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from pycsou_tpu._module import static_field
from pycsou_tpu.core.solver import IterativeSolver
from pycsou_tpu.kernels.tv import (
    tv_pds_stencil_step,
    tv_pds_stencil_step_sweep,
    tv_pds_stencil_step_xla,
)
from pycsou_tpu.ops.conv import Convolve2D
from pycsou_tpu.utils.shapes import as_shape

__all__ = ["TVDeconvolution"]


class TVDeconvolution(IterativeSolver):
    """``min_x ||A x - y||^2 + lam ||grad x||_{2,1} (+ i_{x>=0})`` with
    Condat-Vu PDS; ``A`` is a 2-D convolution (or identity for denoising)."""

    y: jax.Array = None
    gram: object = None
    atb: jax.Array = None
    lam: float = static_field(default=0.1)
    tau: float = static_field(default=0.1)
    sigma: float = static_field(default=0.1)
    rho: float = static_field(default=0.9)
    beta: float = static_field(default=2.0)
    nonneg: bool = static_field(default=True)
    use_pallas: bool = static_field(default=False)
    # "sweep" (scratch-carry pipeline, fastest), "element" (halo blocks),
    # "xla" (pure-XLA twin; the CPU path)
    stencil_mode: str = static_field(default="xla")

    def __init__(
        self,
        shape,
        y,
        lam: float,
        filt=None,
        nonneg: bool = True,
        tau: Optional[float] = None,
        rho: float = 0.9,
        use_pallas: str = "auto",
        max_iter: int = 500,
        min_iter: int = 10,
        accuracy_threshold: float = 1e-6,
        verbose: Optional[int] = None,
    ):
        super().__init__(max_iter=max_iter, min_iter=min_iter, tol=accuracy_threshold, verbose=verbose)
        shape = as_shape(shape)
        self.y = jnp.asarray(y, jnp.float32)
        self.lam = float(lam)
        self.nonneg = bool(nonneg)
        self.rho = float(rho)

        if filt is not None:
            A = Convolve2D(shape, filt)
            self.gram = A.gram
            self.atb = A.adjoint(self.y)
            self.beta = 2.0 * A.lipschitz**2
        else:
            self.gram = None  # denoising: A = I, gram = I
            self.atb = self.y
            self.beta = 2.0

        L_K = math.sqrt(8.0)
        if tau is None:
            b = self.beta
            tau = (1.0 / L_K**2) * (-b / 4 + math.sqrt(b**2 / 16 + L_K**2))
        self.tau = self.sigma = float(tau)

        if use_pallas == "auto":
            # Auto-on for TPU when the row count is tile-aligned; bench.py
            # falls back to XLA stencils if the Mosaic compile fails on an
            # exotic runtime.
            from pycsou_tpu.kernels.tv import pallas_available

            self.use_pallas = (
                jax.default_backend() not in ("cpu",)
                and shape[0] % 8 == 0
                and pallas_available()
            )
        else:
            self.use_pallas = bool(use_pallas)
        # stencil engine: the sweep kernel streams every array exactly once
        # (measured 1.42 ms vs 2.82 ms Element-halo at 4096^2, docs/BENCH.md)
        from pycsou_tpu.kernels.tv import sweep_available

        if not self.use_pallas:
            self.stencil_mode = "xla"
        elif sweep_available(*shape):
            self.stencil_mode = "sweep"
        else:
            self.stencil_mode = "element"

    # -- iteration ---------------------------------------------------------
    def _grad(self, x):
        if self.gram is None:
            return 2.0 * (x - self.y)
        return 2.0 * (self.gram.apply(x) - self.atb)

    def initial_state(self):
        shape = self.y.shape
        return {"x": jnp.zeros(shape, jnp.float32), "z": jnp.zeros((2,) + shape, jnp.float32)}

    def step(self, state):
        x, z = state["x"], state["z"]
        g = self._grad(x)
        kw = dict(tau=self.tau, sigma=self.sigma, rho=self.rho, lam=self.lam, nonneg=self.nonneg)
        if self.stencil_mode == "sweep":
            x, z = tv_pds_stencil_step_sweep(x, z, g, **kw)
        elif self.stencil_mode == "element":
            x, z = tv_pds_stencil_step(x, z, g, **kw)
        else:
            x, z = tv_pds_stencil_step_xla(x, z, g, **kw)
        return {"x": x, "z": z}

    def objective(self, x):
        """Objective value (pure/jittable; usable with track_objective).

        With a blur, the data term is evaluated through the Gram identity
        ``||Ax-y||^2 = <x, A^H A x> - 2 <x, A^H y> + ||y||^2``."""
        from pycsou_tpu.ops.diff import fdiff_forward

        x = jnp.asarray(x)
        if self.gram is None:
            data = jnp.sum((x - self.y) ** 2)
        else:
            data = (
                jnp.vdot(x, self.gram.apply(x))
                - 2.0 * jnp.vdot(x, self.atb)
                + jnp.vdot(self.y, self.y)
            ).real
        tv = jnp.sum(jnp.sqrt(fdiff_forward(x, 0) ** 2 + fdiff_forward(x, 1) ** 2))
        return data + self.lam * tv
