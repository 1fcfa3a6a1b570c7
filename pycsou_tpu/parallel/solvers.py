"""Distributed solvers: mesh-sharded PDS for TV-regularised deconvolution.

The flagship multi-chip path (BASELINE configs 3/5): the image, measurement
and dual variables are row-sharded over a 1-D mesh; one PDS iteration is a
single ``shard_map``-ped XLA computation in which

* the blur and its adjoint run as overlap-save FFT convolutions with
  ``ppermute`` halo exchange (spatial.py),
* the TV gradient/divergence exchange one halo row,
* the L21 fenchel-prox and the nonnegativity prox are purely local,
* no collective other than the halos is needed inside an iteration.

The reference has no distributed solver at all (SURVEY §2.6); this is the
TPU-native replacement for its joblib/Dask story.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pycsou_tpu.parallel.mesh import make_mesh
from pycsou_tpu.parallel.spatial import (
    conv_transfer,
    sharded_conv2d,
    sharded_conv2d_adjoint,
    sharded_conv2d_gram,
    sharded_grad2d,
    sharded_grad2d_adjoint,
)

__all__ = ["DistributedTVDeconv2D", "BatchedDistributedTVDeconv2D"]


class DistributedTVDeconv2D:
    r"""Condat-Vu PDS for ``min_x ||h * x - y||^2 + lam ||grad x||_{2,1}
    (+ nonnegativity)`` on an image row-sharded over a device mesh.

    Mathematics identical to ``opt.proxalgs.PrimalDualSplitting`` with
    F = SquaredL2Loss o Convolve2D, H = lam * L21Norm(axis=0), K = Gradient,
    G = NonNegativeOrthant (reference update rule proxalgs.py:343-355);
    auto step sizes from the same formulas (proxalgs.py:246-316).
    """

    def __init__(
        self,
        shape: Tuple[int, int],
        filt,
        y,
        lam: float,
        nonneg: bool = True,
        mesh: Optional[Mesh] = None,
        axis_name: str = "sp",
        tau: Optional[float] = None,
        rho: float = 0.9,
        dtype=jnp.float32,
    ):
        H, W = shape
        self.mesh = mesh if mesh is not None else make_mesh(axis_names=(axis_name,))
        self.axis_name = self.mesh.axis_names[0]
        n_dev = self.mesh.devices.size
        if H % n_dev:
            raise ValueError(f"image height {H} must divide over {n_dev} devices")
        self.shape = (H, W)
        self.filt = jnp.asarray(filt, dtype)
        self.lam = float(lam)
        self.nonneg = bool(nonneg)
        self.rho = float(rho)

        # Lipschitz constants, closed form (no ARPACK):
        pad = (H + self.filt.shape[0] - 1, W + self.filt.shape[1] - 1)
        Hf = np.fft.fftn(np.asarray(self.filt, np.float64), s=pad, axes=(0, 1))
        L_A = float(np.max(np.abs(Hf)))
        beta = 2.0 * L_A**2
        L_K = math.sqrt(8.0)  # ||Gradient||_2 <= sqrt(sum_axis (2/step)^2)
        if tau is None:
            tau = (1.0 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
        self.tau = self.sigma = float(tau)
        self.beta = beta

        # precomputed transfer functions for the halo-extended local blocks
        h_local = H // n_dev
        m0 = self.filt.shape[0]
        # halo widths: forward conv needs (m0-1-m0//2) rows from the previous
        # neighbour and m0//2 from the next (adjoint: the complements).  A
        # ppermute halo only reaches ONE neighbour, so the local block must
        # hold the widest halo we ever send (ADVICE r1: validate explicitly
        # instead of failing with an FFT shape mismatch).
        min_rows = max(1, m0 // 2, m0 - 1 - m0 // 2)
        if h_local < min_rows:
            raise ValueError(
                f"local block of {h_local} rows is too short for a "
                f"{m0}-row kernel: need at least {min_rows} rows per device "
                f"(H={H} over {n_dev} devices; use fewer devices or a taller image)"
            )
        ext_shape = (h_local + m0 - 1, W)
        self._h_hat_fwd = conv_transfer(self.filt, ext_shape)
        self._h_hat_adj = conv_transfer(jnp.flip(self.filt, (0, 1)), ext_shape)
        # fused-Gram path: autocorrelation transfer for the (m-1)-halo block
        from pycsou_tpu.ops._gram import conv_full_direct

        acorr = conv_full_direct(self.filt, jnp.flip(self.filt, (0, 1)))
        self._acorr_hat = conv_transfer(acorr, (h_local + 2 * (m0 - 1), W))
        self._use_gram = h_local >= m0  # gram strips need block >= kernel

        spec_x = NamedSharding(self.mesh, PartitionSpec(self.axis_name, None))
        spec_z = NamedSharding(self.mesh, PartitionSpec(None, self.axis_name, None))
        self.y = jax.device_put(jnp.asarray(y, dtype), spec_x)
        self.x0 = jax.device_put(jnp.zeros(shape, dtype), spec_x)
        self.z0 = jax.device_put(jnp.zeros((2, H, W), dtype), spec_z)
        self._spec_x, self._spec_z = spec_x, spec_z
        self._run_jit = None

    # -- one PDS iteration on LOCAL blocks (inside shard_map) --------------
    def _local_step(self, x, z, y_loc, atb_loc=None):
        ax = self.axis_name
        tau, sigma, rho, lam = self.tau, self.sigma, self.rho, self.lam
        filt = self.filt

        if self._use_gram and atb_loc is not None:
            # fused Gram: grad = 2 (A^H A x - A^H y); ONE local FFT roundtrip
            grad = 2.0 * (sharded_conv2d_gram(x, filt, ax, acorr_hat=self._acorr_hat) - atb_loc)
        else:
            # grad F = 2 A^H (A x - y): forward + adjoint (two roundtrips)
            r = sharded_conv2d(x, filt, ax, h_hat=self._h_hat_fwd) - y_loc
            grad = 2.0 * sharded_conv2d_adjoint(r, filt, ax, h_hat=self._h_hat_adj)

        # x+ = prox_G(x - tau grad - tau K^H z)
        x_temp = x - tau * grad - tau * sharded_grad2d_adjoint(z, ax)
        if self.nonneg:
            x_temp = jnp.maximum(x_temp, 0.0)

        # z+ = prox_{sigma H*}(z + sigma K (2 x+ - x)):
        # (lam ||.||_{2,1})* = indicator of the per-pixel l2 ball of radius
        # lam -> fenchel prox is the per-pixel ball projection (fused, local)
        v = z + sigma * sharded_grad2d(2.0 * x_temp - x, ax)
        mag = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
        z_temp = v * (lam / jnp.maximum(mag, lam))

        x_new = rho * x_temp + (1 - rho) * x
        z_new = rho * z_temp + (1 - rho) * z
        return x_new, z_new

    def _build(self, n_iters: int):
        ax = self.axis_name

        def local_run(x, z, y_loc):
            if self._use_gram:
                atb_loc = sharded_conv2d_adjoint(y_loc, self.filt, ax, h_hat=self._h_hat_adj)
            else:
                atb_loc = None

            def body(_, carry):
                x, z = carry
                return self._local_step(x, z, y_loc, atb_loc)

            return jax.lax.fori_loop(0, n_iters, body, (x, z))

        P = PartitionSpec
        smapped = jax.shard_map(
            local_run,
            mesh=self.mesh,
            in_specs=(P(ax, None), P(None, ax, None), P(ax, None)),
            out_specs=(P(ax, None), P(None, ax, None)),
        )
        return jax.jit(smapped)

    def run(self, n_iters: int, x=None, z=None):
        """Run ``n_iters`` fused iterations; returns (x, z) still sharded."""
        if self._run_jit is None or self._n_iters != n_iters:
            self._run_jit = self._build(n_iters)
            self._n_iters = n_iters
        x = self.x0 if x is None else x
        z = self.z0 if z is None else z
        return self._run_jit(x, z, self.y)

    def objective(self, x) -> float:
        """Global objective, computed on gathered arrays (diagnostics)."""
        from pycsou_tpu.ops.conv import Convolve2D
        from pycsou_tpu.ops.diff import Gradient

        A = Convolve2D(self.shape, self.filt)
        K = Gradient(self.shape)
        xg = jax.device_get(x)
        r = A(xg) - jax.device_get(self.y)
        g = K(jnp.asarray(xg))
        tv = jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))
        return float(jnp.sum(r * r) + self.lam * tv)


class BatchedDistributedTVDeconv2D:
    r"""Batched TV deconvolution on a TRUE 2-D device mesh ``(dp, sp)``:
    a batch of B images is data-parallel over ``dp`` while each image is
    row-sharded over ``sp`` — the dp x sp composition the pod-scale
    deployment uses (scenario batches x spatial decomposition).

    Per iteration each device touches only its (B/dp, H/sp, W) brick; spatial
    halos ride ``ppermute`` along ``sp`` (vmapped over the local batch) and
    there is NO collective along ``dp`` at all (problems are independent).
    """

    def __init__(
        self,
        shape: Tuple[int, int],
        filt,
        y,
        lam: float,
        nonneg: bool = True,
        mesh: Optional[Mesh] = None,
        tau: Optional[float] = None,
        rho: float = 0.9,
        dtype=jnp.float32,
    ):
        y = jnp.asarray(y, dtype)
        if y.ndim != 3:
            raise ValueError("y must be (batch, H, W)")
        B = y.shape[0]
        self.mesh = mesh if mesh is not None else make_mesh((1, jax.device_count()), ("dp", "sp"))
        if len(self.mesh.axis_names) != 2:
            raise ValueError("mesh must be 2-D (dp, sp)")
        self.dp, self.sp = self.mesh.axis_names
        n_dp, n_sp = self.mesh.devices.shape
        H, W = shape
        if B % n_dp or H % n_sp:
            raise ValueError(f"batch {B} must divide over {n_dp} and height {H} over {n_sp}")

        # one per-image solver supplies the step math and precomputed transfers
        self._inner = DistributedTVDeconv2D.__new__(DistributedTVDeconv2D)
        inner = self._inner
        inner.mesh = self.mesh
        inner.axis_name = self.sp
        inner.shape = (H, W)
        inner.filt = jnp.asarray(filt, dtype)
        inner.lam = float(lam)
        inner.nonneg = bool(nonneg)
        inner.rho = float(rho)
        pad = (H + inner.filt.shape[0] - 1, W + inner.filt.shape[1] - 1)
        Hf = np.fft.fftn(np.asarray(inner.filt, np.float64), s=pad, axes=(0, 1))
        beta = 2.0 * float(np.max(np.abs(Hf))) ** 2
        L_K = math.sqrt(8.0)
        if tau is None:
            tau = (1.0 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
        inner.tau = inner.sigma = float(tau)
        inner.beta = beta
        self.tau = self.sigma = inner.tau
        self.rho = inner.rho
        h_local = H // n_sp
        m0 = inner.filt.shape[0]
        inner._h_hat_fwd = conv_transfer(inner.filt, (h_local + m0 - 1, W))
        inner._h_hat_adj = conv_transfer(jnp.flip(inner.filt, (0, 1)), (h_local + m0 - 1, W))
        from pycsou_tpu.ops._gram import conv_full_direct

        acorr = conv_full_direct(inner.filt, jnp.flip(inner.filt, (0, 1)))
        inner._acorr_hat = conv_transfer(acorr, (h_local + 2 * (m0 - 1), W))
        inner._use_gram = h_local >= m0

        P = PartitionSpec
        self._spec_x = NamedSharding(self.mesh, P(self.dp, self.sp, None))
        self._spec_z = NamedSharding(self.mesh, P(self.dp, None, self.sp, None))
        self.y = jax.device_put(y, self._spec_x)
        self.x0 = jax.device_put(jnp.zeros((B,) + shape, dtype), self._spec_x)
        self.z0 = jax.device_put(jnp.zeros((B, 2) + shape, dtype), self._spec_z)
        self._run_jit = None
        self._n_iters = None

    def _build(self, n_iters: int):
        inner = self._inner
        dp, sp = self.dp, self.sp

        def local_run(x, z, y_loc):
            # per-image A^H y, vmapped over the LOCAL batch (ppermute under
            # vmap exchanges halos for every batch element along sp)
            if inner._use_gram:
                atb = jax.vmap(
                    lambda yb: sharded_conv2d_adjoint(yb, inner.filt, sp, h_hat=inner._h_hat_adj)
                )(y_loc)
            else:
                atb = None

            step = jax.vmap(inner._local_step, in_axes=(0, 0, 0, 0 if atb is not None else None))

            def body(_, carry):
                x, z = carry
                return step(x, z, y_loc, atb)

            return jax.lax.fori_loop(0, n_iters, body, (x, z))

        P = PartitionSpec
        smapped = jax.shard_map(
            local_run,
            mesh=self.mesh,
            in_specs=(P(dp, sp, None), P(dp, None, sp, None), P(dp, sp, None)),
            out_specs=(P(dp, sp, None), P(dp, None, sp, None)),
        )
        return jax.jit(smapped)

    def run(self, n_iters: int, x=None, z=None):
        """Run ``n_iters`` fused iterations on the 2-D mesh."""
        if self._run_jit is None or self._n_iters != n_iters:
            self._run_jit = self._build(n_iters)
            self._n_iters = n_iters
        x = self.x0 if x is None else x
        z = self.z0 if z is None else z
        return self._run_jit(x, z, self.y)
