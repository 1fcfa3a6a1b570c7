"""Consensus ADMM over a device mesh: block-partitioned inverse problems
across scenario batches.

``min_x sum_i f_i(x) + g(x)`` where scenario terms ``f_i = ||A_i x - y_i||^2``
live on different devices (BASELINE config 5).  One iteration::

    x_i = argmin_x ||A_i x - y_i||^2 + (rho/2)||x - (z - u_i)||^2   (local)
    z   = prox_{g/(N rho)}( mean_i (x_i + u_i) )                    (psum)
    u_i = u_i + x_i - z                                             (local)

The x-update is *exact* in the Fourier domain for circular convolution
operators (``(2|H|^2 + rho)^{-1}`` filter), so the whole iteration is FFTs +
elementwise work + ONE psum over the data-parallel mesh axis — the TPU-native
replacement for the reference's absent distributed story (SURVEY §2.6).
The reference has no ADMM solver; the mathematics follows Boyd et al.,
"Distributed Optimization and Statistical Learning via ADMM" §7.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pycsou_tpu.core.functional import ProximableFunctional
from pycsou_tpu.parallel.mesh import make_mesh
from pycsou_tpu.utils.shapes import as_shape

__all__ = ["ConsensusADMM"]


class ConsensusADMM:
    """Data-parallel consensus ADMM.

    Parameters
    ----------
    dim_shape : shape of the shared unknown x.
    h_hats    : (S, *rfft_shape) complex — per-scenario circular-convolution
                transfer functions (S scenarios, sharded over the mesh).
    data      : (S, *dim_shape) — per-scenario measurements.
    g         : optional ProximableFunctional regulariser on z (its ``prox``
                must be pure/jittable; evaluated redundantly on each device).
    rho       : ADMM penalty parameter.
    """

    def __init__(
        self,
        dim_shape,
        h_hats,
        data,
        g: Optional[ProximableFunctional] = None,
        rho: float = 1.0,
        mesh: Optional[Mesh] = None,
        axis_name: str = "dp",
        dtype=jnp.float32,
    ):
        self.dim_shape = as_shape(dim_shape)
        self.mesh = mesh if mesh is not None else make_mesh(axis_names=(axis_name,))
        self.axis_name = self.mesh.axis_names[0]
        n_dev = self.mesh.devices.size
        h_hats = jnp.asarray(h_hats)
        data = jnp.asarray(data, dtype)
        S = data.shape[0]
        if S % n_dev:
            raise ValueError(f"number of scenarios {S} must divide over {n_dev} devices")
        self.S = S
        self.g = g
        self.rho = float(rho)

        spec_s = NamedSharding(self.mesh, PartitionSpec(self.axis_name, *([None] * (data.ndim - 1))))
        self.h_hats = jax.device_put(h_hats, NamedSharding(self.mesh, PartitionSpec(self.axis_name, *([None] * (h_hats.ndim - 1)))))
        self.data = jax.device_put(data, spec_s)
        # precompute rhs spectra: 2 conj(H) Y
        self._run_jit = {}

    def _axes(self):
        return tuple(range(len(self.dim_shape)))

    def _local_x_update(self, h_hat, y, v):
        """Exact solve of  min ||A x - y||^2 + rho/2 ||x - v||^2  for circular
        convolution A: x_hat = (2 conj(H) Y + rho V)/(2|H|^2 + rho)."""
        axes = self._axes()
        Y = jnp.fft.rfftn(y, axes=axes)
        V = jnp.fft.rfftn(v, axes=axes)
        X = (2.0 * jnp.conj(h_hat) * Y + self.rho * V) / (2.0 * jnp.abs(h_hat) ** 2 + self.rho)
        return jnp.fft.irfftn(X, s=self.dim_shape, axes=axes)

    def _local_run(self, h_loc, y_loc, z, n_iters):
        """Full ADMM loop on one device's scenario batch (inside shard_map)."""
        ax = self.axis_name
        S_loc = y_loc.shape[0]
        x = jnp.broadcast_to(z, (S_loc,) + self.dim_shape)
        u = jnp.zeros_like(x)
        # mark per-device carries as device-varying for shard_map's vma check
        x = jax.lax.pcast(x, (ax,), to="varying")
        u = jax.lax.pcast(u, (ax,), to="varying")

        def body(_, carry):
            x, z, u = carry
            v = z[None] - u
            x = jax.vmap(self._local_x_update)(h_loc, y_loc, v)
            # consensus: global mean over all scenarios (local mean + psum)
            local_sum = jnp.sum(x + u, axis=0)
            global_mean = jax.lax.psum(local_sum, ax) / self.S
            if self.g is not None:
                z_new = self.g.prox(global_mean, 1.0 / (self.S * self.rho))
            else:
                z_new = global_mean
            u = u + x - z_new[None]
            return (x, z_new, u)

        x, z, u = jax.lax.fori_loop(0, n_iters, body, (x, z, u))
        return z

    def run(self, n_iters: int, z0=None):
        """Run ``n_iters`` consensus iterations; returns the consensus z."""
        if n_iters not in self._run_jit:
            ax = self.axis_name
            P = PartitionSpec
            nd = len(self.dim_shape)

            smapped = jax.shard_map(
                lambda h, y, z: self._local_run(h, y, z, n_iters),
                mesh=self.mesh,
                in_specs=(P(ax, *([None] * nd)), P(ax, *([None] * nd)), P(*([None] * nd))),
                out_specs=P(*([None] * nd)),
            )
            self._run_jit[n_iters] = jax.jit(smapped)
        z0 = jnp.zeros(self.dim_shape, jnp.float32) if z0 is None else jnp.asarray(z0)
        return self._run_jit[n_iters](self.h_hats, self.data, z0)
