"""On-device spectral estimation: power iteration and Lanczos.

TPU-native replacement for the reference's host-side ARPACK calls
(/root/reference/pycsou/core/linop.py:178-321).  The hot loop — repeated
matvec/rmatvec — runs entirely inside a jitted ``lax.while_loop`` /
``lax.fori_loop`` on device; only the tiny (m x m) tridiagonal eigenproblem is
solved on host.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["power_iteration", "lanczos_eigs"]


def _norm(x):
    return jnp.sqrt(jnp.real(jnp.vdot(x, x)))


def _rand_like(key, shape, dtype):
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        real_dt = jnp.finfo(dtype).dtype.name.replace("complex", "float")
        k1, k2 = jax.random.split(key)
        re = jax.random.normal(k1, shape, dtype=jnp.float32)
        im = jax.random.normal(k2, shape, dtype=jnp.float32)
        return (re + 1j * im).astype(dtype)
    return jax.random.normal(key, shape, dtype=dtype)


@jax.jit
def _power_iter(op, x0, maxiter, tol):
    """sigma_max via power iteration on A^H A. Entirely on device."""

    def gram(v):
        return op.adjoint(op.apply(v))

    x0 = x0 / jnp.maximum(_norm(x0), jnp.finfo(x0.dtype).tiny)

    def cond(carry):
        i, _, s, ds = carry
        return jnp.logical_and(i < maxiter, ds > tol * jnp.maximum(s, 1e-30))

    def body(carry):
        i, x, s_old, _ = carry
        y = gram(x)
        s = _norm(y)  # -> sigma_max^2
        x = y / jnp.maximum(s, jnp.finfo(x0.dtype).tiny)
        return (i + 1, x, s, jnp.abs(s - s_old))

    y0 = gram(x0)
    s0 = _norm(y0)
    x1 = y0 / jnp.maximum(s0, jnp.finfo(x0.dtype).tiny)
    _, _, s, _ = jax.lax.while_loop(cond, body, (jnp.asarray(1), x1, s0, jnp.asarray(jnp.inf, s0.dtype)))
    return jnp.sqrt(s)


def power_iteration(op, maxiter: int = 128, tol: float = 1e-6, key: int = 0):
    """Estimate ``||A||_2`` (largest singular value) of a LinearOperator."""
    k = jax.random.PRNGKey(key)
    x0 = _rand_like(k, op.dim_shape, op.dtype)
    return _power_iter(op, x0, jnp.asarray(maxiter), jnp.asarray(tol, jnp.float32))


@partial(jax.jit, static_argnums=(2,))
def _lanczos(op, v0, m: int):
    """m-step Lanczos with full reorthogonalisation for a self-adjoint op.

    Returns (alphas[m], betas[m]) of the tridiagonal T and runs fully on
    device; the caller diagonalises T on host (it is m x m, m ~ tens).
    """
    shape = v0.shape
    dtype = v0.dtype
    v0 = v0 / jnp.maximum(_norm(v0), jnp.finfo(dtype).tiny)

    V = jnp.zeros((m,) + shape, dtype=dtype).at[0].set(v0)
    alphas = jnp.zeros((m,), dtype=jnp.float32)
    betas = jnp.zeros((m,), dtype=jnp.float32)

    def body(j, carry):
        V, alphas, betas = carry
        vj = V[j]
        w = op.apply(vj)
        alpha = jnp.real(jnp.vdot(vj, w))
        w = w - alpha.astype(dtype) * vj
        # full reorthogonalisation against all previous vectors (mask j+1..m)
        coeffs = jnp.einsum("k...,...->k", jnp.conj(V), w)
        mask = (jnp.arange(m) <= j).astype(coeffs.dtype)
        w = w - jnp.einsum("k,k...->...", coeffs * mask, V)
        beta = _norm(w)
        v_next = w / jnp.maximum(beta, jnp.finfo(dtype).tiny)
        V = jax.lax.cond(
            j + 1 < m, lambda V: V.at[j + 1].set(v_next), lambda V: V, V
        )
        alphas = alphas.at[j].set(alpha.astype(jnp.float32))
        betas = betas.at[j].set(beta.astype(jnp.float32))
        return (V, alphas, betas)

    V, alphas, betas = jax.lax.fori_loop(0, m, body, (V, alphas, betas))
    return alphas, betas


def lanczos_eigs(op, k: int = 1, which: str = "LM", maxiter: Optional[int] = None, key: int = 0):
    """Extremal eigenvalues of a self-adjoint operator (on-device Lanczos +
    host eigendecomposition of the small tridiagonal)."""
    n = op.dim
    m = int(min(n, maxiter if maxiter is not None else max(2 * k + 10, 32)))
    kk = jax.random.PRNGKey(key)
    v0 = _rand_like(kk, op.dim_shape, op.dtype)
    alphas, betas = _lanczos(op, v0, m)
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    T = np.diag(alphas) + np.diag(betas[: m - 1], 1) + np.diag(betas[: m - 1], -1)
    evals = np.linalg.eigvalsh(T)
    if which == "LM":
        order = np.argsort(-np.abs(evals))
    elif which == "SM":
        order = np.argsort(np.abs(evals))
    elif which == "LA":
        order = np.argsort(-evals)
    elif which == "SA":
        order = np.argsort(evals)
    else:
        raise ValueError(f"unknown which={which!r}")
    return jnp.asarray(evals[order[:k]])
