"""Pallas TPU kernel: fused PMYULA Langevin sampling step.

One Moreau-Yosida ULA iteration for the deconvolution posterior
``exp(-||A x - y||^2 - G(x))`` (reference /root/reference/pycsou/opt/
mcmc.py:113-118)::

    x+ = (1 - gamma/tau) x - gamma * 2 (A^H A x - A^H y)
         + (gamma/tau) prox_{tau G}(x) + sqrt(2 gamma) xi

touches the same arrays as the TV chain but has NO dual variable and no
stencil — so the whole iteration (both Gram directions, the prox blend, the
Gaussian noise, and the online MMSE/second-moment accumulators) fuses into
ONE sweep:

* lane + row Gram exactly as the mega2/mega3 TV kernels (block-tridiagonal
  MXU lane Gram + banded row matmul; in-kernel edge corrections from the
  first/last tiles' lane Grams, the mega3 Et/Eb convention);
* the Gaussian noise is drawn IN-kernel (``pltpu.prng_seed(seed, n, tile)``
  + Box-Muller on ``prng_random_bits``) — the separate ``jax.random.normal``
  pass and its HBM write/read disappear;
* the burn-in/thinning-gated accumulators ``mmse += w x+``, ``m2 += w x+^2``
  ride the same pass (``w`` is a (1,) SMEM scalar).

7 HBM streams per sample (x/atb/mmse/m2 in, x/mmse/m2 out); zero FFTs; the
XLA twin is ``PMYULA.step``'s generic branch (opt/mcmc.py).

For CPU meshes / interpret mode (no Mosaic PRNG lowering) the noise is
streamed in as a pre-drawn input (``noise_mode='stream'``) — the kernel
tests compare that path against the generic update with the SAME noise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycsou_tpu.kernels.tv import (
    MEGA_HG,
    _lane_gram_tile,
    _mega_row_gram,
)

__all__ = ["pmyula_mega_step"]


def _normal_from_bits(shape):
    """(shape) standard normals via Box-Muller on two Mosaic PRNG draws.
    Bits -> (0, 1] uniforms with 24-bit mantissa resolution (logical shift,
    so the sign bit never leaks); ``1 - u`` keeps log() away from 0."""
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    scale = jnp.float32(1.0 / (1 << 24))
    u1 = 1.0 - jax.lax.shift_right_logical(b1, 8).astype(jnp.float32) * scale
    u2 = jax.lax.shift_right_logical(b2, 8).astype(jnp.float32) * scale
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _pmyula_kernel(si_ref, wf_ref, *refs, R, nT, H, W, gamma, tau, lam,
                   prox_mode, noise_mode):
    if noise_mode == "stream":
        (x_ref, a_ref, m1_ref, m2_ref, n_ref,
         b_ref, c_ref, f_ref, et_ref, eb_ref,
         xo, m1o, m2o, s_x, s_w, s_wt, s_corr) = refs
    else:
        (x_ref, a_ref, m1_ref, m2_ref,
         b_ref, c_ref, f_ref, et_ref, eb_ref,
         xo, m1o, m2o, s_x, s_w, s_wt, s_corr) = refs
    i = pl.program_id(0)
    HG = MEGA_HG

    cur_x = x_ref[...]
    dt = cur_x.dtype
    cur_w = _lane_gram_tile(cur_x, c_ref[...], f_ref[...], W)
    HIP = jax.lax.Precision.HIGHEST

    # row-Gram edge corrections from the first/last input tiles' lane Grams
    # (the mega3 convention; both land in s_corr strictly before their use)
    @pl.when(i == 0)
    def _init():
        s_wt[...] = jnp.zeros((HG, W), jnp.float32)
        s_corr[...] = jnp.zeros((2 * HG, W), jnp.float32)
        s_corr[:HG] = jnp.dot(
            et_ref[...], cur_w[:32], precision=HIP, preferred_element_type=jnp.float32
        ).astype(dt)

    @pl.when(i == nT - 1)
    def _corr_bot():
        s_corr[HG:] = jnp.dot(
            eb_ref[...], cur_w[R - 32 :], precision=HIP, preferred_element_type=jnp.float32
        ).astype(dt)

    @pl.when(i > 0)
    def _compute():
        j = i - 1
        last_f = jnp.where(i == nT, 0.0, 1.0).astype(dt)
        gsum = _mega_row_gram(
            s_wt[...], s_w[...], (cur_w * last_f)[:HG], b_ref[...], s_corr[...],
            jnp.where(j == 0, 1.0, 0.0).astype(dt),
            jnp.where(j == nT - 1, 1.0, 0.0).astype(dt),
            R, W, dt,
        )
        gw = gsum[:R] - 2.0 * a_ref[...]  # = 2 (A^H A x - A^H y) on tile j
        xj = s_x[...]

        if noise_mode == "prng":
            # Mosaic caps prng_seed at TWO values: fold the tile index into
            # the first word with a wrapping golden-ratio hash (distinct
            # streams per (seed, n, tile); int32 overflow wraps by design)
            pltpu.prng_seed(si_ref[0] + i * jnp.int32(-1640531527), si_ref[1])
            z = _normal_from_bits((R, W)).astype(dt)
        else:
            z = n_ref[...]

        ns = jnp.float32(jnp.sqrt(2.0 * gamma))
        if prox_mode == "none":
            x_n = xj - gamma * gw + ns * z
        else:
            if prox_mode == "nonneg":
                p = jnp.maximum(xj, 0.0)
            else:  # "l1": soft threshold at tau * lam
                thr = jnp.float32(tau * lam)
                p = jnp.sign(xj) * jnp.maximum(jnp.abs(xj) - thr, 0.0)
            c1 = jnp.float32(1.0 - gamma / tau)
            cp = jnp.float32(gamma / tau)
            x_n = c1 * xj - gamma * gw + cp * p + ns * z

        xo[...] = x_n
        w = wf_ref[0]
        m1o[...] = m1_ref[...] + w * x_n
        m2o[...] = m2_ref[...] + w * x_n * x_n

    @pl.when(i > 0)
    def _tail():
        s_wt[...] = s_w[R - HG :]

    @pl.when(i < nT)
    def _carry():
        s_x[...] = cur_x
        s_w[...] = cur_w


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "tau", "lam", "prox_mode", "noise_mode",
                     "interpret", "mega_r"),
)
def pmyula_mega_step(x, atb, m1, m2, si, wf, B, C, F, Et_p, Eb_p, *,
                     gamma: float, tau: float, lam: float = 0.0,
                     prox_mode: str = "none", noise_mode: str = "prng",
                     noise=None, interpret: bool = False, mega_r: int = 32):
    """One fused PMYULA sample: ``(x+, mmse+, m2+)``.

    ``si``: (2,) int32 ``[seed, n]`` — with the grid index these drive the
    per-tile Mosaic PRNG streams (noise_mode='prng').  ``wf``: (1,) float32
    collect weight (1.0 on thinned post-burn-in samples, else 0.0) gating
    the in-kernel accumulators.  ``B``/``C``/``F`` as the mega2 TV plan
    (:func:`~pycsou_tpu.kernels.tv.make_mega_band` /
    :func:`~pycsou_tpu.kernels.tv.make_mega2_lane_plan`), ``Et_p``/``Eb_p``
    the mega3 in-kernel corr matrices
    (:func:`~pycsou_tpu.kernels.tv.make_mega3_corr_mats`).
    ``noise_mode='stream'`` reads pre-drawn ``noise`` instead (CPU meshes /
    interpret mode — Mosaic PRNG does not lower there)."""
    H, W = x.shape
    R = int(mega_r)
    if R != 32:
        raise ValueError("pmyula_mega_step requires 32-row tiles (corr reads)")
    if H % R or H // R < 2:
        raise ValueError(f"H={H} must be a multiple of {R} with >= 2 tiles")
    if W < 384 or W % 128:
        raise ValueError(f"needs W % 128 == 0 and W >= 384, got {W}")
    if noise_mode not in ("prng", "stream"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    if noise_mode == "stream" and noise is None:
        raise ValueError("noise_mode='stream' needs the noise input")
    nT = H // R
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_spec = pl.BlockSpec((R, W), lambda i: (jnp.minimum(i, nT - 1), 0))
    j_spec = pl.BlockSpec((R, W), lambda i: (jnp.clip(i - 1, 0, nT - 1), 0))
    b_spec = pl.BlockSpec(tuple(B.shape), lambda i: (0, 0))
    c_spec = pl.BlockSpec(tuple(C.shape), lambda i: (0, 0))
    f_spec = pl.BlockSpec((256, 256), lambda i: (0, 0))
    e_spec = pl.BlockSpec((MEGA_HG, 32), lambda i: (0, 0))
    out_spec = pl.BlockSpec((R, W), lambda i: (jnp.maximum(i - 1, 0), 0))
    kern = functools.partial(
        _pmyula_kernel, R=R, nT=nT, H=H, W=W,
        gamma=float(gamma), tau=float(tau), lam=float(lam),
        prox_mode=str(prox_mode), noise_mode=str(noise_mode),
    )
    cp = getattr(pltpu, "CompilerParams", None) or getattr(pltpu, "TPUCompilerParams")
    try:
        params = cp(dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # pragma: no cover - older pallas without the knob
        params = cp(dimension_semantics=("arbitrary",))
    in_specs = [smem, smem, x_spec, j_spec, j_spec, j_spec]
    inputs = [si, wf, x, atb, m1, m2]
    if noise_mode == "stream":
        in_specs.append(j_spec)
        inputs.append(noise)
    in_specs += [b_spec, c_spec, f_spec, e_spec, e_spec]
    inputs += [B, C, F, Et_p, Eb_p]
    # in-place x/m1/m2: output tile i-1 is written strictly after its input
    # tiles were consumed (x scratch-carried; m1/m2 read at the same step)
    xn, m1n, m2n = pl.pallas_call(
        kern,
        grid=(nT + 1,),
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((H, W), x.dtype)] * 3,
        input_output_aliases={2: 0, 4: 1, 5: 2},
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.VMEM((MEGA_HG, W), jnp.float32),
            pltpu.VMEM((2 * MEGA_HG, W), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(*inputs)
    return xn, m1n, m2n
