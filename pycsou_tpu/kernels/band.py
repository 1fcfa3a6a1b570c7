"""Banded (block-Toeplitz) 1-D convolutions as MXU matmuls.

A 'same'-mode 1-D convolution with a compact K-tap filter is a banded
Toeplitz matrix.  Left-shifting the input by ``K-1-offset`` makes the band
purely causal, so tiling the signal axis into 128-wide tiles turns the
convolution into a block-BIdiagonal matrix with TWO repeating 128x128
blocks — the whole convolution is two batched (B*nT, 128) @ (128, 128)
matmuls that run on the MXU at full tile utilisation, instead of an FFT
roundtrip (the backend FFT measures ~10x off the HBM roofline,
docs/BENCH.md) or a single-channel ``lax.conv`` (VPU-bound on TPU).

This is the engine behind the separable/low-rank convolution Gram
(ops/conv.py ``SeparableConvGram2D``): for a rank-r PSF the Gram ``A^H A``
is 4r banded passes; at 4096^2 with a rank-1 Gaussian PSF that is several
times faster than the FFT Gram.

Zero-boundary semantics are exact: the pad tiles are zero, which is
precisely the zero-padded 'same' convolution's band clipping (the
reference's convolution convention, /root/reference/pycsou/linop/conv.py:
159-162).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_band_blocks",
    "band_conv_cols",
    "band_conv_rows",
    "make_gram_band",
    "gram_band_rows",
    "gram_band_cols",
    "gram_band_axis",
    "make_chanconv",
    "chanconv_cols",
    "gram_chanconv_cols",
    "TILE",
    "CHAN_TILE",
]

TILE = 128  # MXU systolic array edge

# 3-pass bf16 matmuls: ~1e-5 relative error at a fraction of the cost of
# full f32 emulation (HIGHEST, 6 passes).  CPU ignores precision (native
# f32), so the exactness tests on the virtual mesh see exact results.
DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def make_band_blocks(taps, offset: int, tile: int = TILE) -> Tuple[np.ndarray, np.ndarray, int]:
    """Blocks ``(b0, b1, lead)`` of the causal block-bidiagonal form of the
    'same' convolution ``out[j] = sum_k taps[k] * x[j - k + offset]`` (zero
    boundary).

    With the input left-padded by ``lead = K-1-offset`` zeros (``xp[i] =
    x[i - lead]``), ``out[j] = sum_k taps[k] xp[j + K-1 - k]`` reads only
    ``xp[j : j+K)`` — so output tile t needs input tiles t and t+1 only:

        out_t = xp_t @ b0 + xp_{t+1} @ b1

    Requires ``K - 1 <= tile``.
    """
    taps = np.asarray(taps, np.float64).reshape(-1)
    K = taps.size
    if K - 1 > tile:
        raise ValueError(f"band of {K} taps exceeds one {tile}-tile reach")
    if not (0 <= offset < K):
        raise ValueError(f"offset {offset} outside [0, {K})")
    a = np.arange(tile)[:, None]  # input index within tile (of xp)
    l = np.arange(tile)[None, :]  # output index within tile

    def block(shift: int) -> np.ndarray:
        idx = l - a + (K - 1) - shift
        valid = (idx >= 0) & (idx < K)
        return np.where(valid, taps[np.clip(idx, 0, K - 1)], 0.0).astype(np.float32)

    return block(0), block(tile), K - 1 - offset


def make_gram_band(taps, n: int, tile: int = TILE):
    """Exact 1-D 'same'-convolution Gram ``T^H T`` as a banded pass plus edge
    corrections.

    ``T`` is the K-tap 'same' conv matrix (offset K//2).  ``T^H T`` is
    Toeplitz with the (2K-1)-tap autocorrelation band EXCEPT in its first and
    last K-1 rows, where the 'same' crop removes terms.  Returns
    ``(plan, E_top, E_bot, L)``: the banded-matmul plan for the
    autocorrelation, and two (K-1, L) dense corrections acting on the first /
    last ``L = 2K-2`` samples.  Halves the Gram's banded passes (VERDICT r1
    task 1: 2 HBM streams per axis instead of 4).
    """
    taps = np.asarray(taps, np.float64).reshape(-1)
    K = taps.size
    if K == 1:
        plan = make_band_blocks(taps * taps, 0, tile)
        return plan, None, None, 0
    if n < 3 * K:
        raise ValueError("signal too short for windowed edge corrections")
    acorr = np.convolve(taps, taps[::-1])  # (2K-1,), symmetric
    plan = make_band_blocks(acorr, K - 1, tile)
    # exact Gram on a window; deviations from Toeplitz live in the corners
    o = K // 2
    n_w = 3 * K
    T = np.zeros((n_w, n_w))
    for j in range(n_w):
        for k in range(K):
            p = j - k + o
            if 0 <= p < n_w:
                T[j, p] += taps[k]
    G = T.T @ T
    Gt = np.zeros_like(G)
    for d in range(-(K - 1), K):
        idx = np.arange(max(0, -d), min(n_w, n_w - d))
        Gt[idx + d, idx] = acorr[K - 1 + d]
    E = G - Gt
    L = 2 * K - 2
    E_top = E[: K - 1, :L].astype(np.float32)
    E_bot = E[n_w - (K - 1) :, n_w - L :].astype(np.float32)
    return plan, E_top, E_bot, L


def gram_band_rows(x: jax.Array, gplan, precision=None) -> jax.Array:
    """Exact 1-D conv Gram along the FIRST axis: one banded pass + two thin
    edge-correction matmuls."""
    plan, E_top, E_bot, L = gplan
    out = band_conv_rows(x, plan, precision=precision)
    if E_top is not None:
        Km1 = E_top.shape[0]
        out = out.at[:Km1].add(jnp.asarray(E_top) @ x[:L])
        out = out.at[-Km1:].add(jnp.asarray(E_bot) @ x[-L:])
    return out


def gram_band_cols(x: jax.Array, gplan, precision=None) -> jax.Array:
    """Exact 1-D conv Gram along the LAST axis."""
    plan, E_top, E_bot, L = gplan
    out = band_conv_cols(x, plan, precision=precision)
    if E_top is not None:
        Km1 = E_top.shape[0]
        out = out.at[:, :Km1].add(x[:, :L] @ jnp.asarray(E_top).T)
        out = out.at[:, -Km1:].add(x[:, -L:] @ jnp.asarray(E_bot).T)
    return out


def gram_band_axis(x: jax.Array, gplan, axis: int, precision=None) -> jax.Array:
    """Exact 1-D conv Gram along ANY axis of an n-D array: collapse the
    other axes, run the banded pass + edge corrections, restore the shape.
    The first/last-axis fast paths avoid the transpose entirely."""
    nd = x.ndim
    axis = axis % nd
    if nd == 2 and axis == 0:
        return gram_band_rows(x, gplan, precision=precision)
    if axis == nd - 1:
        shp = x.shape
        out = gram_band_cols(x.reshape(-1, shp[-1]), gplan, precision=precision)
        return out.reshape(shp)
    if axis == 0:
        shp = x.shape
        out = gram_band_rows(x.reshape(shp[0], -1), gplan, precision=precision)
        return out.reshape(shp)
    xm = jnp.moveaxis(x, axis, -1)
    shp = xm.shape
    out = gram_band_cols(xm.reshape(-1, shp[-1]), gplan, precision=precision)
    return jnp.moveaxis(out.reshape(shp), -1, axis)


# ---------------------------------------------------------------------------
# Channel-conv formulation of the lane-direction banded pass
#
# The block-bidiagonal matmul (band_conv_cols) must left-shift the input by
# `lead` lanes — an unaligned lane pad that costs a full extra HBM copy of
# the array, and its two matmuls contract over 128-wide blocks even when the
# band halfwidth is ~14 (>90% of the MXU work multiplies zeros).  Viewing the
# lane axis as (W/tile, tile) and treating the `tile` lanes of each chunk as
# FEATURE channels turns the band into a window-3 tile->tile-channel
# convolution: out_chunk[t] = sum_{d in -1..1} x_chunk[t+d] @ C_d — an
# implicit GEMM that XLA lowers onto the MXU with no pad copy and with
# MXU work proportional to `tile` instead of 128.  Measured at 4096^2,
# K=15 Gram band (docs/BENCH.md): 1.36 ms -> 0.95 ms, exact (HIGHEST) to
# 1.4e-7 vs the block-bidiagonal pass.
# ---------------------------------------------------------------------------

CHAN_TILE = 16  # smallest tile covering halfwidth<=31 bands; fastest measured


def make_chanconv(taps, offset: int, tile: int = CHAN_TILE):
    """(3, tile, tile) channel-conv kernel for the banded 'same' pass
    ``out[j] = sum_k taps[k] * x[j - k + offset]`` (zero boundary), or None
    when the band's reach exceeds the window-3 coverage ``2*tile - 1``.

    Writing the pass as ``out[p] = sum_m b[m] x[p+m]`` with
    ``b[m] = taps[offset - m]``, channel kernel entry ``C_d[i, l]`` is the
    coefficient coupling input lane ``i`` of chunk ``t+d`` to output lane
    ``l`` of chunk ``t``: ``b[tile*d + i - l]``.
    """
    taps = np.asarray(taps, np.float64).reshape(-1)
    K = taps.size
    m_lo, m_hi = offset - K + 1, offset
    if m_lo < -(2 * tile - 1) or m_hi > 2 * tile - 1:
        return None
    i = np.arange(tile)[:, None]
    l = np.arange(tile)[None, :]
    Kc = np.zeros((3, tile, tile), np.float32)
    for d in (-1, 0, 1):
        m = tile * d + i - l
        valid = (m >= m_lo) & (m <= m_hi)
        Kc[d + 1] = np.where(valid, taps[np.clip(offset - m, 0, K - 1)], 0.0)
    return Kc


def chanconv_cols(x: jax.Array, Kc, precision=None) -> jax.Array:
    """Banded 'same' convolution along the LAST axis via the channel-conv
    formulation (``Kc`` from :func:`make_chanconv`).  Requires the lane size
    to be a multiple of the tile."""
    precision = DEFAULT_PRECISION if precision is None else precision
    Kc = jnp.asarray(Kc, x.dtype)
    tile = Kc.shape[1]
    B, W = x.shape
    xt = x.reshape(B, W // tile, tile)
    out = jax.lax.conv_general_dilated(
        xt, Kc, window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
    )
    return out.reshape(B, W)


def gram_chanconv_cols(x: jax.Array, Kc, E, L: int, precision=None) -> jax.Array:
    """Exact 1-D conv Gram along the LAST axis: channel-conv banded pass +
    the same thin edge corrections as :func:`gram_band_cols`."""
    out = chanconv_cols(x, Kc, precision=precision)
    if E is not None:
        E_top, E_bot = E
        Km1 = E_top.shape[0]
        prec = DEFAULT_PRECISION if precision is None else precision
        out = out.at[:, :Km1].add(jnp.matmul(x[:, :L], jnp.asarray(E_top).T, precision=prec))
        out = out.at[:, -Km1:].add(jnp.matmul(x[:, -L:], jnp.asarray(E_bot).T, precision=prec))
    return out


def band_conv_cols(x: jax.Array, plan, precision=None) -> jax.Array:
    """Banded 'same' convolution along the LAST axis of a 2-D array.

    ``plan`` from :func:`make_band_blocks`; two batched MXU matmuls.
    """
    b0, b1, lead = plan
    b0 = jnp.asarray(b0, x.dtype)
    b1 = jnp.asarray(b1, x.dtype)
    precision = DEFAULT_PRECISION if precision is None else precision
    tile = b0.shape[0]
    B, W = x.shape
    nT = -(-W // tile)
    # pad so xp has nT+1 tiles: `lead` zeros in front, zeros to fill behind
    xp = jnp.pad(x, ((0, 0), (lead, (nT + 1) * tile - W - lead)))
    Xt = xp.reshape(B, nT + 1, tile)
    out = jnp.matmul(Xt[:, :nT], b0, precision=precision) + jnp.matmul(
        Xt[:, 1:], b1, precision=precision
    )
    return out.reshape(B, nT * tile)[:, :W]


def band_conv_rows(x: jax.Array, plan, precision=None) -> jax.Array:
    """Banded 'same' convolution along the FIRST axis of a 2-D array.

    Uses the transposes of the same blocks (the row-convolution matrix is
    the transpose-convention twin of the column one).
    """
    b0, b1, lead = plan
    b0 = jnp.asarray(b0, x.dtype)
    b1 = jnp.asarray(b1, x.dtype)
    precision = DEFAULT_PRECISION if precision is None else precision
    tile = b0.shape[0]
    H, W = x.shape
    nR = -(-H // tile)
    xp = jnp.pad(x, ((lead, (nR + 1) * tile - H - lead), (0, 0)))
    Xr = xp.reshape(nR + 1, tile, W)
    out = jnp.einsum("kl,tkw->tlw", b0, Xr[:nR], precision=precision) + jnp.einsum(
        "kl,tkw->tlw", b1, Xr[1:], precision=precision
    )
    return out.reshape(nR * tile, W)[:H]
