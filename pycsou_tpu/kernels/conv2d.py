"""Fused rank-1 separable 2-D convolution sweep (Pallas TPU kernel).

The banded XLA matvec path (kernels/band.py) runs the row and lane passes
as two separate computations: read x, write t, read t, write y — plus pad
copies for the banded matmuls and loop-carry copies, measured ~2.6 ms at
4096^2 (51 GB/s effective; xprof attribution in docs/BENCH.md).  This
kernel computes ``y = C(v) R(u) x`` ('same' conv with a rank-1 kernel
``u v^T``, reference linop/conv.py:167-295) in ONE sweep over row tiles:

* the lane pass runs per-tile in VMEM as block-tridiagonal 128-chunk MXU
  matmuls (the raw 'same' conv IS its clipped Toeplitz band under zero
  boundaries — no edge corrections, unlike the Gram);
* the row pass consumes the streamed lane results from a VMEM ring with an
  HG-row tail/head window (the same software pipeline as kernels/tv.py).

x is read from HBM exactly once and y written exactly once — the two-pass
path's intermediate array, pad copies and carries disappear.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycsou_tpu.kernels.tv import MEGA_HG, _dot_bf16x3, _split_bf16

__all__ = ["make_sepconv_plan", "sepconv2d_sweep", "sepconv_sweep_available"]

HG = MEGA_HG  # row-pass window halo (8-row aligned); supports reach <= HG-1


def _band_of(taps, offset):
    """Band coefficients c_m with ``y[p] = sum_m c_m x[p+m]`` for the 'same'
    conv ``y[p] = sum_k h[k] x[p + offset - k]``: ``c_{offset-k} = h[k]``."""
    taps = np.asarray(taps, np.float64).reshape(-1)
    K = taps.size
    reach = max(offset, K - 1 - offset)
    band = np.zeros(2 * reach + 1, np.float64)
    for k in range(K):
        band[reach + offset - k] += taps[k]
    return band, reach


def make_lane_band_mats(taps, offset, *, tile: int = 128):
    """(3*tile, tile) stack [C_-1; C_0; C_+1] applying the raw 'same' lane
    conv as chunked MXU matmuls: ``out_chunk[c] = sum_d x_chunk[c+d] C_d``
    (kernels/tv.py make_mega2_lane_plan, without the crop corrections —
    the forward conv is exactly its clipped Toeplitz band)."""
    band, reach = _band_of(taps, offset)
    if reach > tile:
        raise ValueError(f"lane reach {reach} exceeds one {tile}-chunk")
    i = np.arange(tile)[:, None]
    ll = np.arange(tile)[None, :]
    C = np.zeros((3 * tile, tile), np.float32)
    for d in (-1, 0, 1):
        m = tile * d + i - ll  # out[p] = sum_m c_m x[p+m]
        valid = np.abs(m) <= reach
        C[(d + 1) * tile : (d + 2) * tile] = np.where(
            valid, band[np.clip(reach + m, 0, 2 * reach)], 0.0
        )
    return C


def make_row_band_mat(taps, offset, r: int):
    """(r+8, r+2*HG) matrix applying the raw 'same' row conv to the w-window
    rows [row0-HG, row0+r+HG); row jr of the output is global row row0+jr
    (kernels/tv.py make_mega_band, without the x2 gradient scale)."""
    band, reach = _band_of(taps, offset)
    if reach > HG - 1:
        raise ValueError(f"row reach {reach} exceeds {HG - 1}")
    B = np.zeros((r + 8, r + 2 * HG), np.float32)
    for jr in range(r + 8):
        for q in range(r + 2 * HG):
            m = q - jr - HG  # window row q = global row row0 + jr + m
            if -reach <= m <= reach:
                B[jr, q] = band[reach + m]
    return B


def _presplit(a):
    """Stack the bf16 hi/lo decomposition on a leading axis (host-side), so
    the kernel never spends VPU cycles splitting its CONSTANT operands."""
    a = np.asarray(a, np.float32)
    hi = a.astype(jnp.bfloat16).astype(np.float32)
    lo = (a - hi).astype(jnp.bfloat16).astype(np.float32)
    return jnp.asarray(np.stack([hi, lo]))


def make_sepconv_plan(u_taps, v_taps, offset_r: int, offset_c: int, shape):
    """(B, C, R) kernel plan for ``y = C(v) R(u) x`` on ``shape`` (or None
    when the shape/reach doesn't qualify).  ``offset_*``: the 'same' crop
    offsets (``K//2`` forward; ``K-1-K//2`` for the adjoint/correlation).
    B and C carry their bf16 hi/lo splits on a leading axis of 2."""
    H, W = shape
    u = np.asarray(u_taps, np.float64)
    v = np.asarray(v_taps, np.float64)
    if W % 128 or W < 384 or H % 8:
        return None
    if max(offset_r, u.size - 1 - offset_r) > HG - 1:
        return None
    if max(offset_c, v.size - 1 - offset_c) > 128:
        return None
    r = 32 if (H % 32 == 0 and (32 + 8) * W * 4 <= 820_000) else (
        16 if (H % 16 == 0 and (16 + 8) * W * 4 <= 820_000) else 0
    )
    if r == 0 or H // r < 1:
        return None
    B = make_row_band_mat(u, offset_r, r)
    C = make_lane_band_mats(v, offset_c)
    return _presplit(B), _presplit(C), r


def _lane_conv_tile(x_tile, c_pair, W: int):
    """Raw 'same' lane conv of one (R, W) tile in VMEM (bf16x3 matmuls;
    ``c_pair`` = pre-split (hi, lo) of the (384, 128) [C_-1; C_0; C_+1]
    stack)."""
    dt = x_tile.dtype
    R = x_tile.shape[0]
    tile = 128
    nC = W // tile
    xv = jnp.reshape(x_tile, (R * nC, tile))
    fidx = jax.lax.broadcasted_iota(jnp.int32, (R * nC, tile), 0)
    m_first = jnp.where(fidx % nC == 0, 0.0, 1.0).astype(dt)
    m_last = jnp.where(fidx % nC == nC - 1, 0.0, 1.0).astype(dt)
    xh, xl = _split_bf16(xv)
    xm = (pltpu.roll(xh, 1, axis=0) * m_first, pltpu.roll(xl, 1, axis=0) * m_first)
    xp = (
        pltpu.roll(xh, R * nC - 1, axis=0) * m_last,
        pltpu.roll(xl, R * nC - 1, axis=0) * m_last,
    )
    ch, cl = c_pair
    c1 = (ch[:tile], cl[:tile])
    c2 = (ch[tile : 2 * tile], cl[tile : 2 * tile])
    c3 = (ch[2 * tile :], cl[2 * tile :])
    out = (
        _dot_bf16x3(xm, c1) + _dot_bf16x3((xh, xl), c2) + _dot_bf16x3(xp, c3)
    ).astype(dt)
    return jnp.reshape(out, (R, W))


def _sepconv_kernel(x_ref, b_ref, c_ref, yo, s_w, s_wt, *, R, nT, W):
    i = pl.program_id(0)

    cm = c_ref[...]
    cur_w = _lane_conv_tile(x_ref[...], (cm[0], cm[1]), W)

    @pl.when(i > 0)
    def _compute():
        dt = cur_w.dtype
        last_f = jnp.where(i == nT, 0.0, 1.0).astype(dt)  # rows past H are zero
        head = (cur_w * last_f)[:HG]
        # single (R+8, R+2HG) @ (R+2HG, W) dot on the stitched VMEM window
        # (measured ~9% faster than two split dots: one MXU launch, and the
        # sublane concat of 8-aligned pieces is free)
        win = jnp.concatenate([s_wt[...], s_w[...], head], axis=0)
        bm = b_ref[...]
        y = _dot_bf16x3((bm[0], bm[1]), _split_bf16(win)).astype(dt)
        yo[...] = y[:R]

    @pl.when(i == 0)
    def _init():
        s_wt[...] = jnp.zeros((HG, W), jnp.float32)

    @pl.when(i > 0)
    def _tail():
        s_wt[...] = s_w[R - HG :]

    @pl.when(i < nT)
    def _carry():
        s_w[...] = cur_w


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def sepconv2d_sweep(x, B, C, *, r: int, interpret: bool = False):
    """One-pass fused rank-1 'same' 2-D convolution: 2 HBM streams total."""
    H, W = x.shape
    nT = H // r
    in_spec = pl.BlockSpec((r, W), lambda i: (jnp.minimum(i, nT - 1), 0))
    b_spec = pl.BlockSpec(tuple(B.shape), lambda i: (0, 0, 0))
    c_spec = pl.BlockSpec((2, 384, 128), lambda i: (0, 0, 0))
    out_spec = pl.BlockSpec((r, W), lambda i: (jnp.maximum(i - 1, 0), 0))
    kern = functools.partial(_sepconv_kernel, R=r, nT=nT, W=W)
    cp = getattr(pltpu, "CompilerParams", None) or getattr(pltpu, "TPUCompilerParams")
    try:
        params = cp(dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # pragma: no cover
        params = cp(dimension_semantics=("arbitrary",))
    return pl.pallas_call(
        kern,
        grid=(nT + 1,),
        in_specs=[in_spec, b_spec, c_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, W), jnp.float32),
            pltpu.VMEM((HG, W), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(x, B, C)


def sepconv_sweep_available() -> bool:
    """The sweep kernel needs no Element blocks — available wherever pallas
    TPU lowering (or interpret mode) is."""
    return True
