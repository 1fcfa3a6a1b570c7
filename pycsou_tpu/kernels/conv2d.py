"""Fused low-rank separable 2-D convolution sweep (Pallas TPU kernel).

The banded XLA matvec path (kernels/band.py) runs the row and lane passes
as two separate computations: read x, write t, read t, write y — plus pad
copies for the banded matmuls and loop-carry copies, measured ~2.6 ms at
4096^2 (51 GB/s effective; xprof attribution in docs/BENCH.md).  This
kernel computes ``y = sum_i C(v_i) R(u_i) x`` ('same' conv with a low-rank
kernel ``sum_i u_i v_i^T``, rank <= 4; reference linop/conv.py:167-295) in
ONE sweep over row tiles:

* the lane passes run per-tile in VMEM as block-tridiagonal 128-chunk MXU
  matmuls (the raw 'same' conv IS its clipped Toeplitz band under zero
  boundaries — no edge corrections, unlike the Gram), one per rank factor
  off a single shared bf16 split of the tile;
* the row passes consume the streamed lane results from per-rank VMEM
  rings with an HG-row tail/head window (the same software pipeline as
  kernels/tv.py), and their dots accumulate into the single output tile.

x is read from HBM exactly once and y written exactly once regardless of
rank — the two-pass path's 2r intermediate arrays, pad copies and carries
disappear.  Composing the forward sweep with the flipped-tap adjoint sweep
gives an EXACT 4-stream Gram for any rank <= 4 PSF (the product of exact
operators needs none of the crop-edge corrections the banded autocorrelation
Gram has to apply).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycsou_tpu.kernels.tv import MEGA_HG, _dot_bf16x3, _split_bf16

__all__ = [
    "make_sepconv_plan_pair", "make_sepconv_plan", "sepconv2d_sweep",
    "sepgram2d_sweep", "sepconv_sweep_available"]

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


def make_sepconv_plan_pair(u_taps, v_taps, shape, *, adj_scale: float = 1.0):
    """Forward AND adjoint sweep plans for a factor stack: the adjoint is
    the correlation — flipped taps at the complementary 'same' offsets
    ``m - 1 - m//2`` (one shared definition of that convention; callers in
    ops/conv.py and kernels/tvr.py).  ``adj_scale`` folds a constant (e.g.
    the gradient's 2x) into the adjoint row band.  Returns
    ``(Bf, Cf, Ba, Ca, r)`` or None when the shape/rank doesn't qualify."""
    u = np.asarray(u_taps, np.float64)
    v = np.asarray(v_taps, np.float64)
    if u.ndim == 1:
        u = u[:, None]
    if v.ndim == 1:
        v = v[:, None]
    m0, m1 = u.shape[0], v.shape[0]
    o0, o1 = m0 // 2, m1 // 2
    pf = make_sepconv_plan(u, v, o0, o1, shape)
    pa = make_sepconv_plan(
        adj_scale * u[::-1], v[::-1], m0 - 1 - o0, m1 - 1 - o1, shape
    )
    if pf is None or pa is None:
        return None
    Bf, Cf, r = pf
    Ba, Ca, _ = pa
    return Bf, Cf, Ba, Ca, r


def make_sepconv_plan(u_taps, v_taps, offset_r: int, offset_c: int, shape):
    """(B, C, R) kernel plan for ``y = sum_i C(v_i) R(u_i) x`` on ``shape``
    (or None when the shape/reach/rank doesn't qualify).  ``u_taps``/
    ``v_taps``: (K,) rank-1 taps or (K, rank) stacked factors, rank <= 4.
    ``offset_*``: the 'same' crop offsets (``K//2`` forward; ``K-1-K//2``
    for the adjoint/correlation).  B is (rank, 2, R+8, R+2HG); C is
    (rank, 2, 256, 128) in the merged-corner form (column reach <= 64, the
    common case: the off-diagonal blocks C_-1/C_+1 have disjoint nonzero
    rows and collapse into one [Cc; C0] plan) or the (rank, 2, 384, 128)
    three-block legacy form otherwise — per-rank row/lane matrices with
    their bf16 hi/lo splits on the second axis."""
    H, W = shape
    u = np.asarray(u_taps, np.float64)
    v = np.asarray(v_taps, np.float64)
    if u.ndim == 1:
        u = u[:, None]
    if v.ndim == 1:
        v = v[:, None]
    rank = u.shape[1]
    if rank != v.shape[1] or rank > 4:
        return None
    if W % 128 or W < 384 or H % 8:
        return None
    if max(offset_r, u.shape[0] - 1 - offset_r) > HG - 1:
        return None
    if max(offset_c, v.shape[0] - 1 - offset_c) > 128:
        return None
    r = 32 if (H % 32 == 0 and (32 + 8) * W * 4 <= 820_000) else (
        16 if (H % 16 == 0 and (16 + 8) * W * 4 <= 820_000) else 0
    )
    if r == 0 or H // r < 1:
        return None
    B = np.stack([np.asarray(_presplit(make_row_band_mat(u[:, i], offset_r, r))) for i in range(rank)])
    # lane reach <= 64: the C_-1/C_+1 blocks' nonzero rows are DISJOINT
    # (lanes >= 128 - reach vs < reach), so both neighbour-chunk dots
    # collapse into ONE dot against Cc = C_-1 + C_+1 with the operand
    # lane-selected at 64 — exact, and 1/3 of the lane MXU passes
    # disappear.  Merged plans ship as [Cc; C_0] (256 rows); the kernels
    # dispatch on the STATIC row count (legacy 384 = 3-dot path).
    reach_c = max(offset_c, v.shape[0] - 1 - offset_c)

    def _lane_mats(taps):
        full = make_lane_band_mats(taps, offset_c)
        if reach_c <= 64:
            return np.concatenate([full[:128] + full[256:], full[128:256]], axis=0)
        return full

    C = np.stack([np.asarray(_presplit(_lane_mats(v[:, i]))) for i in range(rank)])
    return jnp.asarray(B), jnp.asarray(C), r


def lane_conv_multi(x_tile, c_ref, W: int, RANK: int):
    """Per-rank raw 'same' lane convolutions of one (R, W) tile off a single
    shared bf16 split + neighbour-chunk rolls — the lane stage of every
    fused sweep kernel (this file's matvec sweep AND the rank-r TV engine,
    kernels/tvr.py).  Merged [Cc; C_0] plans (static row count 256, reach
    <= 64; see :func:`make_sepconv_plan`) run TWO dots per rank instead of
    three."""
    dt = x_tile.dtype
    R = x_tile.shape[0]
    tile = 128
    nC = W // tile
    merged = c_ref.shape[2] == 2 * tile
    xv = jnp.reshape(x_tile, (R * nC, tile))
    fidx = jax.lax.broadcasted_iota(jnp.int32, (R * nC, tile), 0)
    xh, xl = _split_bf16(xv)
    out = []
    if merged:
        lane = jax.lax.broadcasted_iota(jnp.int32, (R * nC, tile), 1)
        m_lo = jnp.where(
            jnp.logical_and(fidx % nC != nC - 1, lane < 64), 1.0, 0.0
        ).astype(dt)
        m_hi = jnp.where(
            jnp.logical_and(fidx % nC != 0, lane >= 64), 1.0, 0.0
        ).astype(dt)
        xc = (
            pltpu.roll(xh, R * nC - 1, axis=0) * m_lo + pltpu.roll(xh, 1, axis=0) * m_hi,
            pltpu.roll(xl, R * nC - 1, axis=0) * m_lo + pltpu.roll(xl, 1, axis=0) * m_hi,
        )
        for k in range(RANK):
            ch = c_ref[k, 0]
            cl = c_ref[k, 1]
            ok = (
                _dot_bf16x3(xc, (ch[:tile], cl[:tile]))
                + _dot_bf16x3((xh, xl), (ch[tile:], cl[tile:]))
            ).astype(dt)
            out.append(jnp.reshape(ok, (R, W)))
        return out
    m_first = jnp.where(fidx % nC == 0, 0.0, 1.0).astype(dt)
    m_last = jnp.where(fidx % nC == nC - 1, 0.0, 1.0).astype(dt)
    xm = (pltpu.roll(xh, 1, axis=0) * m_first, pltpu.roll(xl, 1, axis=0) * m_first)
    xp = (
        pltpu.roll(xh, R * nC - 1, axis=0) * m_last,
        pltpu.roll(xl, R * nC - 1, axis=0) * m_last,
    )
    for k in range(RANK):
        ch = c_ref[k, 0]
        cl = c_ref[k, 1]
        ok = (
            _dot_bf16x3(xm, (ch[:tile], cl[:tile]))
            + _dot_bf16x3((xh, xl), (ch[tile : 2 * tile], cl[tile : 2 * tile]))
            + _dot_bf16x3(xp, (ch[2 * tile :], cl[2 * tile :]))
        ).astype(dt)
        out.append(jnp.reshape(ok, (R, W)))
    return out


def _sepconv_kernel(x_ref, b_ref, c_ref, yo, s_w, s_wt, *, R, nT, W, RANK):
    i = pl.program_id(0)
    cur = lane_conv_multi(x_ref[...], c_ref, W, RANK)
    dt = cur[0].dtype

    @pl.when(i > 0)
    def _compute():
        last_f = jnp.where(i == nT, 0.0, 1.0).astype(dt)  # rows past H are zero
        acc = None
        for k in range(RANK):
            head = (cur[k] * last_f)[:HG]
            # single (R+8, R+2HG) @ (R+2HG, W) dot on the stitched VMEM window
            # (measured ~9% faster than two split dots: one MXU launch, and
            # the sublane concat of 8-aligned pieces is free)
            win = jnp.concatenate(
                [s_wt[k * HG : (k + 1) * HG], s_w[k * R : (k + 1) * R], head],
                axis=0,
            )
            y = _dot_bf16x3((b_ref[k, 0], b_ref[k, 1]), _split_bf16(win))
            acc = y if acc is None else acc + y
        yo[...] = acc[:R].astype(dt)

    @pl.when(i == 0)
    def _init():
        s_wt[...] = jnp.zeros((RANK * HG, W), jnp.float32)

    @pl.when(i > 0)
    def _tail():
        for k in range(RANK):
            s_wt[k * HG : (k + 1) * HG] = s_w[(k + 1) * R - HG : (k + 1) * R]

    @pl.when(i < nT)
    def _carry():
        for k in range(RANK):
            s_w[k * R : (k + 1) * R] = cur[k]


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def sepconv2d_sweep(x, B, C, *, r: int, interpret: bool = False):
    """One-pass fused rank<=4 'same' 2-D convolution: 2 HBM streams total."""
    H, W = x.shape
    rank = B.shape[0]
    nT = H // r
    in_spec = pl.BlockSpec((r, W), lambda i: (jnp.minimum(i, nT - 1), 0))
    b_spec = pl.BlockSpec(tuple(B.shape), lambda i: (0, 0, 0, 0))
    c_spec = pl.BlockSpec(tuple(C.shape), lambda i: (0, 0, 0, 0))
    out_spec = pl.BlockSpec((r, W), lambda i: (jnp.maximum(i - 1, 0), 0))
    kern = functools.partial(_sepconv_kernel, R=r, nT=nT, W=W, RANK=rank)
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
            pltpu.VMEM((rank * r, W), jnp.float32),
            pltpu.VMEM((rank * HG, W), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(x, B, C)


def _sepgram_kernel(x_ref, *refs, R, nT, W, RANK, with_atb):
    """Fused ``g = A^H A x`` (optionally ``g = s (A^H A x - atb)`` with the
    scale folded into the adjoint row band): the forward sweep, the adjoint
    sweep and the subtraction pipelined through one grid walk — the
    kernels/tvr.py cascade without the PDS stencil.  t = A x never touches
    HBM; x is read once and g written once (3 streams with atb, else 2) vs
    the two-call composition's 4."""
    i = pl.program_id(0)
    if with_atb:
        (a_ref, bf_ref, cf_ref, ba_ref, ca_ref, go,
         s_lv, s_lvt, s_la, s_lat) = refs
    else:
        (bf_ref, cf_ref, ba_ref, ca_ref, go,
         s_lv, s_lvt, s_la, s_lat) = refs
    cur_x = x_ref[...]
    dt = cur_x.dtype

    # stage 1: forward lane passes of the x tile being streamed (tile i)
    lv = lane_conv_multi(cur_x, cf_ref, W, RANK)

    @pl.when(i > 0)
    def _stages():
        # stage 2: t tile (i-1) = forward row dots on the lv rings, then its
        # adjoint lane passes — t lives only in VMEM this step
        last1 = jnp.where(i == nT, 0.0, 1.0).astype(dt)
        t = None
        for k in range(RANK):
            win = jnp.concatenate(
                [
                    s_lvt[k * HG : (k + 1) * HG],
                    s_lv[k * R : (k + 1) * R],
                    (lv[k] * last1)[:HG],
                ],
                axis=0,
            )
            tk = _dot_bf16x3((bf_ref[k, 0], bf_ref[k, 1]), _split_bf16(win))
            t = tk[:R] if t is None else t + tk[:R]
        la = lane_conv_multi(t.astype(dt), ca_ref, W, RANK)

        @pl.when(i > 1)
        def _emit():
            # stage 3: g tile (i-2) via the adjoint row dots
            last2 = jnp.where(i == nT + 1, 0.0, 1.0).astype(dt)
            gsum = None
            for k in range(RANK):
                win = jnp.concatenate(
                    [
                        s_lat[k * HG : (k + 1) * HG],
                        s_la[k * R : (k + 1) * R],
                        (la[k] * last2)[:HG],
                    ],
                    axis=0,
                )
                gk = _dot_bf16x3((ba_ref[k, 0], ba_ref[k, 1]), _split_bf16(win))
                gsum = gk if gsum is None else gsum + gk
            g = gsum[:R].astype(dt)
            if with_atb:
                go[...] = g - 2.0 * a_ref[...]  # Ba carries the 2x scale
            else:
                go[...] = g

        @pl.when(i > 1)
        def _tail_la():
            for k in range(RANK):
                s_lat[k * HG : (k + 1) * HG] = s_la[(k + 1) * R - HG : (k + 1) * R]

        @pl.when(i < nT + 1)
        def _carry_la():
            for k in range(RANK):
                s_la[k * R : (k + 1) * R] = la[k]

    @pl.when(i == 0)
    def _init():
        s_lvt[...] = jnp.zeros((RANK * HG, W), jnp.float32)
        s_lat[...] = jnp.zeros((RANK * HG, W), jnp.float32)

    @pl.when(i > 0)
    def _tail_lv():
        for k in range(RANK):
            s_lvt[k * HG : (k + 1) * HG] = s_lv[(k + 1) * R - HG : (k + 1) * R]

    @pl.when(i < nT)
    def _carry_lv():
        for k in range(RANK):
            s_lv[k * R : (k + 1) * R] = lv[k]


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def sepgram2d_sweep(x, B, C, Ba, Ca, *, r: int, atb=None, interpret: bool = False):
    """One-pass fused rank<=4 Gram ``A^H A x`` — or, with ``atb`` given and
    the 2x scale folded into ``Ba`` (``make_sepconv_plan_pair(adj_scale=2)``),
    the full least-squares data gradient ``2 (A^H A x - atb)``.

    vs ``sepconv2d_sweep(sepconv2d_sweep(x, fwd), adj)``: the intermediate
    ``t = A x`` never leaves VMEM, halving the gram's HBM traffic (4 -> 2
    streams; the fused-gradient form also folds the ``- 2 atb`` read-modify
    into the same output pass)."""
    H, W = x.shape
    rank = B.shape[0]
    nT = H // r
    x_spec = pl.BlockSpec((r, W), lambda i: (jnp.minimum(i, nT - 1), 0))
    a_spec = pl.BlockSpec((r, W), lambda i: (jnp.clip(i - 2, 0, nT - 1), 0))
    b_spec = pl.BlockSpec(tuple(B.shape), lambda i: (0, 0, 0, 0))
    c_spec = pl.BlockSpec(tuple(C.shape), lambda i: (0, 0, 0, 0))
    out_spec = pl.BlockSpec((r, W), lambda i: (jnp.clip(i - 2, 0, nT - 1), 0))
    with_atb = atb is not None
    kern = functools.partial(
        _sepgram_kernel, R=r, nT=nT, W=W, RANK=rank, with_atb=with_atb
    )
    cp = getattr(pltpu, "CompilerParams", None) or getattr(pltpu, "TPUCompilerParams")
    try:
        params = cp(dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # pragma: no cover
        params = cp(dimension_semantics=("arbitrary",))
    in_specs = [x_spec]
    inputs = [x]
    if with_atb:
        in_specs.append(a_spec)
        inputs.append(atb)
    in_specs += [b_spec, c_spec, b_spec, c_spec]
    inputs += [B, C, Ba, Ca]
    return pl.pallas_call(
        kern,
        grid=(nT + 2,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rank * r, W), jnp.float32),   # s_lv
            pltpu.VMEM((rank * HG, W), jnp.float32),  # s_lvt
            pltpu.VMEM((rank * r, W), jnp.float32),   # s_la
            pltpu.VMEM((rank * HG, W), jnp.float32),  # s_lat
        ],
        compiler_params=params,
        interpret=interpret,
    )(*inputs)


def sepconv_sweep_available() -> bool:
    """The sweep kernel needs no Element blocks — available wherever pallas
    TPU lowering (or interpret mode) is."""
    return True
