"""Fused FISTA/LASSO step for any low-rank (<= 4) PSF (Pallas TPU kernel).

The reference's second flagship configuration is APGD on
``min ||A x - y||^2 + lam ||x||_1`` (/root/reference/pycsou/opt/proxalgs.py:
400-625 with the conv data term of linop/conv.py:167-295).  The generic
chain per iteration: a Gram pass for the gradient, then 3-4 elementwise HBM
passes (prox, momentum, metric).  This kernel is the FISTA sibling of the
rank-r TV engine (kernels/tvr.py): the same 3-stage VMEM ring cascade

* stage 1 (tile i):   per-rank forward lane convs of the streamed v tile;
* stage 2 (tile i-1): forward row dots -> t = A v (never touches HBM),
  immediately lane-convolved with the adjoint taps;
* stage 3 (tile i-2): adjoint row dots -> g = 2 A^H t, then the WHOLE
  FISTA epilogue in registers: gradient step at the extrapolated point,
  soft-threshold (or nonneg shrink), momentum extrapolation, and the
  stopping-metric partial sums (``_stats_update``).

HBM traffic per iteration: 5 streams (v, atb, x_prev in; x, v out) vs the
generic chain's ~10+.  The momentum coefficient changes every iteration
(BT/CD rules), so it rides in as an SMEM scalar — the kernel recompiles on
nothing per-iteration.  Exactness needs no edge corrections: each sweep is
an exact 'same' convolution, so their composition is the exact Gram
(the kernels/conv2d.py two-sweep-Gram argument).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycsou_tpu.kernels.conv2d import lane_conv_multi as _lane_conv_multi, make_sepconv_plan_pair
from pycsou_tpu.kernels.tv import (
    MEGA_HG,
    _dot_bf16x3,
    _split_bf16,
    _stats_update,
)

__all__ = ["make_fista_plan", "lasso_fista_step"]

HG = MEGA_HG


def make_fista_plan(us, vs, shape):
    """(Bf, Cf, Ba, Ca, R) kernel plan for the fused rank-r FISTA step, or
    None when the shape/reach/rank doesn't qualify (same gates as the sweep
    matvec plan).  The adjoint row bands carry the gradient's 2x scale, so
    the kernel's adjoint row dots emit ``2 A^H t`` directly (the
    kernels/tvr.py make_megar_plan convention)."""
    return make_sepconv_plan_pair(us, vs, shape, adj_scale=2.0)


def _fista_kernel(scal_ref, *refs, R, nT, H, W, tau, lam, nonneg, RANK):
    """``scal_ref`` (SMEM, (1,) f32): the momentum coefficient
    ``a = (t_old - 1) / t_new`` for THIS iteration (traced — BT/CD rules
    change it every step)."""
    i = pl.program_id(0)
    (v_ref, a_ref, xp_ref, bf_ref, cf_ref, ba_ref, ca_ref,
     xo, vo, so,
     s_v1, s_v2, s_a, s_xp, s_lv, s_lvt, s_la, s_lat) = refs
    cur_v = v_ref[...]
    cur_a = a_ref[...]
    cur_xp = xp_ref[...]
    dt = cur_v.dtype

    # stage 1: forward lane passes of the v tile being streamed (tile i)
    lv = _lane_conv_multi(cur_v, cf_ref, W, RANK)

    @pl.when(i > 0)
    def _stages():
        # stage 2: t tile (i-1) = forward row dots on the lv rings, then its
        # adjoint lane passes — t lives only in registers/VMEM
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
        # 'same' crop: t = A v exists only on rows [0, H)
        trow = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) + (i - 1) * R
        t = t * jnp.where(trow < H, 1.0, 0.0)
        la = _lane_conv_multi(t.astype(dt), ca_ref, W, RANK)

        @pl.when(i > 1)
        def _epilogue():
            # stage 3: gradient for output tile j2 = i-2 via the (2x-scaled)
            # adjoint row dots, then the full FISTA update in registers
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
                gsum = gk[:R] if gsum is None else gsum + gk[:R]
            g = gsum.astype(dt) - 2.0 * s_a[...]  # Ba carries the 2x
            u = s_v2[...] - tau * g
            thr = tau * lam
            if nonneg:
                x_n = jnp.maximum(u - thr, 0.0)
            else:
                x_n = jnp.sign(u) * jnp.maximum(jnp.abs(u) - thr, 0.0)
            xp_t = s_xp[...]
            v_n = x_n + scal_ref[0] * (x_n - xp_t)
            xo[...] = x_n
            vo[...] = v_n
            # lanes 0-1: x_temp improvement (the APGD stopping metric);
            # lanes 2-3: extrapolated-iterate improvement (diagnostics)
            _stats_update(so, [(x_n, xp_t), (v_n, s_v2[...])])

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
        so[...] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(i > 0)
    def _tail_lv():
        for k in range(RANK):
            s_lvt[k * HG : (k + 1) * HG] = s_lv[(k + 1) * R - HG : (k + 1) * R]

    @pl.when(i < nT)
    def _carry_lv():
        for k in range(RANK):
            s_lv[k * R : (k + 1) * R] = lv[k]

    # iterate rings: 2-deep for v (streamed at tile i, consumed at i-2),
    # 1-deep for atb/x_prev (streamed at tile i-1)
    s_v2[...] = s_v1[...]
    s_v1[...] = cur_v
    s_a[...] = cur_a
    s_xp[...] = cur_xp


@functools.partial(
    jax.jit, static_argnames=("tau", "lam", "nonneg", "interpret", "mega_r")
)
def lasso_fista_step(v, x_prev, atb, Bf, Cf, Ba, Ca, mom, *, tau: float,
                     lam: float, nonneg: bool = False,
                     interpret: bool = False, mega_r: int = 32):
    """One full FISTA iteration with the ENTIRE rank-r Gram (forward +
    adjoint sweeps) fused into the prox/momentum epilogue:

        x+ = prox_{tau lam |.|_1}(v - tau (2 A^H A v - 2 atb))
        v+ = x+ + mom (x+ - x_prev)

    ``mom`` is a (1,) f32 array (traced; changes per iteration).  Returns
    ``(x+, v+, stats)`` with the (8, 128) metric partial-sum block
    (lanes 0-1: x+ vs x_prev; lanes 2-3: v+ vs v).  Plans from
    :func:`make_fista_plan`.  Equivalent to the APGD update
    (/root/reference/pycsou/opt/proxalgs.py:586-601) with
    ``G = lam * L1Norm`` (or the nonnegative shrink)."""
    H, W = v.shape
    R = int(mega_r)
    if H % R:
        raise ValueError(f"height {H} must be divisible by {R}")
    if W < 384 or W % 128:
        raise ValueError(f"fista sweep needs W % 128 == 0 and W >= 384, got {W}")
    rank = Bf.shape[0]
    nT = H // R
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    v_spec = pl.BlockSpec((R, W), lambda i: (jnp.minimum(i, nT - 1), 0))
    lag_spec = pl.BlockSpec((R, W), lambda i: (jnp.clip(i - 1, 0, nT - 1), 0))
    out_spec = pl.BlockSpec((R, W), lambda i: (jnp.clip(i - 2, 0, nT - 1), 0))
    b_spec = pl.BlockSpec(tuple(Bf.shape), lambda i: (0, 0, 0, 0))
    c_spec = pl.BlockSpec(tuple(Cf.shape), lambda i: (0, 0, 0, 0))
    stats_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    kern = functools.partial(
        _fista_kernel, R=R, nT=nT, H=H, W=W,
        tau=float(tau), lam=float(lam), nonneg=bool(nonneg), RANK=rank,
    )
    cp = getattr(pltpu, "CompilerParams", None) or getattr(pltpu, "TPUCompilerParams")
    try:
        params = cp(dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # pragma: no cover
        params = cp(dimension_semantics=("arbitrary",))
    xn, vn, stats = pl.pallas_call(
        kern,
        grid=(nT + 2,),
        in_specs=[scal_spec, v_spec, lag_spec, lag_spec, b_spec, c_spec, b_spec, c_spec],
        out_specs=[out_spec, out_spec, stats_spec],
        out_shape=[jax.ShapeDtypeStruct((H, W), v.dtype)] * 2
        + [jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        # in-place: x_prev -> x+, v -> v+ (kills the while-carry copies)
        input_output_aliases={1: 1, 3: 0},
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),          # s_v1 (tile i-1)
            pltpu.VMEM((R, W), jnp.float32),          # s_v2 (tile i-2)
            pltpu.VMEM((R, W), jnp.float32),          # s_a (atb tile i-2)
            pltpu.VMEM((R, W), jnp.float32),          # s_xp (x_prev tile i-2)
            pltpu.VMEM((rank * R, W), jnp.float32),   # s_lv
            pltpu.VMEM((rank * HG, W), jnp.float32),  # s_lvt
            pltpu.VMEM((rank * R, W), jnp.float32),   # s_la
            pltpu.VMEM((rank * HG, W), jnp.float32),  # s_lat
        ],
        compiler_params=params,
        interpret=interpret,
    )(mom, v, atb, x_prev, Bf, Cf, Ba, Ca)
    return xn, vn, stats
