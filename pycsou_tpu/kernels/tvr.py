"""Fused TV PDS step for ANY low-rank (<= 4) PSF (Pallas TPU kernel).

The mega2 kernel (kernels/tv.py) fuses the Gram into the stencil sweep via
the rank-1 factorisation ``A^H A = RowGram o ColGram`` — which simply does
not exist for rank >= 2 (the r^2 cross terms don't factor into one row band
by one lane band).  This kernel takes the other exact route, the one the
two-sweep Gram (kernels/conv2d.py) proved out: pipeline the FORWARD sweep
``t = A x``, the ADJOINT sweep ``g = 2 A^H t`` and the PDS stencil through
one grid walk over row tiles:

* stage 1 (tile i):   per-rank forward lane convs of the streamed x tile;
* stage 2 (tile i-1): forward row dots on the lane-result VMEM rings
  produce the t tile, which is immediately lane-convolved with the
  adjoint taps (t never touches HBM);
* stage 3 (tile i-2): adjoint row dots on the second-stage rings produce
  the (R+8)-row gradient window, and the full PDS stencil chain
  (kernels/tv.py ``_pds_stencil``) updates x/z0/z1.

Exactness needs NO edge corrections and NO corner fixes: each sweep is an
exact 'same' convolution (its clipped Toeplitz band under zero boundaries),
so their composition is the exact Gram — the property that makes the
mega2 plan's autocorrelation-band corrections unnecessary here.  HBM
traffic per iteration is the same 7 streams as mega2 (x/atb/z0/z1 in,
x/z0/z1 out); compute is 2r lane passes + 2r row dots per tile (vs
mega2's one lane Gram + one row dot), scaling linearly — not
quadratically — in the rank.

Reference anchor: the PDS update this fuses is the reference's hot loop
(/root/reference/pycsou/opt/proxalgs.py:343-355) with a low-rank 'same'
convolution data term (linop/conv.py:167-295).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycsou_tpu.kernels.conv2d import lane_conv_multi as _lane_conv_multi, make_sepconv_plan_pair
from pycsou_tpu.kernels.tv import (
    MEGA_HG,
    _dot_bf16x3,
    _pds_stencil,
    _split_bf16,
    _stats_update,
)

__all__ = [
    "make_megar_plan",
    "tv_pds_megar_step",
    "tv_pds_megar_shard_step",
    "tv_pds_megar_shard2d_step",
]

HG = MEGA_HG


def make_megar_plan(us, vs, shape):
    """(Bf, Cf, Ba, Ca, R) kernel plan for the fused rank-r TV step, or None
    when the shape/reach/rank doesn't qualify (same gates as the sweep
    matvec plan).  ``us``/``vs``: (K0, rank)/(K1, rank) SVD factor stacks of
    the PSF.  The adjoint row bands carry the gradient's 2x scale (the row
    pass is linear in its taps), so the kernel's adjoint row dots emit
    ``2 A^H t`` directly — mirroring make_mega_band's built-in 2x."""
    return make_sepconv_plan_pair(us, vs, shape, adj_scale=2.0)


def _tv_megar_kernel(off_ref, *refs, R, nT, H, W, tau, sigma, rho, lam, nonneg,
                     RANK, core_lo, core_hi, shard, W_global=None, CORE_L=0,
                     W_core=None, iso=True, masked=False):
    """Single-chip AND shard-aware fused rank-r step.  ``off_ref`` (SMEM,
    (2,) i32): GLOBAL (row, col) of (ext) local (0, 0) ((0, 0) single-chip;
    shard callers pass ``device_row0 - R``; 2-D-mesh callers additionally
    ``device_col0 - 128``).  ``H``/``W_global`` are the GLOBAL image dims.
    ``nT``: ext tiles the sweep walks (body + 2 halo tiles in shard mode);
    ``core_lo``/``core_hi``: inclusive ext-output-tile range
    written/stats-accumulated.  Shard mode takes six (R, W) halo inputs
    stitched in-VMEM (see kernels/tv.py _tv_mega2_kernel — same convention).

    2-D spatial mesh (``CORE_L`` > 0): every streamed block is LANE-halo
    extended (width W = 128 + W_core + 128; ppermute zeros at the global
    column edges make the sweeps' zero boundary automatic), the 'same'-crop
    masks key off global columns, and only the core lanes
    [CORE_L, CORE_L + W_core) of each output tile are written."""
    i = pl.program_id(0)
    off = off_ref[0]
    off_c = off_ref[1]
    Wg = W if W_global is None else W_global
    Wc = W if W_core is None else W_core
    m_ref = None
    if shard:
        (x_ref, a_ref, z0_ref, z1_ref, xt_r, xb_r, z0t_r, z0b_r, z1t_r, z1b_r,
         bf_ref, cf_ref, ba_ref, ca_ref, xo, z0o, z1o, so,
         s_x1, s_x2, s_a, s_z0, s_z1, s_lv, s_lvt, s_la, s_lat) = refs
    elif masked:
        # masked deconvolution (superres-with-blur, VERDICT r4 task 2's
        # '(o Conv)' case): the data mask streams at the t-tile index and
        # multiplies t = A x between the forward and adjoint stages —
        # the Gram becomes A^H diag(m) A exactly
        (x_ref, a_ref, m_ref, z0_ref, z1_ref, bf_ref, cf_ref, ba_ref, ca_ref,
         xo, z0o, z1o, so,
         s_x1, s_x2, s_a, s_z0, s_z1, s_lv, s_lvt, s_la, s_lat) = refs
    else:
        (x_ref, a_ref, z0_ref, z1_ref, bf_ref, cf_ref, ba_ref, ca_ref,
         xo, z0o, z1o, so,
         s_x1, s_x2, s_a, s_z0, s_z1, s_lv, s_lvt, s_la, s_lat) = refs
    cur_x = x_ref[...]
    cur_a = a_ref[...]
    cur_z0 = z0_ref[...]
    cur_z1 = z1_ref[...]
    if shard:
        # the ext tiles each stream is at (x leads the lagged a/z by one)
        tx = jnp.minimum(i, nT - 1)
        tz = jnp.clip(i - 1, 0, nT - 1)
        cur_x = jnp.where(tx == 0, xt_r[...], jnp.where(tx == nT - 1, xb_r[...], cur_x))
        cur_z0 = jnp.where(tz == 0, z0t_r[...], jnp.where(tz == nT - 1, z0b_r[...], cur_z0))
        cur_z1 = jnp.where(tz == 0, z1t_r[...], jnp.where(tz == nT - 1, z1b_r[...], cur_z1))
    dt = cur_x.dtype

    # stage 1: forward lane passes of the x tile being streamed (tile i)
    lv = _lane_conv_multi(cur_x, cf_ref, W, RANK)

    @pl.when(i > 0)
    def _stages():
        # stage 2: t tile (i-1) = forward row dots on the lv rings, then its
        # adjoint lane passes — t lives only in registers/VMEM this step
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
        # the 'same' crop: t = A x exists only on GLOBAL rows [0, H) and
        # cols [0, Wg) — halo tiles/lanes outside carry uncropped conv
        # values the adjoint must not see (single-chip imposes this via the
        # ring zero-inits; shard halos need the explicit global masks)
        trow = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) + (i - 1) * R + off
        tmask = jnp.logical_and(trow >= 0, trow < H)
        if CORE_L:
            tcol = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1) + off_c
            tmask = jnp.logical_and(
                tmask, jnp.logical_and(tcol >= 0, tcol < Wg)
            )
        t = t * jnp.where(tmask, 1.0, 0.0)
        if masked:  # data mask on t = A x (tile i-1 — the m stream's index)
            t = t * m_ref[...]
        la = _lane_conv_multi(t.astype(dt), ca_ref, W, RANK)

        @pl.when(i > 1)
        def _stencil():
            # stage 3: gradient window for output tile j2 = i-2 via the
            # (2x-scaled) adjoint row dots, then the fused PDS chain
            j2 = i - 2
            row0 = j2 * R + off
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
            aw = jnp.concatenate([s_a[...], cur_a[:8]], axis=0)
            gw = gsum.astype(dt) - 2.0 * aw  # Ba carries the 2x (make_megar_plan)

            xw = jnp.concatenate([s_x2[...], s_x1[:8]], axis=0)
            z0w = jnp.concatenate([s_z0[8:], cur_z0[:8]], axis=0)
            z0up = jnp.concatenate([s_z0[7 : R + 8], cur_z0[:7]], axis=0)
            z1w = jnp.concatenate([s_z1[...], cur_z1[:8]], axis=0)
            x_n, z0_n, z1_n = _pds_stencil(
                xw, gw, z0w, z0up, z1w, row0, R, H, W, tau, sigma, rho, lam,
                nonneg, col0=(off_c if CORE_L else None), W_global=Wg, iso=iso,
            )
            in_core = jnp.logical_and(j2 >= core_lo, j2 <= core_hi)

            @pl.when(in_core)
            def _write():
                # shard mode: halo output tiles are SKIPPED — their out-block
                # index clamps onto a core block written at an adjacent step,
                # and an unwritten revisit preserves the real content
                cl, ch = CORE_L, CORE_L + Wc
                xo[...] = x_n[:, cl:ch]
                z0o[...] = z0_n[:, cl:ch]
                z1o[...] = z1_n[:, cl:ch]
                _stats_update(
                    so,
                    [
                        (x_n[:, cl:ch], xw[:R, cl:ch]),
                        (z0_n[:, cl:ch], z0w[:R, cl:ch]),
                        (z1_n[:, cl:ch], z1w[:R, cl:ch]),
                    ],
                )

        # second-stage ring updates (after the stencil consumed them); the
        # tail shift waits until the ring holds a real tile (i >= 2) so the
        # i == 0 zero-init survives to the first output tile's window
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
        s_z0[:8] = jnp.zeros((8, W), jnp.float32)
        so[...] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(i > 0)
    def _tail_lv():
        for k in range(RANK):
            s_lvt[k * HG : (k + 1) * HG] = s_lv[(k + 1) * R - HG : (k + 1) * R]

    @pl.when(i > 1)
    def _tail_z0():
        s_z0[:8] = s_z0[R : R + 8]

    @pl.when(i < nT)
    def _carry_lv():
        for k in range(RANK):
            s_lv[k * R : (k + 1) * R] = lv[k]

    # iterate rings: 2-deep for x (streamed at tile i, stencilled at i-2),
    # 1-deep for atb/z0/z1 (streamed at tile i-1)
    s_x2[...] = s_x1[...]
    s_x1[...] = cur_x
    s_a[...] = cur_a
    s_z0[8:] = cur_z0
    s_z1[...] = cur_z1


def _megar_call(x, atb, z0, z1, Bf, Cf, Ba, Ca, off, *, R, H_global, core_lo,
                core_hi, tau, sigma, rho, lam, nonneg, interpret, vma=None,
                halos=None, W_global=None, core_l=0, iso=True, mask=None):
    """Shared pallas_call for the single-chip and shard-aware megar paths
    (the kernels/tv.py _mega2_call convention: in shard mode x/z0/z1 are the
    device's CORE (h_loc, W) blocks, ``atb`` the halo-EXTENDED
    (h_loc + 2R, W) block, and the six (R, W) ``halos`` are stitched
    in-VMEM; outputs are core-shaped).

    2-D spatial mesh (``core_l`` > 0): x/z0/z1/atb/halos are LANE-halo
    extended (width = core_l + w_core + core_l), ``W_global`` is the global
    image width, and the outputs are (h_loc, w_core) core blocks."""
    shard = halos is not None
    Hl, W = x.shape
    if Hl % R:
        raise ValueError(f"local height {Hl} must be divisible by {R}")
    if W < 384 or W % 128:
        raise ValueError(f"megar needs W % 128 == 0 and W >= 384, got {W}")
    rank = Bf.shape[0]
    Wc = W - 2 * core_l  # core lanes (== W when core_l == 0)
    nTc = Hl // R  # body tiles
    nT = nTc + 2 if shard else nTc  # ext tiles the sweep walks
    off_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if shard:
        x_spec = pl.BlockSpec(
            (R, W), lambda i: (jnp.clip(jnp.minimum(i, nT - 1) - 1, 0, nTc - 1), 0)
        )
        a_spec = pl.BlockSpec((R, W), lambda i: (jnp.clip(i - 1, 0, nT - 1), 0))
        z_spec = pl.BlockSpec(
            (R, W), lambda i: (jnp.clip(jnp.clip(i - 1, 0, nT - 1) - 1, 0, nTc - 1), 0)
        )
        halo_spec = pl.BlockSpec((R, W), lambda i: (0, 0))
        out_spec = pl.BlockSpec((R, Wc), lambda i: (jnp.clip(i - 3, 0, nTc - 1), 0))
    else:
        x_spec = pl.BlockSpec((R, W), lambda i: (jnp.minimum(i, nT - 1), 0))
        a_spec = z_spec = pl.BlockSpec((R, W), lambda i: (jnp.clip(i - 1, 0, nT - 1), 0))
        out_spec = pl.BlockSpec((R, Wc), lambda i: (jnp.clip(i - 2, 0, nT - 1), 0))
    b_spec = pl.BlockSpec(tuple(Bf.shape), lambda i: (0, 0, 0, 0))
    c_spec = pl.BlockSpec(tuple(Cf.shape), lambda i: (0, 0, 0, 0))
    stats_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    kern = functools.partial(
        _tv_megar_kernel, R=R, nT=nT, H=int(H_global), W=W,
        tau=float(tau), sigma=float(sigma), rho=float(rho), lam=float(lam),
        nonneg=bool(nonneg), RANK=rank,
        core_lo=int(core_lo), core_hi=int(core_hi), shard=shard,
        W_global=(None if W_global is None else int(W_global)),
        CORE_L=int(core_l), W_core=Wc, iso=bool(iso), masked=mask is not None,
    )
    cp = getattr(pltpu, "CompilerParams", None) or getattr(pltpu, "TPUCompilerParams")
    try:
        params = cp(dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # pragma: no cover
        params = cp(dimension_semantics=("arbitrary",))
    in_specs = [off_spec, x_spec, a_spec, z_spec, z_spec]
    inputs = [off, x, atb, z0, z1]
    if mask is not None:
        if shard:
            raise ValueError("masked megar is single-chip only (no shard mode)")
        in_specs.insert(3, a_spec)  # m streams at the t-tile index, like atb
        inputs.insert(3, mask)
    if shard:
        in_specs += [halo_spec] * 6
        inputs += list(halos)
    in_specs += [b_spec, c_spec, b_spec, c_spec]
    inputs += [Bf, Cf, Ba, Ca]
    sds = functools.partial(jax.ShapeDtypeStruct, **({"vma": vma} if vma is not None else {}))
    xn, z0n, z1n, stats = pl.pallas_call(
        kern,
        grid=(nT + 2,),
        in_specs=in_specs,
        out_specs=[out_spec] * 3 + [stats_spec],
        out_shape=[sds((Hl, Wc), x.dtype)] * 3 + [sds((8, 128), jnp.float32)],
        # in-place x/z0/z1 (see _mega2_call): kills the while-carry copies.
        # The 2-D-mesh path cannot alias (ext inputs vs core outputs differ
        # in shape) — it pays the carry copies instead.  The masked variant
        # shifts the z inputs by one slot (m inserted at 3).
        input_output_aliases=(
            {} if core_l != 0
            else ({1: 0, 4: 1, 5: 2} if mask is not None else {1: 0, 3: 1, 4: 2})
        ),
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),       # s_x1 (tile i-1)
            pltpu.VMEM((R, W), jnp.float32),       # s_x2 (tile i-2)
            pltpu.VMEM((R, W), jnp.float32),       # s_a (atb tile i-2)
            pltpu.VMEM((R + 8, W), jnp.float32),   # s_z0 (8-row margin + tile)
            pltpu.VMEM((R, W), jnp.float32),       # s_z1
            pltpu.VMEM((rank * R, W), jnp.float32),   # s_lv
            pltpu.VMEM((rank * HG, W), jnp.float32),  # s_lvt
            pltpu.VMEM((rank * R, W), jnp.float32),   # s_la
            pltpu.VMEM((rank * HG, W), jnp.float32),  # s_lat
        ],
        compiler_params=params,
        interpret=interpret,
    )(*inputs)
    return xn, z0n, z1n, stats


@functools.partial(
    jax.jit, static_argnames=("tau", "sigma", "rho", "lam", "nonneg", "interpret", "mega_r", "iso")
)
def tv_pds_megar_step(x, z0, z1, atb, Bf, Cf, Ba, Ca, *, tau: float, sigma: float,
                      rho: float, lam: float, nonneg: bool = True,
                      interpret: bool = False, mega_r: int = 32, iso: bool = True,
                      mask=None):
    """One full TV PDS iteration with the ENTIRE rank-r Gram (forward +
    adjoint sweeps) fused into the stencil kernel — the rank >= 2 analogue
    of :func:`pycsou_tpu.kernels.tv.tv_pds_mega2_step` (same 7 HBM streams,
    same ``stats`` epilogue partial sums, same separate-dual convention).

    ``Bf``/``Cf``/``Ba``/``Ca`` from :func:`make_megar_plan` (the adjoint
    row bands carry the gradient's 2x).  Equivalent to
    ``tv_pds_stencil_step_xla(x, z, 2*(A^H A x - atb), ...)``."""
    H, W = x.shape
    R = int(mega_r)
    return _megar_call(
        x, atb, z0, z1, Bf, Cf, Ba, Ca, jnp.zeros((2,), jnp.int32),
        R=R, H_global=H, core_lo=0, core_hi=H // R - 1,
        tau=tau, sigma=sigma, rho=rho, lam=lam, nonneg=nonneg, interpret=interpret,
        iso=iso, mask=mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tau", "sigma", "rho", "lam", "nonneg", "interpret", "mega_r", "H_global", "vma", "iso"),
)
def tv_pds_megar_shard_step(x, z0, z1, atb_ext, halos, Bf, Cf, Ba, Ca, off, *,
                            H_global: int, tau: float, sigma: float, rho: float,
                            lam: float, nonneg: bool = True,
                            interpret: bool = False, mega_r: int = 32, vma=None,
                            iso: bool = True):
    """Shard-aware megar step (callable INSIDE shard_map): the device's
    rank-r fused iteration over its CORE (h_loc, W) blocks with six (R, W)
    ppermute halo blocks ``(xt, xb, z0t, z0b, z1t, z1b)`` stitched in-VMEM
    and an halo-EXTENDED iteration-constant ``atb_ext``.

    Needs ``R >= 2*HG`` (= 32): the two-stage pipeline's compute reach into
    a neighbour is 2*HG rows, so one R-row halo tile covers it with the
    boundary rows recomputed redundantly (the mega2 shard pattern).  ``off``
    is the global row of ext row 0 (``device_row0 - R``); every boundary
    mask keys off global rows, so interior shards see no-op masks."""
    h_loc, W = x.shape
    R = int(mega_r)
    nTc = h_loc // R
    if off.shape[0] == 1:  # legacy (row-only) offset
        off = jnp.concatenate([off, jnp.zeros((1,), off.dtype)])
    return _megar_call(
        x, atb_ext, z0, z1, Bf, Cf, Ba, Ca, off,
        R=R, H_global=int(H_global), core_lo=1, core_hi=nTc,
        tau=tau, sigma=sigma, rho=rho, lam=lam, nonneg=nonneg,
        interpret=interpret, vma=vma, halos=halos, iso=iso,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tau", "sigma", "rho", "lam", "nonneg", "interpret",
                     "mega_r", "H_global", "W_global", "vma", "iso"),
)
def tv_pds_megar_shard2d_step(x_ext, z0_ext, z1_ext, atb_ext, halos, Bf, Cf,
                              Ba, Ca, off, *, H_global: int, W_global: int,
                              tau: float, sigma: float, rho: float, lam: float,
                              nonneg: bool = True, interpret: bool = False,
                              mega_r: int = 32, vma=None, iso: bool = True):
    """Fused rank-r PDS step for a TRUE 2-D spatial mesh (callable INSIDE a
    ``shard_map`` over ``(sp0, sp1)``): the device's (h_loc, w_loc) block
    with ONE-chunk (128-lane) column halos and R-row row halos.

    ``x_ext``/``z0_ext``/``z1_ext``: (h_loc, w_loc + 256) lane-halo-extended
    local blocks (ppermute along sp1; mesh-edge zeros ARE the sweeps' zero
    boundary); ``atb_ext``: (h_loc + 2R, w_loc + 256) fully-extended
    iteration constant; ``halos``: six (R, w_loc + 256) row-halo blocks
    ``(xt, xb, z0t, z0b, z1t, z1b)`` taken from the NEIGHBOURS' lane-extended
    blocks (so the diagonal corners ride along); ``off``: (2,) i32 global
    (row, col) of ext (0, 0) = ``(device_row0 - R, device_col0 - 128)``.

    Outputs are CORE-shaped (h_loc, w_loc).  The 128-lane halo covers one
    iteration's column reach (gram m1 - 1 plus the stencil's 1) for any
    PSF the sweep plans accept; rows reuse the 1-D shard argument
    (R = 32 >= 2*HG pipeline reach)."""
    h_loc, W_ext = x_ext.shape
    R = int(mega_r)
    nTc = h_loc // R
    return _megar_call(
        x_ext, atb_ext, z0_ext, z1_ext, Bf, Cf, Ba, Ca, off,
        R=R, H_global=int(H_global), core_lo=1, core_hi=nTc,
        tau=tau, sigma=sigma, rho=rho, lam=lam, nonneg=nonneg,
        interpret=interpret, vma=vma, halos=halos, iso=iso,
        W_global=int(W_global), core_l=128,
    )
