"""Pallas TPU kernel: fused separable convolution Gram.

Computes the exact ``A^H A x`` of a 'same' zero-boundary 2-D convolution
with a LOW-RANK kernel ``h = sum_i u_i v_i^T`` in ONE pass over row tiles:
all four 1-D stages per rank component (conv rows, conv cols, valid-window
mask, corr cols, corr rows) run in VMEM, so HBM traffic is one read of x
plus one write of g — vs ~12 streams for the XLA banded-matmul path and
~25 for the backend FFT Gram.

Mathematical identity (ops/conv.py ``SeparableConvGram2D`` is the oracle):
``A = crop o conv_full(h)`` gives ``A^H A = corr_full o M o conv_full``
where ``M`` is the indicator of the 'same' output window in the full-conv
domain.  Working on a zero-padded image, every stage is a plain (uncropped)
convolution and ``M`` is one masked multiply — exact at all boundaries.

Mosaic survival rules honoured (learned in kernels/tv.py): all BlockSpec
dims Element-indexed for overlapping input tiles; computed intermediates
8-row-aligned; masks built at exact use shapes; per-array tiles <= ~0.8 MB;
column shifts via ``pltpu.roll`` (never thin lane slices).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # Element-indexed (overlapping) blocks: internal but stable in practice
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover
    _Element = None

__all__ = ["sepgram_apply", "sepgram_geometry", "sepgram_available"]


def sepgram_available() -> bool:
    return _Element is not None


def _align8(n: int) -> int:
    return -(-n // 8) * 8


def sepgram_geometry(H: int, W: int, m0: int, m1: int, extra_rows: int = 0):
    """Static geometry for the fused gram kernel; None if infeasible.

    ``extra_rows`` > 0 reserves additional aligned output rows below the
    tile (used by the fused-iteration kernel which needs x_t on R+8 rows).
    """
    if _Element is None:
        return None
    o0, b0 = m0 // 2, m0 - 1 - m0 // 2
    o1, b1 = m1 // 2, m1 - 1 - m1 // 2
    # row halo: enough to cover the +/-(m0-1) gram reach AND keep every
    # in-kernel slice start non-negative (s2 >= b0)
    hr = _align8(max(m0 - 1, 1))
    while (hr - o0) // 8 * 8 < b0:
        hr += 8
    # right pad: lane rolls must wrap only zeros
    reach1 = max(o1, b1, 1)
    Wp = -(-(W + reach1) // 128) * 128
    # pick output rows per tile under the ~0.8MB per-array VMEM budget
    R = None
    for r in (128, 64, 32, 24, 16, 8):
        if H % r == 0 and (r + extra_rows + 2 * hr) * Wp * 4 <= 820_000:
            R = r
            break
    if R is None:
        return None
    # slice end bound: rowconv reads xw[s2+o0-k : +h2], max end s2+o0+h2
    s2 = (hr - o0) // 8 * 8
    h2 = _align8(hr + b0 + R + extra_rows - s2)
    if s2 + o0 + h2 > R + extra_rows + 2 * hr:
        return None
    return dict(R=R, hr=hr, Wp=Wp, s2=s2, h2=h2, o0=o0, b0=b0, o1=o1, b1=b1)


def _gram_chain(xw, *, us, vs, geom, H, W, R_out, row0):
    """The in-VMEM four-stage chain shared by the standalone gram kernel and
    the fused-iteration kernel.

    xw: (R_out + 2*hr, Wp) tile of the padded image (tile row i = padded row
    row0 + i - hr... callers pass row0 = global padded row of tile row 0).
    Returns g on rows [hr, hr + R_out) of the tile, shape (R_out, Wp).
    """
    hr, Wp = geom["hr"], geom["Wp"]
    o0, b0, o1, b1 = geom["o0"], geom["b0"], geom["o1"], geom["b1"]
    s2 = (hr - o0) // 8 * 8
    h2 = _align8(hr + b0 + R_out - s2)
    m0 = len(us[0])
    m1 = len(vs[0])
    dt = xw.dtype

    # ---- forward: t = sum_i conv_cols(v_i, conv_rows(u_i, x)) ------------
    t = None
    for u, v in zip(us, vs):
        r1 = None
        for k in range(m0):
            sl = xw[s2 + o0 - k : s2 + o0 - k + h2]
            r1 = u[k] * sl if r1 is None else r1 + u[k] * sl
        c1 = None
        for k in range(m1):
            rolled = pltpu.roll(r1, (k - o1) % Wp, axis=1)
            c1 = v[k] * rolled if c1 is None else c1 + v[k] * rolled
        t = c1 if t is None else t + c1

    # ---- valid-window mask (rows in [hr, hr+H) of padded coords; cols < W)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h2, Wp), 0) + (row0 + s2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h2, Wp), 1)
    mask = ((rows >= hr) & (rows < hr + H) & (cols < W)).astype(dt)
    t = t * mask

    # ---- adjoint: g = sum_j corr_rows(u_j, corr_cols(v_j, t)) ------------
    g = None
    for u, v in zip(us, vs):
        c2 = None
        for k in range(m1):
            rolled = pltpu.roll(t, (k - b1) % Wp, axis=1)
            c2 = v[m1 - 1 - k] * rolled if c2 is None else c2 + v[m1 - 1 - k] * rolled
        r2 = None
        for k in range(m0):
            sl = c2[hr + b0 - s2 - k : hr + b0 - s2 - k + R_out]
            r2 = u[m0 - 1 - k] * sl if r2 is None else r2 + u[m0 - 1 - k] * sl
        g = r2 if g is None else g + r2
    return g


def _sepgram_kernel(x_ref, o_ref, *, us, vs, geom, H, W):
    i = pl.program_id(0)
    R = geom["R"]
    row0 = i * R  # tile row 0 = padded row row0 (xp includes the top halo)
    g = _gram_chain(x_ref[...], us=us, vs=vs, geom=geom, H=H, W=W, R_out=R, row0=row0)
    o_ref[...] = g


def sepgram_apply(x, us, vs, *, interpret: bool = False):
    """Fused Pallas ``A^H A x`` for ``h = sum_i outer(us[i], vs[i])``.

    ``us``/``vs``: tuples of tuples of python floats (static, baked into the
    kernel as constants).  Requires the geometry to be feasible
    (``sepgram_geometry``); callers fall back to ``SeparableConvGram2D``'s
    XLA banded matmuls otherwise.
    """
    H, W = x.shape
    m0, m1 = len(us[0]), len(vs[0])
    geom = sepgram_geometry(H, W, m0, m1)
    if geom is None:
        raise ValueError("no feasible Pallas geometry for this problem")
    R, hr, Wp = geom["R"], geom["hr"], geom["Wp"]
    xp = jnp.pad(x, ((hr, hr), (0, Wp - W)))

    E = _Element
    in_spec = pl.BlockSpec((E(R + 2 * hr, (0, 0)), E(Wp, (0, 0))), lambda i: (i * R, 0))
    out_spec = pl.BlockSpec((R, Wp), lambda i: (i, 0))
    kern = functools.partial(_sepgram_kernel, us=us, vs=vs, geom=geom, H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(H // R,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((H, Wp), x.dtype),
        interpret=interpret,
    )(xp)
    return out[:, :W]
