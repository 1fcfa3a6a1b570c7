"""Spectral transform operators: FFT, DCT.

The reference left this module EMPTY (/root/reference/pycsou/linop/
transform.py, 0 LoC) but its benchmark configs require DCT/FFT operators
(BASELINE config 4).  All transforms here are orthonormal (norm='ortho'), so
they are ``UnitaryMixin`` operators: Lipschitz constant 1, Gram = Identity,
``pinv = adjoint`` — and composing a proximable functional with them keeps
the prox via the unitary precomposition rule
(/root/reference/pycsou/core/functional.py:302-313).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.fft as jfft
import numpy as np

from pycsou_tpu._module import static_field
from pycsou_tpu.core.linop import LinearOperator, UnitaryMixin
from pycsou_tpu.utils.shapes import as_shape

__all__ = ["FFTOperator", "DCTOperator", "IDCTOperator"]


def _dct2_1d_fft(x, axis: int):
    """Orthonormal DCT-II along ``axis`` built from a length-2N real FFT
    (mirror embedding: ``rfft([x, reversed(x)])_k = e^{i pi k/(2N)} 2 t_k``
    with ``t`` the unnormalised DCT-II) — the TPU path.
    ``jax.scipy.fft.dctn`` lowers to a primitive this runtime's TPU
    compiler rejects (UNIMPLEMENTED, and the failure poisons every
    subsequent dispatch of the process), while the FFT primitives are
    first-class on TPU."""
    N = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    u = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    U = jnp.fft.rfft(u)[..., :N]
    k = np.arange(N)
    # 0.5 * Re(e^{-i pi k/(2N)} U_k), with the ortho scales folded in
    cscale = np.concatenate(
        [[1.0 / np.sqrt(N)], np.full(N - 1, np.sqrt(2.0 / N))]
    )
    w_re = jnp.asarray(0.5 * cscale * np.cos(np.pi * k / (2 * N)), jnp.float32)
    w_im = jnp.asarray(0.5 * cscale * np.sin(np.pi * k / (2 * N)), jnp.float32)
    t = jnp.real(U) * w_re + jnp.imag(U) * w_im
    return jnp.moveaxis(t.astype(x.dtype), -1, axis)


def _dctn_ortho(x, axes: Optional[Tuple[int, ...]]):
    """Orthonormal DCT-II over ``axes`` (all axes when None): scipy path on
    CPU, FFT-composed path on TPU (see :func:`_dct2_1d_fft`)."""
    if jax.default_backend() == "cpu":
        return jfft.dctn(x, type=2, axes=axes, norm="ortho")
    for ax in axes if axes is not None else range(x.ndim):
        x = _dct2_1d_fft(x, ax)
    return x


def _dct3_1d_fft(y, axis: int):
    """Orthonormal DCT-III (the inverse of :func:`_dct2_1d_fft`) along
    ``axis`` via a length-2N inverse REAL FFT: with ``c_0 = y_0/sqrt(N)``,
    ``c_k = sqrt(2/N) y_k`` the target ``x_n = Re(sum_{k<N} conj(c_k
    e^{-i pi k/(2N)}) e^{+2 pi i k n/(2N)})`` is exactly an ``irfft`` of the
    half-spectrum ``S_0 = 2N c_0, S_k = N conj(c_k e^{-i pi k/(2N)}),
    S_N = 0``.  Only rfft/irfft primitives are used — this runtime's TPU
    compiler rejects both the complex-input FFT and the rfft-transpose that
    ``jax.linear_transpose`` would emit."""
    N = y.shape[axis]
    y = jnp.moveaxis(y, axis, -1)
    # S_k = N * conj(c_k * e^{-i pi k/(2N)}) for k >= 1; S_0 = 2N c_0 —
    # the weights ship as REAL hi/lo pairs and the complex spectrum is
    # assembled ON-device (lax.complex): complex host->device transfers are
    # unimplemented on this runtime (see ops/conv.py transfer functions)
    k = np.arange(N)
    phase = np.exp(+1j * np.pi * k / (2 * N))  # conj of the twist
    cscale = np.concatenate(
        [[1.0 / np.sqrt(N)], np.full(N - 1, np.sqrt(2.0 / N))]
    )
    wk = N * cscale * phase
    wk[0] = 2.0 * N * cscale[0]
    w_re = jnp.asarray(np.real(wk), jnp.float32)
    w_im = jnp.asarray(np.imag(wk), jnp.float32)
    zpad = jnp.zeros(y.shape[:-1] + (1,), jnp.float32)
    S_re = jnp.concatenate([y * w_re, zpad], axis=-1)
    S_im = jnp.concatenate([y * w_im, zpad], axis=-1)
    x = jnp.fft.irfft(jax.lax.complex(S_re, S_im), n=2 * N)[..., :N]
    return jnp.moveaxis(x.astype(y.dtype), -1, axis)


def _idctn_ortho(y, axes: Optional[Tuple[int, ...]]):
    """Orthonormal inverse DCT (DCT-III): scipy path on CPU, FFT-composed
    path on TPU (see :func:`_dct3_1d_fft`)."""
    if jax.default_backend() == "cpu":
        return jfft.idctn(y, type=2, axes=axes, norm="ortho")
    for ax in axes if axes is not None else range(y.ndim):
        y = _dct3_1d_fft(y, ax)
    return y


class FFTOperator(UnitaryMixin, LinearOperator):
    """Orthonormal n-dimensional discrete Fourier transform
    (complex-to-complex, ``norm='ortho'``).

    Example — unitary round trip::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.ops.transform import FFTOperator
        >>> F = FFTOperator((4,))
        >>> x = jnp.array([1.0, 2.0, 3.0, 4.0]).astype(jnp.complex64)
        >>> bool(jnp.allclose(F.adjoint(F(x)), x, atol=1e-6))
        True
    """

    axes: Optional[Tuple[int, ...]] = static_field(default=None)

    def __init__(self, dim_shape, axes: Optional[Sequence[int]] = None, dtype=np.complex64):
        dim_shape = as_shape(dim_shape)
        super().__init__(dim_shape, dim_shape, lipschitz=1.0, dtype=dtype)
        self.axes = tuple(axes) if axes is not None else None

    def apply(self, x):
        return jnp.fft.fftn(x, axes=self.axes, norm="ortho").astype(self.dtype)

    def adjoint(self, y):
        return jnp.fft.ifftn(jnp.asarray(y), axes=self.axes, norm="ortho").astype(self.dtype)


class DCTOperator(UnitaryMixin, LinearOperator):
    """Orthonormal DCT-II over ``axes`` (real-to-real); adjoint is the
    inverse DCT (= DCT-III).

    Example — a constant signal concentrates in the DC coefficient::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.ops.transform import DCTOperator
        >>> D = DCTOperator((4,))
        >>> D(jnp.ones(4)).tolist()
        [2.0, 0.0, 0.0, 0.0]
    """

    axes: Optional[Tuple[int, ...]] = static_field(default=None)

    def __init__(self, dim_shape, axes: Optional[Sequence[int]] = None, dtype=np.float32):
        dim_shape = as_shape(dim_shape)
        super().__init__(dim_shape, dim_shape, lipschitz=1.0, dtype=dtype)
        self.axes = tuple(axes) if axes is not None else None

    def apply(self, x):
        return _dctn_ortho(x, self.axes).astype(self.dtype)

    def adjoint(self, y):
        return _idctn_ortho(jnp.asarray(y), self.axes).astype(self.dtype)


class IDCTOperator(UnitaryMixin, LinearOperator):
    """Orthonormal inverse DCT (synthesis operator): maps DCT coefficients to
    signal — useful as a sparsifying dictionary in stacked recovery problems.

    Example::

        >>> import jax.numpy as jnp
        >>> from pycsou_tpu.ops.transform import IDCTOperator
        >>> S = IDCTOperator((4,))
        >>> S(jnp.array([2.0, 0.0, 0.0, 0.0])).tolist()   # DC -> constant
        [1.0, 1.0, 1.0, 1.0]
    """

    axes: Optional[Tuple[int, ...]] = static_field(default=None)

    def __init__(self, dim_shape, axes: Optional[Sequence[int]] = None, dtype=np.float32):
        dim_shape = as_shape(dim_shape)
        super().__init__(dim_shape, dim_shape, lipschitz=1.0, dtype=dtype)
        self.axes = tuple(axes) if axes is not None else None

    def apply(self, x):
        return _idctn_ortho(x, self.axes).astype(self.dtype)

    def adjoint(self, y):
        return _dctn_ortho(jnp.asarray(y), self.axes).astype(self.dtype)
