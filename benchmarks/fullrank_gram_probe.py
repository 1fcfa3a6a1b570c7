"""Probe: can a full-rank 15x15 PSF's Gram beat the FFT wrap path?

The Gram of ANY 'same' 2-D convolution is a zero-boundary banded conv with
the (2K-1)x(2K-1) autocorrelation (plus frame corrections, ops/_gram.py).
For separable/low-rank PSFs the banded path wins 5-8x over FFT; this probe
measures whether the NON-separable autocorrelation can ride the MXU as a
2-D channel-conv (the kernels/band.py chanconv trick extended to 2-D:
lane chunks of T lanes as channels, rows as a 29-tap spatial dim) and
compares against the FFT wrap Gram at 4096^2.

Run on TPU:  python benchmarks/fullrank_gram_probe.py
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def make_chanconv2d(acorr: np.ndarray, T: int) -> np.ndarray:
    """(Kr, 3, T, T) channel-conv kernel applying the zero-boundary banded
    2-D conv ``out[p] = sum_d acorr[K1 + d] x[p + d]`` (|d| <= K1 per axis)
    on the (H, W/T, T) lane-chunked view.  Entry [dh, dw, i, l] couples
    input lane i of chunk t+dw-1, row p+dh-K1r to output lane l, row p."""
    Kr, Kc = acorr.shape
    K1c = (Kc - 1) // 2
    if 2 * K1c > 2 * T - 1:
        raise ValueError("column reach exceeds the window-3 coverage")
    i = np.arange(T)[:, None]
    l = np.arange(T)[None, :]
    out = np.zeros((Kr, 3, T, T), np.float32)
    for dw in range(3):
        m = T * (dw - 1) + i - l  # column offset of input vs output
        valid = np.abs(m) <= K1c
        cols = np.clip(K1c + m, 0, Kc - 1)
        for dh in range(Kr):
            out[dh, dw] = np.where(valid, acorr[dh, cols], 0.0)
    return out


def chanconv2d_apply(x, Kc2, precision):
    import jax
    import jax.numpy as jnp

    T = Kc2.shape[-1]
    H, W = x.shape
    Kr = Kc2.shape[0]
    xt = x.reshape(1, H, W // T, T)
    out = jax.lax.conv_general_dilated(
        xt, jnp.asarray(Kc2, x.dtype), window_strides=(1, 1),
        padding=[(Kr // 2, Kr // 2), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return out.reshape(H, W)


def _time_chain(fn, x, n_s=20, n_l=100, reps=3):
    import jax
    import jax.numpy as jnp

    def chain(n):
        @jax.jit
        def run(v):
            out = jax.lax.fori_loop(0, n, lambda i, v: fn(v), v)
            return out, jnp.sum(out * out)

        return run

    c_s, c_l = chain(n_s), chain(n_l)
    out, s = c_s(x)
    float(s)
    out, s = c_l(out)
    float(s)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, s = c_s(out)
        float(s)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, s = c_l(out)
        float(s)
        t_l = time.perf_counter() - t0
        best.append((t_l - t_s) / (n_l - n_s))
    return float(np.median(best))


def main():
    import jax
    import jax.numpy as jnp
    from scipy.signal import fftconvolve

    H = W = 4096
    K = 15
    rng = np.random.default_rng(7)
    h = np.abs(rng.standard_normal((K, K))).astype(np.float32)
    h /= h.sum()
    acorr = fftconvolve(h, h[::-1, ::-1]).astype(np.float32)  # (29, 29)
    print(f"acorr {acorr.shape}, numerical matrix rank:",
          np.linalg.matrix_rank(acorr.astype(np.float64), tol=1e-7))

    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32) * 0.1

    # (a) FFT wrap Gram — the current full-rank path
    from pycsou_tpu.ops.conv import Convolve2D

    A = Convolve2D((H, W), h, method="fft")
    gram = A.gram
    t = _time_chain(lambda v: gram.apply(v), x)
    print(f"(a) FFT wrap gram:        {t*1e3:7.3f} ms/apply")

    # correctness witness for the chanconv band (small, vs direct conv)
    hs = 256
    xs_np = rng.standard_normal((hs, hs)).astype(np.float32)
    want = fftconvolve(xs_np, acorr, mode="same")
    for T in (16, 32):
        Kc2 = make_chanconv2d(acorr, T)
        got = np.asarray(chanconv2d_apply(jnp.asarray(xs_np), Kc2, jax.lax.Precision.HIGHEST))
        err = np.abs(got - want).max() / np.abs(want).max()
        print(f"    T={T} witness rel err (interior+edges, zero-bc vs same): {err:.2e}")

    # (b/c) 2-D chanconv banded pass (main term only; frame corrections are
    # thin strips shared with the FFT path)
    for T in (16, 32):
        Kc2 = make_chanconv2d(acorr, T)
        for prec, label in [
            (jax.lax.Precision.HIGHEST, "HIGHEST"),
            (jax.lax.Precision.DEFAULT, "DEFAULT"),
        ]:
            try:
                t = _time_chain(lambda v: chanconv2d_apply(v, Kc2, prec), x)
                print(f"(b) chanconv2d T={T:2d} {label}: {t*1e3:7.3f} ms/apply")
            except Exception as e:
                print(f"(b) chanconv2d T={T} {label} failed: {e!r}")


if __name__ == "__main__":
    main()
