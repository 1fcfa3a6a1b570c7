#!/usr/bin/env python
"""Microbench: lane-direction (last-axis) conv-Gram formulations at 4096^2.

Candidates:
  band    — kernels/band.py gram_band_cols (pad-copy + 2 block matmuls)
  conv    — lax.conv_general_dilated with the 128 lanes of each tile as
            FEATURE channels: w_chunk[t] = sum_d x_chunk[t+d] @ C_d is a
            window-3, 128->128-channel conv = implicit GEMM on the MXU with
            no pad copy of the array.

All timings are chained state-evolving loops (axon relay memoizes repeated
identical dispatches — see docs/BENCH.md caveat).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pycsou_tpu.kernels.band import gram_band_cols, make_gram_band

SHAPE = (4096, 4096)
KSIZE = 15
N_CHAIN = 50


def gaussian(k=KSIZE, sigma=2.0):
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def make_conv_kernel(taps, tile=128):
    """(3, tile, tile) channel-conv kernel for the acorr banded Toeplitz:
    out[p] = sum_{|m|<=K-1} a_m x[p+m]; C_d[i, l] = a_{128 d + i - l}."""
    taps = np.asarray(taps, np.float64).reshape(-1)
    K = taps.size
    acorr = np.convolve(taps, taps[::-1])  # 2K-1, a[K-1+m]
    Kc = np.zeros((3, tile, tile), np.float32)
    for d in (-1, 0, 1):
        i = np.arange(tile)[:, None]
        l = np.arange(tile)[None, :]
        m = tile * d + i - l
        valid = np.abs(m) <= K - 1
        Kc[d + 1] = np.where(valid, acorr[np.clip(K - 1 + m, 0, 2 * K - 2)], 0.0)
    return jnp.asarray(Kc)


def gram_conv_cols(x, Kc, E_top, E_bot, L, precision=None):
    B, W = x.shape
    tile = Kc.shape[1]
    nT = W // tile
    xt = x.reshape(B, nT, tile)
    out = jax.lax.conv_general_dilated(
        xt, Kc, window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    out = out.reshape(B, W)
    if E_top is not None:
        Km1 = E_top.shape[0]
        out = out.at[:, :Km1].add(x[:, :L] @ E_top.T)
        out = out.at[:, -Km1:].add(x[:, -L:] @ E_bot.T)
    return out


def chain(fn):
    @jax.jit
    def run(v):
        def body(i, v):
            w = fn(v)
            return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-20)

        return jax.lax.fori_loop(0, N_CHAIN, body, v)

    return run


def timeit(run, v, label):
    out = run(v)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    gbps = 2 * out.size * 4 / best / 1e9
    print(f"{label:32s} {best*1e3:7.3f} ms  {gbps:6.1f} GB/s (2-stream floor)")
    return best


def main():
    taps = gaussian()
    gplan = make_gram_band(taps, SHAPE[1])
    plan, E_top, E_bot, L = gplan
    E_top_j = None if E_top is None else jnp.asarray(E_top)
    E_bot_j = None if E_bot is None else jnp.asarray(E_bot)
    Kc = make_conv_kernel(taps)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))

    # exactness: conv vs band on the same input
    ref = gram_band_cols(x, gplan)
    for prec in (None, jax.lax.Precision.HIGHEST):
        got = gram_conv_cols(x, Kc, E_top_j, E_bot_j, L, precision=prec)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"conv(prec={prec}) vs band: rel err {err:.2e}")

    timeit(chain(lambda v: gram_band_cols(v, gplan)), x, "band (HIGHEST)")
    for prec in (jax.lax.Precision.HIGHEST, None):
        timeit(
            chain(lambda v, p=prec: gram_conv_cols(v, Kc, E_top_j, E_bot_j, L, precision=p)),
            x, f"conv (prec={prec})",
        )


if __name__ == "__main__":
    main()
