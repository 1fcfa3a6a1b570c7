#!/usr/bin/env python
"""Headline benchmark: iterations/s of TV-regularised 2-D deconvolution
(4096^2, Condat-Vu PDS) on TPU vs the reference's compute path on CPU.

The reference publishes no numbers (BASELINE.md), so the baseline is measured
here: the *same* PDS iteration math executed with numpy/scipy-FFT (the
reference's numeric engine — pylops delegates its FFT convolutions to
scipy.signal, conv.py:163/285, and everything else is numpy ufuncs).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu iters/s>, "unit": "iters/s", "vs_baseline": <speedup>,
   "time_to_1e6_s": <seconds to 1e-6 relative improvement>,
   "matvec_gbps": <effective conv matvec GB/s (I/O floor)>}

(time-to-1e-6 and matvec GB/s are BASELINE.md's named metrics; the generic
operator-algebra path is tracked as ``generic_ips`` — all emitted by default.
BENCH_FULL=1 lengthens the generic timing run.)
"""
import json
import os
import sys
import time

# pin the CPU baseline's thread pool BEFORE numpy/scipy load their BLAS/FFT
# backends: on this shared host the unpinned baseline swung 1.9-11 s/iter
# across rounds, making vs_baseline noise (VERDICT r3 weak #7)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

import numpy as np

SHAPE = (4096, 4096)
KSIZE = 15
LAM = 0.05
TPU_ITERS = 100
TPU_REPS = 4
NUMPY_ITERS = 5  # best-of-5: shared-host load only ever inflates a sample


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gaussian_kernel(k=KSIZE, sigma=2.0):
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    g2 = np.outer(g, g)
    return (g2 / g2.sum()).astype(np.float32)


def make_problem(rng):
    h = gaussian_kernel()
    x_true = np.abs(rng.standard_normal(SHAPE)).astype(np.float32)
    from scipy.signal import fftconvolve

    y = fftconvolve(x_true, h, mode="same").astype(np.float32)
    y += 0.01 * rng.standard_normal(SHAPE).astype(np.float32)
    return h, y


def pds_params(h):
    """Auto step sizes, identical to opt/proxalgs.py."""
    import math

    pad = (2 * 8192, 2 * 8192)
    Hf = np.fft.fft2(h.astype(np.float64), s=(8192, 8192))
    L_A = float(np.max(np.abs(Hf)))
    beta = 2 * L_A**2
    L_K = math.sqrt(8.0)
    tau = (1 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
    return tau, tau, 0.9


# --------------------------- TPU path ---------------------------------------


def _time_solver(solver, label, iters=TPU_ITERS, reps=TPU_REPS):
    """Asymptotic iters/s via the SLOPE between a short and a long chunk.

    Every dispatch on this axon-tunnelled runtime pays a ~25-30 ms constant
    host<->device roundtrip (measured: a lone jnp.sum d2h costs that much),
    which a single-chunk timing smears over its iterations.  Timing
    run_fixed(N_s) and run_fixed(N_l) and taking (t_l - t_s)/(N_l - N_s)
    cancels the constant and reports the true per-iteration rate that long
    production solves actually see."""
    import jax

    # pre-size the history allocation for the WHOLE planned bench chain:
    # warmup (iters + 5*iters) + reps * (iters + 5*iters).  A smaller
    # max_iter makes chained run_fixed calls grow the history buffer past the
    # allocation, and every new buffer SHAPE recompiles _run_fixed inside the
    # timed region (the round-3 headline regression: 576 recorded vs ~1185
    # real).  _grow_history now also grows geometrically as a backstop.
    total = 6 * iters * (reps + 1)
    if solver.max_iter < total:
        solver = solver.replace(max_iter=total)

    long_iters = 5 * iters
    t0 = time.perf_counter()
    state = solver.run_fixed(iters)
    jax.block_until_ready(state["x"])
    log(f"[{label}] compile+first chunk: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    state = solver.run_fixed(long_iters, state=state)
    jax.block_until_ready(state["x"])
    log(f"[{label}] compile long chunk: {time.perf_counter() - t0:.1f}s")
    slopes, means = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = solver.run_fixed(iters, state=state)
        jax.block_until_ready(state["x"])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = solver.run_fixed(long_iters, state=state)
        jax.block_until_ready(state["x"])
        t_l = time.perf_counter() - t0
        slopes.append((t_l - t_s) / (long_iters - iters))
        means.append(t_l / long_iters)
        log(f"[{label}] short {t_s*1e3:.1f} ms / long {t_l*1e3:.1f} ms")
    # MEDIAN of slopes: min() latches onto any one host-load hiccup in the
    # short chunk (a 3106-iters/s headline shipped that way once); negative
    # slopes (hiccup in the long chunk) are discarded, and the long-chunk
    # mean — a strict upper bound on the per-iteration time (it still
    # carries the amortised ~27 ms dispatch constant) — caps the estimate
    valid = [s for s in slopes if s > 0] or means
    per_iter = min(float(np.median(valid)), min(means))
    ips = 1.0 / per_iter
    log(f"[{label}] slope {per_iter*1e3:.3f} ms/iter -> {ips:.2f} iters/s")
    return ips, state


def bench_tpu(h, y):
    import jax
    import jax.numpy as jnp

    from pycsou_tpu.opt import TVDeconvolution

    log(f"devices: {jax.devices()}")
    yj = jnp.asarray(y)
    # tuned flagship path: fused convolution Gram + fused Pallas stencil step.
    # metric_every=1 — the REFERENCE's per-iteration-diagnostics semantics
    # (proxalgs.py:366-394): the mega engines emit the metric partial sums
    # from the kernel epilogue (kernels/tv.py _stats_update), so the
    # stopping/diagnostic reductions no longer cost HBM passes
    solver = TVDeconvolution(SHAPE, yj, LAM, filt=h, nonneg=True, max_iter=1000, metric_every=1)
    log(f"tau=sigma={solver.tau:.4f} rho={solver.rho} beta={solver.beta:.4f} stencil={solver.stencil_mode} (x{solver.iters_per_step}/step)")
    try:
        ips, state = _time_solver(solver, "tuned")
    except Exception as e:
        log(f"pallas path failed ({e!r}); falling back to fused-gram + XLA stencils")
        solver = TVDeconvolution(SHAPE, yj, LAM, filt=h, nonneg=True, use_pallas=False, max_iter=1000)
        ips, state = _time_solver(solver, "tuned-xla")

    extras = {}
    # named BASELINE.md metrics: matvec bandwidth + time-to-tol (default-on)
    try:
        from pycsou_tpu.ops.conv import Convolve2D as _C2

        A2 = _C2(SHAPE, h)
        import jax as _jax
        import jax.numpy as _jnp

        # pure apply chains: the normalized PSF has unit DC gain, so raw
        # blur chains neither overflow nor converge to a repeated dispatch;
        # the scalar sum readback (d2h) is the only reliable fence on this
        # runtime, and the 100-vs-500 SLOPE cancels its ~25 ms roundtrip
        def _chain(n):
            @_jax.jit
            def chain(v):
                out = _jax.lax.fori_loop(0, n, lambda i, v: A2.apply(v), v)
                return out, _jnp.sum(out * out)

            return chain

        c_s, c_l = _chain(100), _chain(500)
        out, s = c_s(state["x"])
        float(s)
        out, s = c_l(out)
        float(s)
        mv_slopes, mv_means = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            out, s = c_s(out)
            float(s)
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out, s = c_l(out)
            float(s)
            t_l = time.perf_counter() - t0
            mv_slopes.append((t_l - t_s) / 400)
            mv_means.append(t_l / 500)
        mv_valid = [s for s in mv_slopes if s > 0] or mv_means
        per_mv = min(float(np.median(mv_valid)), min(mv_means))
        nbytes = 2 * out.size * 4  # input read + output write (traffic floor)
        extras["matvec_gbps"] = round(nbytes / per_mv / 1e9, 1)
        log(f"conv matvec: {per_mv*1e3:.2f} ms -> {nbytes/per_mv/1e9:.1f} GB/s effective (I/O floor)")
    except Exception as e:
        log(f"matvec metric failed: {e!r}")

    try:
        # default engine (mega3): its kernel-epilogue stats measure the
        # SECOND iteration's improvement only, so the double-step engine
        # has single-iteration stopping semantics (kernels/tv.py) and can
        # drive convergence directly — no mega2 pin needed
        conv_solver = TVDeconvolution(
            SHAPE, yj, LAM, filt=h, nonneg=True,
            max_iter=3000, min_iter=50, accuracy_threshold=1e-6, verbose=None,
            metric_every=1,
        )
        # warm the solve-loop compile (same statics + state shapes as the
        # real solve; it_stop is traced) so time-to-tol measures solver
        # time, not one-time XLA compilation
        from pycsou_tpu.core.solver import _run_chunk

        _wst = conv_solver._wrap_state(conv_solver.initial_state())
        _wst = _run_chunk(conv_solver, _wst, jnp.asarray(10, jnp.int32))
        jax.block_until_ready(_wst["x"])
        info = conv_solver.solve()
        extras["time_to_1e6_s"] = round(info.elapsed, 2)
        log(
            f"time-to-1e-6 relative improvement: {info.elapsed:.1f}s "
            f"({info.n_iter} iters, converged={info.converged})"
        )
    except Exception as e:
        log(f"time-to-tol metric failed: {e!r}")

    # generic operator-algebra path (the library's defining route: PDS over a
    # composed SquaredL2Loss * Convolve2D + L21 o Gradient expression) —
    # tracked in the default JSON every round (VERDICT r2 task 6)
    try:
        from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
        from pycsou_tpu.func.penalty import L21Norm
        from pycsou_tpu.ops.conv import Convolve2D
        from pycsou_tpu.ops.diff import Gradient
        from pycsou_tpu.opt import PDS

        A = Convolve2D(SHAPE, h)
        F = SquaredL2Loss(SHAPE, data=yj) * A
        mk = lambda fuse: PDS(
            SHAPE, F=F, G=NonNegativeOrthant(SHAPE),
            H=LAM * L21Norm((2,) + SHAPE, axis=0), K=Gradient(SHAPE),
            max_iter=1000, fuse=fuse,
        )
        log(f"generic gram route: {type(getattr(F, '_gram', None)).__name__}")
        full = os.environ.get("BENCH_FULL") == "1"
        # what generic users actually get: the expression recognizer
        # (opt/fuse.py) rewrites the matched pattern onto the fused engines
        generic = mk(True)
        log(f"generic fused -> {type(generic._fused).__name__}"
            f"[{getattr(generic._fused, 'stencil_mode', None)}]")
        gips, _ = _time_solver(
            generic, "generic",
            iters=TPU_ITERS if full else 50, reps=TPU_REPS if full else 2,
        )
        extras["generic_ips"] = round(gips, 1)
        # the unfused expression chain, tracked round-over-round (what any
        # NON-matching composed expression runs at)
        rips, _ = _time_solver(mk(False), "generic-raw", iters=50, reps=2)
        extras["generic_raw_ips"] = round(rips, 1)
    except Exception as e:  # diagnostics only
        log(f"generic path failed: {e!r}")

    # fused LASSO (VERDICT r3 task 3b): APGD/FISTA with the Gram + prox +
    # momentum in ONE Pallas pass (kernels/fista.py via opt/lasso.py);
    # this is BASELINE config 1's compute path
    try:
        from pycsou_tpu.opt import LassoDeconvolution

        ls = LassoDeconvolution(SHAPE, yj, 0.01, filt=h, max_iter=1000, metric_every=1)
        log(f"lasso engine={ls.engine}")
        lips, _ = _time_solver(ls, "lasso", iters=50, reps=2)
        extras["lasso_ips"] = round(lips, 1)
    except Exception as e:
        log(f"lasso path failed: {e!r}")

    # non-Gaussian PSFs (VERDICT r2 task 5): rank-2 rides the fused sweep
    # engines (gradient = two chained pallas sweeps feeding the stencil
    # sweep); a full-rank PSF falls back to the FFT wrap Gram.  rank2_ips is
    # default-on; the full-rank row runs under BENCH_FULL=1.
    try:
        def _aniso(k=KSIZE):
            ax = np.arange(k) - k // 2
            g = lambda s: np.exp(-(ax**2) / (2 * s**2))
            h2 = np.outer(g(2.0), g(2.0)) + 0.35 * np.outer(g(0.8), g(4.0))
            return (h2 / h2.sum()).astype(np.float32)

        h2 = _aniso()
        s2 = TVDeconvolution(SHAPE, yj, LAM, filt=h2, nonneg=True, max_iter=1000, metric_every=1)
        log(f"rank-2 PSF stencil={s2.stencil_mode}")
        r2ips, _ = _time_solver(s2, "rank2", iters=50, reps=2)
        extras["rank2_ips"] = round(r2ips, 1)
    except Exception as e:
        log(f"rank-2 path failed: {e!r}")
    if os.environ.get("BENCH_FULL") == "1":
        try:
            # rank-6 PSF: grouped fused sweeps (method='bandg' — two rank<=4
            # pallas passes summed; Gram = adjoint o forward composition)
            rng_6 = np.random.default_rng(11)
            u6 = rng_6.standard_normal((KSIZE, 6))
            v6 = rng_6.standard_normal((KSIZE, 6))
            h6 = (u6 @ v6.T).astype(np.float32)
            h6 /= np.abs(h6).sum()
            s6 = TVDeconvolution(SHAPE, yj, LAM, filt=h6, nonneg=True, max_iter=1000, metric_every=1)
            log(f"rank-6 PSF stencil={s6.stencil_mode}")
            r6ips, _ = _time_solver(s6, "rank6", iters=50, reps=2)
            extras["rank6_ips"] = round(r6ips, 1)
        except Exception as e:
            log(f"rank-6 path failed: {e!r}")
        try:
            rng_f = np.random.default_rng(7)
            hf = np.abs(rng_f.standard_normal((KSIZE, KSIZE))).astype(np.float32)
            hf /= hf.sum()  # full-rank PSF: FFT wrap-Gram fallback
            sf = TVDeconvolution(SHAPE, yj, LAM, filt=hf, nonneg=True, max_iter=1000, metric_every=1)
            log(f"full-rank PSF stencil={sf.stencil_mode}")
            fips, _ = _time_solver(sf, "fullrank", iters=50, reps=2)
            extras["fullrank_ips"] = round(fips, 1)
        except Exception as e:
            log(f"full-rank path failed: {e!r}")
    return ips, state, extras


# --------------------------- numpy baseline ---------------------------------


def bench_numpy(h, y):
    """Reference compute path: scipy FFT convolution + numpy ufuncs,
    replicating the identical PDS update (proxalgs.py:343-355)."""
    from scipy.signal import fftconvolve

    tau, sigma, rho = pds_params(h)
    hf = h[::-1, ::-1]

    def grad2d(x):
        g = np.zeros((2,) + x.shape, x.dtype)
        g[0, :-1] = x[1:] - x[:-1]
        g[1, :, :-1] = x[:, 1:] - x[:, :-1]
        return g

    def div_adj(z):
        # exact adjoint of grad2d: (D^T y)_j = y_{j-1} - y_j, edge y := 0
        out = np.zeros(z.shape[1:], z.dtype)
        y0 = z[0].copy()
        y0[-1] = 0
        out[1:] += y0[:-1]
        out -= y0
        y1 = z[1].copy()
        y1[:, -1] = 0
        out[:, 1:] += y1[:, :-1]
        out -= y1
        return out

    x = np.zeros(SHAPE, np.float32)
    z = np.zeros((2,) + SHAPE, np.float32)
    per_iter = []
    for _ in range(NUMPY_ITERS):
        t0 = time.perf_counter()
        r = fftconvolve(x, h, mode="same").astype(np.float32) - y
        grad = 2 * fftconvolve(r, hf, mode="same").astype(np.float32)
        x_temp = np.maximum(x - tau * grad - tau * div_adj(z), 0.0)
        v = z + sigma * grad2d(2 * x_temp - x)
        mag = np.sqrt(v[0] ** 2 + v[1] ** 2)[None]
        z_temp = v * (LAM / np.maximum(mag, LAM))
        x = rho * x_temp + (1 - rho) * x
        z = rho * z_temp + (1 - rho) * z
        per_iter.append(time.perf_counter() - t0)
    best = min(per_iter)  # best-of: stabilises against CPU noise, favours the baseline
    ips = 1.0 / best
    log(f"numpy baseline: best {best:.2f}s/iter of {['%.2f' % t for t in per_iter]} -> {ips:.3f} iters/s")
    return ips


def main():
    rng = np.random.default_rng(0)
    log("building 4096^2 TV deconvolution problem ...")
    h, y = make_problem(rng)

    tpu_ips, _, extras = bench_tpu(h, y)
    np_ips = bench_numpy(h, y)

    out = {
        "metric": "TV deconvolution 4096^2 PDS iterations/s (1 chip)",
        "value": round(tpu_ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(tpu_ips / np_ips, 2),
    }
    out.update(extras)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
