#!/usr/bin/env python
"""Headline benchmark: iterations/s of TV-regularised 2-D deconvolution
(4096^2, Condat-Vu PDS) on TPU vs the reference's compute path on CPU.

The reference publishes no numbers (BASELINE.md), so the baseline is measured
here: the *same* PDS iteration math executed with numpy/scipy-FFT (the
reference's numeric engine — pylops delegates its FFT convolutions to
scipy.signal, conv.py:163/285, and everything else is numpy ufuncs).

Evidence-chain hardening (VERDICT r4 task 1): the result JSON is emitted
INCREMENTALLY — the headline line prints immediately after the tuned slope
and is RE-printed, enriched, after every completed section, so a kill/timeout
at any phase still leaves the last complete JSON parseable on stdout (the
round-4 record was lost to a tunnel wedge because the old script buffered
everything into one final print).  A watchdog thread re-execs the process
once if the first device computation wedges (the documented recovery for
this runtime's occasional stuck tunnel).

Emitted keys (final line carries all of them):
  {"metric": ..., "value": <tpu iters/s>, "unit": "iters/s", "vs_baseline": N,
   "time_to_1e6_s": ..., "matvec_gbps": ..., "generic_ips": ...,
   "generic_raw_ips": ..., "lasso_ips": ..., "rank2_ips": ...,
   "dispatch_ms": <runtime per-dispatch constant>,
   "cfg1_lasso1d_ms": ..., "cfg2_denoise512_ips": ..., "cfg3_deconv2048_ips":
   ..., "cfg4_stacked_ips": ..., "cfg5_admm3d_ips": ...,
   "cfg*_vs_cpu": <per-config speedup over the numpy twin>}

(cfg1-cfg5 are BASELINE.md's five benchmark configs at their stated sizes —
VERDICT r4 task 4; cfg1/cfg2 time-to-tol is the small-problem latency record
of task 7.  BENCH_FULL=1 adds rank-6/full-rank PSF rows and lengthens the
generic timing run.)
"""
import json
import os
import sys
import threading
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

RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit():
    """(Re-)print the full result JSON line.  Called after every completed
    section: the LAST parseable line on stdout is always the most complete
    record, and a kill at any phase cannot erase what was already printed."""
    if RESULTS:
        print(json.dumps(RESULTS), flush=True)


# --------------------------- tunnel watchdog ---------------------------------


class _Watchdog:
    """Re-exec once if a phase deadline passes (wedged axon tunnel).

    The tunnel occasionally wedges after killed processes — benchmarks then
    hang BEFORE their first compile, and re-running the same command recovers
    (CLAUDE.md).  The watchdog thread polls a deadline; on expiry it re-execs
    this script once (BENCH_WATCHDOG_RETRY guards against a retry loop)."""

    def __init__(self):
        self._deadline = None
        self._label = ""
        self._lock = threading.Lock()
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def arm(self, label: str, timeout_s: float):
        with self._lock:
            self._label = label
            self._deadline = time.monotonic() + timeout_s

    def cancel(self):
        with self._lock:
            self._deadline = None

    def _run(self):
        while True:
            time.sleep(2.0)
            with self._lock:
                expired = self._deadline is not None and time.monotonic() > self._deadline
                label = self._label
            if not expired:
                continue
            tries = int(os.environ.get("BENCH_WATCHDOG_RETRY", "0"))
            if tries >= 3:
                log(f"[watchdog] phase {label!r} wedged after {tries} retries; exiting")
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(3)
            # a wedge has been observed to persist for minutes across an
            # immediate re-exec; waiting out part of it before retrying
            # raises the odds the fresh process finds a healthy tunnel
            log(f"[watchdog] phase {label!r} exceeded its deadline (wedged "
                f"tunnel?); retry {tries + 1}/3 after a 45 s pause")
            time.sleep(45)
            os.environ["BENCH_WATCHDOG_RETRY"] = str(tries + 1)
            sys.stdout.flush()
            sys.stderr.flush()
            os.execve(
                sys.executable,
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                dict(os.environ),
            )


def _first_device_op():
    """One tiny compile+execute+readback through the tunnel — the canary the
    watchdog observes for the wedged-at-startup failure mode."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    log(f"devices: {jax.devices()}")
    v = float(jnp.ones((128, 128)).sum())
    log(f"[watchdog] first device op ok ({v:.0f}) in {time.perf_counter() - t0:.1f}s")


# --------------------------- problem construction ----------------------------


def gaussian_kernel(k=KSIZE, sigma=2.0):
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    g2 = np.outer(g, g)
    return (g2 / g2.sum()).astype(np.float32)


def make_problem(rng, shape=SHAPE):
    h = gaussian_kernel()
    x_true = np.abs(rng.standard_normal(shape)).astype(np.float32)
    from scipy.signal import fftconvolve

    y = fftconvolve(x_true, h, mode="same").astype(np.float32)
    y += 0.01 * rng.standard_normal(shape).astype(np.float32)
    return h, y


def pds_params(h):
    """Auto step sizes, identical to opt/proxalgs.py."""
    import math

    Hf = np.fft.fft2(h.astype(np.float64), s=(8192, 8192))
    L_A = float(np.max(np.abs(Hf)))
    beta = 2 * L_A**2
    L_K = math.sqrt(8.0)
    tau = (1 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
    return tau, tau, 0.9


# --------------------------- TPU timing helpers ------------------------------


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
    key = getattr(solver, "primary_var", "x")

    def _block(state):
        jax.block_until_ready(state[key if key in state else "x"])

    long_iters = 5 * iters
    t0 = time.perf_counter()
    state = solver.run_fixed(iters)
    _block(state)
    log(f"[{label}] compile+first chunk: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    state = solver.run_fixed(long_iters, state=state)
    _block(state)
    log(f"[{label}] compile long chunk: {time.perf_counter() - t0:.1f}s")
    slopes, means = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = solver.run_fixed(iters, state=state)
        _block(state)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = solver.run_fixed(long_iters, state=state)
        _block(state)
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


def _time_solve_warm(solver, label):
    """Wall-clock ``solve()`` with the compile warmed first (one short
    ``_run_chunk`` with the SAME statics and state shapes as the real solve;
    ``it_stop`` is traced) — time-to-tolerance excluding one-time XLA
    compilation, the production metric for repeated solves."""
    import jax
    import jax.numpy as jnp

    from pycsou_tpu.core.solver import _run_chunk

    st = solver._wrap_state(solver.initial_state())
    st = _run_chunk(solver, st, jnp.asarray(min(10, solver.max_iter), jnp.int32))
    key = getattr(solver, "primary_var", "x")
    jax.block_until_ready(st[key if key in st else "x"])
    info = solver.solve()
    log(f"[{label}] solve: {info.elapsed*1e3:.1f} ms "
        f"({info.n_iter} iters, converged={info.converged})")
    return info


# --------------------------- headline sections -------------------------------


def bench_tpu_headline(h, y):
    import jax.numpy as jnp

    from pycsou_tpu.opt import TVDeconvolution

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
    return ips, state, yj


def sec_matvec(ctx):
    import jax as _jax
    import jax.numpy as _jnp

    from pycsou_tpu.ops.conv import Convolve2D as _C2

    h, state = ctx["h"], ctx["state"]
    A2 = _C2(SHAPE, h)

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
    RESULTS["matvec_gbps"] = round(nbytes / per_mv / 1e9, 1)
    log(f"conv matvec: {per_mv*1e3:.2f} ms -> {nbytes/per_mv/1e9:.1f} GB/s effective (I/O floor)")


def sec_time_to_tol(ctx):
    from pycsou_tpu.opt import TVDeconvolution

    # default engine (mega3): its kernel-epilogue stats measure the
    # SECOND iteration's improvement only, so the double-step engine
    # has single-iteration stopping semantics (kernels/tv.py) and can
    # drive convergence directly — no mega2 pin needed
    conv_solver = TVDeconvolution(
        SHAPE, ctx["yj"], LAM, filt=ctx["h"], nonneg=True,
        max_iter=3000, min_iter=50, accuracy_threshold=1e-6, verbose=None,
        metric_every=1,
    )
    info = _time_solve_warm(conv_solver, "time-to-1e-6")
    RESULTS["time_to_1e6_s"] = round(info.elapsed, 2)


def sec_generic(ctx):
    # generic operator-algebra path (the library's defining route: PDS over a
    # composed SquaredL2Loss * Convolve2D + L21 o Gradient expression) —
    # tracked in the default JSON every round (VERDICT r2 task 6)
    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import PDS

    h, yj = ctx["h"], ctx["yj"]
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
    RESULTS["generic_ips"] = round(gips, 1)
    emit()
    # the unfused expression chain, tracked round-over-round (what any
    # NON-matching composed expression runs at)
    rips, _ = _time_solver(mk(False), "generic-raw", iters=50, reps=2)
    RESULTS["generic_raw_ips"] = round(rips, 1)


def sec_lasso(ctx):
    # fused LASSO (VERDICT r3 task 3b): APGD/FISTA with the Gram + prox +
    # momentum in ONE Pallas pass (kernels/fista.py via opt/lasso.py);
    # this is BASELINE config 1's compute path at flagship size
    from pycsou_tpu.opt import LassoDeconvolution

    ls = LassoDeconvolution(SHAPE, ctx["yj"], 0.01, filt=ctx["h"], max_iter=1000, metric_every=1)
    log(f"lasso engine={ls.engine}")
    lips, _ = _time_solver(ls, "lasso", iters=50, reps=2)
    RESULTS["lasso_ips"] = round(lips, 1)


def _aniso_kernel(k=KSIZE):
    ax = np.arange(k) - k // 2
    g = lambda s: np.exp(-(ax**2) / (2 * s**2))
    h2 = np.outer(g(2.0), g(2.0)) + 0.35 * np.outer(g(0.8), g(4.0))
    return (h2 / h2.sum()).astype(np.float32)


def sec_rank2(ctx):
    # non-Gaussian PSFs (VERDICT r2 task 5): rank-2 rides the fused sweep
    # engines (gradient = two chained pallas sweeps feeding the stencil
    # sweep); a full-rank PSF falls back to the FFT wrap Gram.
    from pycsou_tpu.opt import TVDeconvolution

    h2 = _aniso_kernel()
    s2 = TVDeconvolution(SHAPE, ctx["yj"], LAM, filt=h2, nonneg=True, max_iter=1000, metric_every=1)
    log(f"rank-2 PSF stencil={s2.stencil_mode}")
    r2ips, _ = _time_solver(s2, "rank2", iters=50, reps=2)
    RESULTS["rank2_ips"] = round(r2ips, 1)


def sec_aniso(ctx):
    # anisotropic TV (lam * L1 o Gradient — the reference's own PDS doc
    # example, proxalgs.py:91-119): same fused mega engines, per-component
    # box dual projection instead of the L21 ball (VERDICT r4 task 2)
    from pycsou_tpu.opt import TVDeconvolution

    sa = TVDeconvolution(
        SHAPE, ctx["yj"], LAM, filt=ctx["h"], nonneg=True, max_iter=1000,
        metric_every=1, isotropic=False,
    )
    log(f"aniso stencil={sa.stencil_mode}")
    aips, _ = _time_solver(sa, "aniso", iters=50, reps=2)
    RESULTS["aniso_ips"] = round(aips, 1)


def sec_inpaint(ctx):
    # masked TV (inpainting: F = SquaredL2Loss o Masking): diagonal Gram
    # streamed by the fused 'sweepm' engine — one kernel pass per iteration
    # (VERDICT r4 task 2)
    import jax.numpy as jnp

    from pycsou_tpu.opt import TVDeconvolution

    rng_m = np.random.default_rng(13)
    m = jnp.asarray((rng_m.random(SHAPE) < 0.7).astype(np.float32))
    si = TVDeconvolution(
        SHAPE, m * ctx["yj"], LAM, mask=m, nonneg=True, max_iter=1000,
        metric_every=1,
    )
    log(f"inpaint stencil={si.stencil_mode}")
    iips, _ = _time_solver(si, "inpaint", iters=50, reps=2)
    RESULTS["inpaint_ips"] = round(iips, 1)
    emit()
    # COMBINED blur + mask (partial blurred measurements — superres with
    # blur): the masked megar cascade fuses forward sweep -> data mask ->
    # adjoint sweep -> stencil in one pass ('megarm')
    ss = TVDeconvolution(
        SHAPE, m * ctx["yj"], LAM, filt=ctx["h"], mask=m, nonneg=True,
        max_iter=1000, metric_every=1,
    )
    log(f"superres stencil={ss.stencil_mode}")
    sips, _ = _time_solver(ss, "superres", iters=50, reps=2)
    RESULTS["superres_ips"] = round(sips, 1)
    emit()
    # large-image TV DENOISING now auto-routes through the same double-step
    # diagonal-Gram engine (identity mask): ~1.8x over the mega3 machinery
    sd = TVDeconvolution(
        SHAPE, ctx["yj"], LAM, filt=None, nonneg=True, max_iter=1000,
        metric_every=1,
    )
    log(f"denoise stencil={sd.stencil_mode}")
    dips, _ = _time_solver(sd, "denoise4096", iters=50, reps=2)
    RESULTS["denoise_ips"] = round(dips, 1)


def sec_rank6(ctx):
    # rank-6 PSF: grouped fused sweeps (method='bandg' — two rank<=4
    # pallas passes summed; Gram = adjoint o forward composition)
    from pycsou_tpu.opt import TVDeconvolution

    rng_6 = np.random.default_rng(11)
    u6 = rng_6.standard_normal((KSIZE, 6))
    v6 = rng_6.standard_normal((KSIZE, 6))
    h6 = (u6 @ v6.T).astype(np.float32)
    h6 /= np.abs(h6).sum()
    s6 = TVDeconvolution(SHAPE, ctx["yj"], LAM, filt=h6, nonneg=True, max_iter=1000, metric_every=1)
    log(f"rank-6 PSF stencil={s6.stencil_mode}")
    r6ips, _ = _time_solver(s6, "rank6", iters=50, reps=2)
    RESULTS["rank6_ips"] = round(r6ips, 1)


def sec_fullrank(ctx):
    from pycsou_tpu.opt import TVDeconvolution

    rng_f = np.random.default_rng(7)
    hf = np.abs(rng_f.standard_normal((KSIZE, KSIZE))).astype(np.float32)
    hf /= hf.sum()  # full-rank PSF: FFT wrap-Gram fallback
    sf = TVDeconvolution(SHAPE, ctx["yj"], LAM, filt=hf, nonneg=True, max_iter=1000, metric_every=1)
    log(f"full-rank PSF stencil={sf.stencil_mode}")
    fips, _ = _time_solver(sf, "fullrank", iters=50, reps=2)
    RESULTS["fullrank_ips"] = round(fips, 1)


# --------------------------- dispatch-constant floor --------------------------


def sec_mcmc(ctx):
    # PMYULA fused Langevin sampler (VERDICT r4 task 5): the whole sample —
    # both Gram directions, prox blend, in-kernel Mosaic-PRNG noise, MMSE/m2
    # accumulators — is ONE 7-stream pass (kernels/langevin.py)
    import jax.numpy as jnp

    from scipy.signal import fftconvolve

    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L1Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.opt.mcmc import PMYULA

    m = 2048
    rng = np.random.default_rng(6)
    h = ctx["h"]
    x_true = np.abs(rng.standard_normal((m, m))).astype(np.float32)
    ym = fftconvolve(x_true, h, mode="same").astype(np.float32)
    A = Convolve2D((m, m), h)
    sampler = PMYULA(
        (m, m), F=SquaredL2Loss((m, m), data=jnp.asarray(ym)) * A,
        G=0.01 * L1Norm((m, m)), seed=3, nb_burnin_iterations=20,
        max_iter=2000,
    )
    log(f"mcmc engine={sampler.engine!r} prox={sampler._prox_mode}")
    sps, state = _time_solver(sampler, "mcmc", iters=50, reps=2)
    RESULTS["mcmc_samples_s"] = round(sps, 1)
    n = int(state["count"])
    mmse = np.asarray(state["mmse_raw"]) / max(n, 1)
    log(f"mcmc: {n} samples collected, mmse mean {mmse.mean():.4f} "
        f"(truth mean {x_true.mean():.4f})")


def sec_dispatch(ctx):
    """The runtime's per-dispatch constant (host->tunnel->device->host for a
    trivial program) — the latency FLOOR any small-problem time-to-solution
    is judged against (VERDICT r4 task 7).  Each call uses a fresh scalar
    input so the relay cannot memoize repeated identical dispatches."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((8, 128))
    f = jax.jit(lambda v, s: (v * s).sum())
    float(f(a, 1.0))  # compile
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(a, float(2 + i)))
        ts.append(time.perf_counter() - t0)
    RESULTS["dispatch_ms"] = round(float(np.median(ts)) * 1e3, 1)
    log(f"per-dispatch constant: {RESULTS['dispatch_ms']} ms (median of {len(ts)})")


# --------------------------- BASELINE config benches --------------------------
# The five benchmark configs of BASELINE.md at their stated sizes (VERDICT r4
# task 4), each with a numpy twin for the per-config CPU ratio.


def _best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sec_cfg1_lasso1d(ctx):
    """Config 1: LASSO 1-D deconvolution, 256-pt signal (APGD/FISTA over
    Convolve1D + SquaredL2 + L1).  Dispatch-bound on this runtime — the
    recorded number is time-to-1e-6 (warm) vs the ~dispatch_ms floor."""
    import jax.numpy as jnp

    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L1Norm
    from pycsou_tpu.ops.conv import Convolve1D
    from pycsou_tpu.opt import APGD

    n = 256
    rng = np.random.default_rng(1)
    x_true = np.zeros(n, np.float32)
    x_true[rng.choice(n, 12, replace=False)] = rng.standard_normal(12).astype(np.float32) + 2.0
    g = np.exp(-((np.arange(9) - 4) ** 2) / (2 * 1.5**2)).astype(np.float32)
    g /= g.sum()
    A = Convolve1D((n,), g)
    y1 = A(jnp.asarray(x_true)) + 0.01 * jnp.asarray(rng.standard_normal(n), jnp.float32)
    lam = 0.01
    solver = APGD(
        (n,), F=SquaredL2Loss((n,), data=y1) * A, G=lam * L1Norm((n,)),
        max_iter=3000, min_iter=10, accuracy_threshold=1e-6,
    )
    info = _time_solve_warm(solver, "cfg1")
    RESULTS["cfg1_lasso1d_ms"] = round(info.elapsed * 1e3, 1)

    # numpy twin (FISTA, same update; np.convolve is the reference's direct
    # path for short 1-D kernels, pylops conv.py:163)
    yn = np.asarray(y1)
    tau = solver.tau
    gr = g[::-1]
    x = np.zeros(n, np.float32)
    xt_old = x.copy()
    t_n = 0

    def one_iter():
        nonlocal x, xt_old, t_n
        grad = 2 * np.convolve(np.convolve(x, g, "same") - yn, gr, "same")
        xt = np.sign(x - tau * grad) * np.maximum(np.abs(x - tau * grad) - tau * lam, 0)
        a = t_n / (t_n + 75.0)
        x = xt + a * (xt - xt_old)
        xt_old = xt
        t_n += 1

    t0 = time.perf_counter()
    for _ in range(info.n_iter):
        one_iter()
    np_t = time.perf_counter() - t0
    RESULTS["cfg1_vs_cpu"] = round(np_t * 1e3 / RESULTS["cfg1_lasso1d_ms"], 2)
    log(f"[cfg1] numpy twin: {np_t*1e3:.1f} ms for {info.n_iter} iters")


def sec_cfg2_denoise512(ctx):
    """Config 2: 2-D TV denoising, 512^2 (Condat-Vu PDS, Gradient + L21)."""
    import jax.numpy as jnp

    from pycsou_tpu.opt import TVDeconvolution

    m = 512
    rng = np.random.default_rng(2)
    x_true = np.kron(rng.standard_normal((32, 32)), np.ones((16, 16))).astype(np.float32)
    yn = x_true + 0.1 * rng.standard_normal((m, m)).astype(np.float32)
    lam = 0.2
    solver = TVDeconvolution(
        (m, m), jnp.asarray(yn), lam, filt=None, nonneg=False,
        max_iter=4000, min_iter=10, accuracy_threshold=1e-6, metric_every=1,
    )
    log(f"[cfg2] stencil={solver.stencil_mode}")
    ips, _ = _time_solver(solver, "cfg2", iters=100, reps=2)
    RESULTS["cfg2_denoise512_ips"] = round(ips, 1)
    info = _time_solve_warm(solver, "cfg2")
    RESULTS["cfg2_time_ms"] = round(info.elapsed * 1e3, 1)

    # numpy twin: one EXACT Condat-Vu denoise iteration (identity Gram —
    # pure ufuncs; proxalgs.py:343-355 update rule, u = 2 x_temp - x)
    tau, sigma = solver.tau, solver.sigma
    x = np.zeros((m, m), np.float32)
    z = np.zeros((2, m, m), np.float32)

    def one_iter():
        nonlocal x, z
        div = np.zeros_like(x)
        y0 = z[0].copy()
        y0[-1] = 0
        div[1:] += y0[:-1]
        div -= y0
        y1 = z[1].copy()
        y1[:, -1] = 0
        div[:, 1:] += y1[:, :-1]
        div -= y1
        xt = x - tau * (2 * (x - yn)) - tau * div
        u = 2 * xt - x
        v = z.copy()
        v[0, :-1] += sigma * (u[1:] - u[:-1])
        v[1, :, :-1] += sigma * (u[:, 1:] - u[:, :-1])
        mag = np.sqrt(v[0] ** 2 + v[1] ** 2)[None]
        zt = v * (lam / np.maximum(mag, lam))
        x = 0.9 * xt + 0.1 * x
        z = 0.9 * zt + 0.1 * z

    np_t = _best_of(one_iter)
    RESULTS["cfg2_vs_cpu"] = round(ips * np_t, 2)
    log(f"[cfg2] numpy twin: {np_t*1e3:.2f} ms/iter")


def sec_cfg3_deconv2048(ctx):
    """Config 3: non-blind 2-D deconvolution, 2048^2 (Convolve2D + TV +
    nonnegativity) — the headline problem at its BASELINE-stated size."""
    import jax.numpy as jnp

    from scipy.signal import fftconvolve

    from pycsou_tpu.opt import TVDeconvolution

    m = 2048
    rng = np.random.default_rng(3)
    h = ctx["h"]
    x_true = np.abs(rng.standard_normal((m, m))).astype(np.float32)
    yn = fftconvolve(x_true, h, mode="same").astype(np.float32)
    yn += 0.01 * rng.standard_normal((m, m)).astype(np.float32)
    solver = TVDeconvolution(
        (m, m), jnp.asarray(yn), LAM, filt=h, nonneg=True, max_iter=1000, metric_every=1
    )
    log(f"[cfg3] stencil={solver.stencil_mode}")
    ips, _ = _time_solver(solver, "cfg3", iters=100, reps=2)
    RESULTS["cfg3_deconv2048_ips"] = round(ips, 1)

    # numpy twin: one reference PDS iteration at 2048^2 (scipy FFT convs)
    tau, sigma, rho = pds_params(h)
    hf = h[::-1, ::-1]
    x = np.zeros((m, m), np.float32)
    z = np.zeros((2, m, m), np.float32)

    def one_iter():
        nonlocal x
        r = fftconvolve(x, h, mode="same").astype(np.float32) - yn
        grad = 2 * fftconvolve(r, hf, mode="same").astype(np.float32)
        x = np.maximum(x - tau * grad, 0.0)

    np_t = _best_of(one_iter)
    RESULTS["cfg3_vs_cpu"] = round(ips * np_t, 2)
    log(f"[cfg3] numpy twin: {np_t*1e3:.2f} ms/iter (grad step only — favours CPU)")


def sec_cfg4_stacked(ctx):
    """Config 4: stacked-operator sparse+low-freq recovery —
    VStack(Masking, DCT) measurements, L1-regularised least squares, auto
    step size via on-device power iteration (compute_lipschitz_cst)."""
    import jax.numpy as jnp

    from pycsou_tpu.func import SquaredL2Loss
    from pycsou_tpu.func.penalty import L1Norm
    from pycsou_tpu.ops.sampling import Masking
    from pycsou_tpu.ops.stack import LinOpVStack
    from pycsou_tpu.ops.transform import DCTOperator
    from pycsou_tpu.opt import APGD

    m = 512
    rng = np.random.default_rng(4)
    mask = (rng.random((m, m)) < 0.3).astype(np.float32)
    M = Masking((m, m), mask)
    D = DCTOperator((m, m))
    A = LinOpVStack([M, D])
    # auto step size via power iteration on the stacked operator (BASELINE
    # config 4's named feature; the closed-form stack bound is loose)
    A.compute_lipschitz_cst(maxiter=30)
    log(f"[cfg4] power-iteration ||A|| = {A.lipschitz:.4f}")
    x_true = np.zeros((m, m), np.float32)
    x_true[rng.choice(m, 40), rng.choice(m, 40)] = 3.0
    y4 = A(jnp.asarray(x_true))
    solver = APGD(
        (m, m), F=SquaredL2Loss(A.codim_shape, data=y4) * A,
        G=0.02 * L1Norm((m, m)),
        max_iter=2000, min_iter=10, accuracy_threshold=1e-6,
    )
    ips, _ = _time_solver(solver, "cfg4", iters=100, reps=2)
    RESULTS["cfg4_stacked_ips"] = round(ips, 1)
    info = _time_solve_warm(solver, "cfg4")
    RESULTS["cfg4_time_ms"] = round(info.elapsed * 1e3, 1)

    # numpy twin: FISTA gradient = 2 A^H (A x - y) with scipy dctn.  The
    # non-uniform VStack flattens its codomain: [mask-gathered entries;
    # DCT coefficients] (ops/stack.py LinOpVStack.apply)
    from scipy.fft import dctn, idctn

    mk = np.asarray(mask, bool)
    nm = int(mk.sum())
    y4n = np.asarray(y4)
    ym = np.zeros((m, m), np.float32)
    ym[mk] = y4n[:nm]
    yd = y4n[nm:].reshape(m, m)
    tau, lam4 = solver.tau, 0.02
    x = np.zeros((m, m), np.float32)

    def one_iter():
        nonlocal x
        rm = np.where(mk, x - ym, 0)
        rd = idctn(dctn(x, norm="ortho") - yd, norm="ortho")
        v = x - tau * 2 * (rm + rd)
        x = np.sign(v) * np.maximum(np.abs(v) - tau * lam4, 0)

    np_t = _best_of(one_iter)
    RESULTS["cfg4_vs_cpu"] = round(ips * np_t, 2)
    log(f"[cfg4] numpy twin: {np_t*1e3:.2f} ms/iter")


def sec_cfg5_admm3d(ctx):
    """Config 5: consensus-ADMM block-partitioned 3-D deconvolution across
    scenario batches (psum averaging).  Runs the Fourier x-update engine on
    the real chip (the multi-device execution of the same code path is
    validated by __graft_entry__.dryrun_multichip on the CPU mesh)."""
    import jax.numpy as jnp

    from pycsou_tpu.opt.admm import ConsensusADMM

    d = 64
    S = 4
    rng = np.random.default_rng(5)
    x_true = np.abs(rng.standard_normal((d, d, d))).astype(np.float32)
    h_hats, data = [], []
    for s in range(S):
        psf = np.zeros((d, d, d), np.float32)
        psf[:3, :3, :3] = rng.random((3, 3, 3)).astype(np.float32)
        psf /= psf.sum()
        H = np.fft.rfftn(psf)
        h_hats.append(H)
        blur = np.fft.irfftn(np.fft.rfftn(x_true) * H, s=(d, d, d)).astype(np.float32)
        data.append(blur + 0.01 * rng.standard_normal((d, d, d)).astype(np.float32))
    admm = ConsensusADMM(
        (d, d, d), h_hats=np.stack(h_hats), data=np.stack(data), rho=1.0,
        max_iter=1000,
    )
    ips, _ = _time_solver(admm, "cfg5", iters=50, reps=2)
    RESULTS["cfg5_admm3d_ips"] = round(ips, 1)

    # numpy twin: the same per-scenario Fourier x-update + averaging
    xs = np.zeros((S, d, d, d), np.float32)
    u = np.zeros((S, d, d, d), np.float32)
    z = np.zeros((d, d, d), np.float32)
    Hs = np.stack(h_hats)
    Ys = np.stack([np.fft.rfftn(data[s]) for s in range(S)])

    def one_iter():
        nonlocal xs, u, z
        for s in range(S):
            V = np.fft.rfftn(z - u[s])
            X = (2 * np.conj(Hs[s]) * Ys[s] + V) / (2 * np.abs(Hs[s]) ** 2 + 1.0)
            xs[s] = np.fft.irfftn(X, s=(d, d, d))
        z = (xs + u).mean(axis=0)
        u += xs - z

    np_t = _best_of(one_iter)
    RESULTS["cfg5_vs_cpu"] = round(ips * np_t, 2)
    log(f"[cfg5] numpy twin: {np_t*1e3:.2f} ms/iter")


# --------------------------- numpy headline baseline --------------------------


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


# --------------------------- driver ------------------------------------------


def main():
    wd = _Watchdog()
    # phase A: the wedged-at-startup failure mode (the round-4 record was
    # lost exactly here — BENCH_r04.json rc=124, hung before first compile).
    # 180 s: a recovering-but-alive tunnel has been measured taking 93 s on
    # its first op, so a tighter deadline would re-exec a healthy run
    wd.arm("first-device-op", 180)
    _first_device_op()
    # phase B: the headline section end-to-end (generous — first compiles on
    # this tunnel run 20-40 s each; the numpy baseline runs inside it too)
    wd.arm("headline", 900)

    rng = np.random.default_rng(0)
    log("building 4096^2 TV deconvolution problem ...")
    h, y = make_problem(rng)

    # CPU baseline FIRST: vs_baseline is then known at the moment the
    # headline slope lands, so the very first emitted JSON line is complete
    np_ips = bench_numpy(h, y)

    tpu_ips, state, yj = bench_tpu_headline(h, y)
    RESULTS.update(
        {
            "metric": "TV deconvolution 4096^2 PDS iterations/s (1 chip)",
            "value": round(tpu_ips, 3),
            "unit": "iters/s",
            "vs_baseline": round(tpu_ips / np_ips, 2),
        }
    )
    emit()
    wd.cancel()

    ctx = {"h": h, "y": y, "yj": yj, "state": state}
    sections = [
        ("matvec", sec_matvec),
        ("time_to_tol", sec_time_to_tol),
        ("generic", sec_generic),
        ("lasso", sec_lasso),
        ("rank2", sec_rank2),
        ("aniso", sec_aniso),
        ("inpaint", sec_inpaint),
        ("mcmc", sec_mcmc),
        ("dispatch", sec_dispatch),
        ("cfg1", sec_cfg1_lasso1d),
        ("cfg2", sec_cfg2_denoise512),
        ("cfg3", sec_cfg3_deconv2048),
        ("cfg4", sec_cfg4_stacked),
        ("cfg5", sec_cfg5_admm3d),
    ]
    if os.environ.get("BENCH_FULL") == "1":
        sections[6:6] = [("rank6", sec_rank6), ("fullrank", sec_fullrank)]
    for name, fn in sections:
        wd.arm(name, 600)
        try:
            fn(ctx)
        except Exception as e:
            log(f"{name} section failed: {e!r}")
        emit()
    wd.cancel()


if __name__ == "__main__":
    main()
