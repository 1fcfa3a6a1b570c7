"""Non-Gaussian (rank-2 PSF) deblurring: defocus + horizontal motion.

Real camera blurs are rarely isotropic Gaussians: a defocus disc plus a
motion streak gives a PSF of numerical rank 2-3.  The flagship
``TVDeconvolution`` detects the low-rank structure automatically and runs
the fused rank-r Pallas engine (``kernels/tvr.py`` megar on TPU: forward
sweep -> adjoint sweep -> PDS stencil in ONE kernel pass per iteration);
on CPU it falls back to the identical-math XLA twin.

Run: python examples/motion_deblur_rank2.py
"""
import os as _os
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import time

import numpy as np
import jax
import jax.numpy as jnp

from pycsou_tpu.ops.conv import Convolve2D, lowrank_factors
from pycsou_tpu.opt.tv import TVDeconvolution
from pycsou_tpu.utils.misc import peaks


def main():
    rng = np.random.default_rng(0)
    n = 1024
    g = np.linspace(-3, 3, n)
    xx, yy = np.meshgrid(g, g)
    smooth = np.asarray(peaks(jnp.asarray(xx, jnp.float32), jnp.asarray(yy, jnp.float32)))
    # piecewise-constant scene (sharp edges — where motion blur actually
    # hurts and the TV prior shines)
    clean = np.maximum(np.round(smooth), 0).astype(np.float32)

    # defocus (isotropic Gaussian) + horizontal motion (wide flat streak)
    k = np.arange(11) - 5
    defocus = np.exp(-(k**2) / 4.0)
    h = np.outer(defocus, defocus) + 0.5 * np.outer(
        np.exp(-(k**2) / 0.8), np.exp(-(k**2) / 30.0)
    )
    h = (h / h.sum()).astype(np.float32)
    us, _ = lowrank_factors(h)
    print(f"PSF numerical rank: {us.shape[1]}")

    A = Convolve2D((n, n), h)
    y = A(jnp.asarray(clean)) + 0.005 * jnp.asarray(rng.standard_normal((n, n)), jnp.float32)

    solver = TVDeconvolution(
        (n, n), y, lam=0.002, filt=h, nonneg=True, max_iter=300,
        accuracy_threshold=1e-6, verbose=100,
    )
    print(f"engine: {solver.stencil_mode}")
    t0 = time.perf_counter()
    info = solver.solve()
    x = np.asarray(info["x"])
    dt = time.perf_counter() - t0

    def psnr(a):
        return 10 * np.log10(clean.max() ** 2 / np.mean((a - clean) ** 2))

    print(
        f"iters={info.n_iter} in {dt:.1f}s ({info.n_iter/dt:.1f} it/s) "
        f"PSNR blurred={psnr(np.asarray(y)):.2f} dB -> deblurred={psnr(x):.2f} dB"
    )


if __name__ == "__main__":
    main()
