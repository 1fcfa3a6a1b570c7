"""Non-blind 2-D image deconvolution with TV + nonnegativity (BASELINE
config 3): ``min_x ||h*x - y||^2 + lam ||grad x||_{2,1} + i_{x>=0}`` at
2048^2 with Condat-Vu PDS.  Uses the fused convolution Gram (one FFT
roundtrip per gradient).
Run: python examples/deconv_tv_2048.py
"""
import os as _os
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # some TPU runtimes force-register their backend in sitecustomize and
    # ignore the env var; honour the user's explicit CPU request
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import time

import numpy as np
import jax
import jax.numpy as jnp

from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
from pycsou_tpu.func.penalty import L21Norm
from pycsou_tpu.ops.conv import Convolve2D
from pycsou_tpu.ops.diff import Gradient
from pycsou_tpu.opt import PDS
from pycsou_tpu.utils.misc import peaks


def main():
    rng = np.random.default_rng(0)
    n = 2048
    g = np.linspace(-3, 3, n)
    xx, yy = np.meshgrid(g, g)
    clean = np.maximum(np.asarray(peaks(jnp.asarray(xx, jnp.float32), jnp.asarray(yy, jnp.float32))), 0)

    k = np.arange(11) - 5
    gk = np.exp(-(k**2) / 6)
    h = np.outer(gk, gk).astype(np.float32)
    h /= h.sum()

    A = Convolve2D((n, n), h)
    y = A(jnp.asarray(clean)) + 0.005 * jnp.asarray(rng.standard_normal((n, n)), jnp.float32)

    lam = 0.002
    F = SquaredL2Loss((n, n), data=y) * A  # -> LeastSquaresLoss (fused Gram)
    K = Gradient((n, n))
    H = lam * L21Norm((2, n, n), axis=0)

    solver = PDS((n, n), F=F, G=NonNegativeOrthant((n, n)), H=H, K=K,
                 max_iter=300, accuracy_threshold=1e-6, verbose=50)
    t0 = time.perf_counter()
    info = solver.solve()
    x = np.asarray(info["x"])
    dt = time.perf_counter() - t0

    def psnr(a):
        return 10 * np.log10(clean.max() ** 2 / np.mean((a - clean) ** 2))

    print(f"iters={info.n_iter} in {dt:.1f}s ({info.n_iter/dt:.1f} it/s) "
          f"PSNR blurred={psnr(np.asarray(y)):.2f} dB -> deconvolved={psnr(x):.2f} dB")


if __name__ == "__main__":
    main()
