"""Distributed solvers: mesh-sharded PDS for TV-regularised deconvolution.

The flagship multi-chip path (BASELINE configs 3/5): the image, measurement
and dual variables are row-sharded over a 1-D mesh; one PDS iteration is a
single ``shard_map``-ped XLA computation in which

* the blur and its adjoint run as overlap-save FFT convolutions with
  ``ppermute`` halo exchange (spatial.py),
* the TV gradient/divergence exchange one halo row,
* the L21 fenchel-prox and the nonnegativity prox are purely local,
* no collective other than the halos is needed inside an iteration.

Both solvers are first-class :class:`~pycsou_tpu.core.solver.IterativeSolver`
subclasses (VERDICT r1 task 3): the state lives as GLOBAL sharded
``jax.Array``s, so the base driver's stopping metric (a ``jnp.vdot`` that
GSPMD all-reduces over the mesh), on-device history, per-variable
diagnostics, checkpoint/resume and ``SolveInfo`` all apply unchanged — a
distributed solve can assert "converged to 1e-6".

The reference has no distributed solver at all (SURVEY §2.6); this is the
TPU-native replacement for its joblib/Dask story.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pycsou_tpu._module import static_field
from pycsou_tpu.core.solver import IterativeSolver
from pycsou_tpu.parallel.mesh import make_mesh
from pycsou_tpu.parallel.spatial import (
    conv_transfer,
    sharded_conv2d,
    sharded_conv2d_adjoint,
    sharded_conv2d_gram,
    sharded_grad2d,
    sharded_grad2d_adjoint,
    sharded_sepgram_rank1,
)

__all__ = ["DistributedTVDeconv2D", "BatchedDistributedTVDeconv2D", "Spatial2DTVDeconv2D"]


def _split(c):
    return (jnp.real(c), jnp.imag(c))


def _join(pair):
    return jax.lax.complex(pair[0], pair[1])


def _pick_sweepsp_rows(h_local: int, W: int) -> int:
    """Largest feasible sweepsp tile rows (plain (r, W) f32 tiles under the
    ~0.8MB Mosaic budget, dividing the local block), or 0 — the ONE source
    of the sweepsp eligibility gates (conv and mask modes share it)."""
    for r in (32, 16, 8):
        if h_local % r == 0 and h_local >= r and (r + 8) * W * 4 <= 820_000:
            return r
    return 0


def _pallas_on(use_pallas) -> bool:
    """Shared engine-enable predicate (interpret / forced / auto-on-TPU)."""
    import jax

    return (
        use_pallas == "interpret"
        or bool(use_pallas is True)
        or (use_pallas == "auto" and jax.default_backend() not in ("cpu",))
    )


class DistributedTVDeconv2D(IterativeSolver):
    r"""Condat-Vu PDS for ``min_x ||h * x - y||^2 + lam ||grad x||_{2,1}
    (+ nonnegativity)`` on an image row-sharded over a device mesh.

    Mathematics identical to ``opt.proxalgs.PrimalDualSplitting`` with
    F = SquaredL2Loss o Convolve2D, H = lam * L21Norm(axis=0), K = Gradient,
    G = NonNegativeOrthant (reference update rule proxalgs.py:343-355);
    auto step sizes from the same formulas (proxalgs.py:246-316).

    Example — deconvolve on whatever mesh the host exposes::

        >>> import jax, jax.numpy as jnp
        >>> from pycsou_tpu.parallel import DistributedTVDeconv2D, make_mesh
        >>> H = 8 * jax.device_count()
        >>> h = jnp.ones((3, 3)) / 9.0
        >>> y = jnp.zeros((H, 16)).at[H // 2, 8].set(1.0)
        >>> solver = DistributedTVDeconv2D((H, 16), h, y, lam=0.01,
        ...                                max_iter=50, min_iter=5,
        ...                                accuracy_threshold=1e-4)
        >>> info = solver.solve()   # state stays sharded over the mesh
        >>> info["x"].shape == (H, 16) and info.n_iter > 0
        True
    """

    y: jax.Array = None
    filt: jax.Array = None
    atb: jax.Array = None
    # diagonal-Gram (sampling-operator) mode: A^H A = diag(mask) — the
    # distributed realisation of opt/tv.py's inpainting/superres mode.
    # grad is elementwise per shard; the stencil rides the sweepsp engine.
    mask: jax.Array = None
    # rFFT transfer functions, split re/im (complex d2h is unimplemented on
    # some TPU runtimes and split-real keeps closure-jit usable)
    _h_hat_fwd: tuple = None
    _h_hat_adj: tuple = None
    _acorr_hat: tuple = None
    # rank-1 banded Gram plans (no FFT in the hot loop when set): arrays
    # (b0, b1, E_top, E_bot) per axis from kernels.band.make_gram_band; the
    # static ints (lead, L) live in _band_meta so slice bounds stay static
    _band_rows: tuple = None
    _band_cols: tuple = None
    # channel-conv form of the LOCAL column-Gram pass (lane axis unsharded;
    # kernels.band.make_chanconv) — no pad copy, MXU work ~ CHAN_TILE/128
    _band_cols_chan: jax.Array = None
    lam: float = static_field(default=0.1)
    tau: float = static_field(default=0.1)
    sigma: float = static_field(default=0.1)
    rho: float = static_field(default=0.9)
    beta: float = static_field(default=2.0)
    nonneg: bool = static_field(default=True)
    # isotropic (L21) vs anisotropic (L1 o Gradient) TV: the engines only
    # differ in the per-pixel dual projection (kernels/tv.py _dual_prox)
    iso: bool = static_field(default=True)
    mesh: Mesh = static_field(default=None)
    axis_name: str = static_field(default="sp")
    shape: Tuple[int, int] = static_field(default=None)
    _use_gram: bool = static_field(default=True)
    _use_band: bool = static_field(default=False)
    _band_meta: tuple = static_field(default=None)  # (lead_r, L_r, lead_c, L_c)
    # per-shard fused Pallas engines (VERDICT r2 task 1): "megasp" = both
    # Gram directions fused in-kernel per shard (rank-1 PSF), "megarsp" =
    # forward+adjoint sweeps fused into the stencil per shard (any rank <= 4
    # PSF, kernels/tvr.py), "sweepsp" = sharded Gram + fused stencil sweep
    # (any PSF), "" = pure-XLA chain
    _sp_engine: str = static_field(default="")
    _sp_r: int = static_field(default=0)  # tile rows == halo rows
    _pallas_interpret: bool = static_field(default=False)
    # mega2 plan arrays (pytree children; None on the XLA path)
    _mega_B: jax.Array = None
    _mega_C: jax.Array = None
    _mega_F: jax.Array = None
    _atb_ext: jax.Array = None  # halo-extended A^H y (megasp/megarsp)
    # megar (rank <= 4) fused sweep plans (kernels/tvr.py)
    _megar_Bf: jax.Array = None
    _megar_Cf: jax.Array = None
    _megar_Ba: jax.Array = None
    _megar_Ca: jax.Array = None

    def __init__(
        self,
        shape: Tuple[int, int],
        filt,
        y,
        lam: float,
        nonneg: bool = True,
        mesh: Optional[Mesh] = None,
        axis_name: str = "sp",
        tau: Optional[float] = None,
        rho: float = 0.9,
        dtype=jnp.float32,
        max_iter: int = 500,
        min_iter: int = 10,
        accuracy_threshold: float = 1e-6,
        verbose: Optional[int] = None,
        use_pallas: str = "auto",
        isotropic: bool = True,
        mask=None,
    ):
        super().__init__(max_iter=max_iter, min_iter=min_iter, tol=accuracy_threshold, verbose=verbose)
        self.iso = bool(isotropic)
        H, W = shape
        self.mesh = mesh if mesh is not None else make_mesh(axis_names=(axis_name,))
        if len(self.mesh.axis_names) != 1:
            raise ValueError(
                "DistributedTVDeconv2D shards rows over a 1-D mesh; got axes "
                f"{self.mesh.axis_names} (use BatchedDistributedTVDeconv2D / "
                "Spatial2DTVDeconv2D for 2-D meshes)"
            )
        self.axis_name = self.mesh.axis_names[0]
        n_dev = self.mesh.devices.size
        if H % n_dev:
            raise ValueError(f"image height {H} must divide over {n_dev} devices")
        self.shape = (H, W)
        self.lam = float(lam)
        self.nonneg = bool(nonneg)
        self.rho = float(rho)

        if use_pallas is True and jax.default_backend() in ("cpu",):
            # a compiled (non-interpret) Mosaic kernel cannot lower on the
            # CPU backend — fail at construction with the fix named (ADVICE r4)
            raise ValueError(
                "use_pallas=True forces the compiled TPU engine but the "
                "active backend is CPU; pass use_pallas='interpret' for "
                "CPU meshes or leave the default 'auto'"
            )

        self.mask = None
        if mask is not None:
            # diagonal-Gram (sampling-operator) mode, the distributed twin
            # of opt/tv.py's inpainting mode: ``y`` is the back-projected
            # data A^H y, grad = 2 (mask * x - atb) elementwise per shard,
            # and the stencil rides the sweepsp fused engine.
            if filt is not None:
                raise ValueError(
                    "mask mode models a diagonal sampling forward operator; "
                    "pass filt=None"
                )
            m = jnp.asarray(mask, dtype)
            if m.shape != (H, W):
                raise ValueError(f"mask shape {m.shape} != image shape {(H, W)}")
            self.filt = None
            beta = 2.0 * float(jnp.max(m))
            L_K = math.sqrt(8.0)
            if tau is None:
                tau = (1.0 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
            self.tau = self.sigma = float(tau)
            self.beta = beta
            spec_x = NamedSharding(self.mesh, PartitionSpec(self.axis_name, None))
            self.y = jax.device_put(jnp.asarray(y, dtype), spec_x)
            self.atb = self.y
            self.mask = jax.device_put(m, spec_x)
            self._h_hat_fwd = self._h_hat_adj = self._acorr_hat = None
            self._use_gram = self._use_band = False
            self._band_rows = self._band_cols = None
            self._mega_B = self._mega_C = self._mega_F = self._atb_ext = None
            self._megar_Bf = self._megar_Cf = self._megar_Ba = self._megar_Ca = None
            self._sp_engine, self._sp_r = "", 0
            self._pallas_interpret = use_pallas == "interpret"
            if _pallas_on(use_pallas):
                r = _pick_sweepsp_rows(H // n_dev, W)
                if r:
                    self._sp_engine, self._sp_r = "sweepsp", r
            return

        self.filt = jnp.asarray(filt, dtype)

        # Lipschitz constants, closed form (no ARPACK):
        pad = (H + self.filt.shape[0] - 1, W + self.filt.shape[1] - 1)
        Hf = np.fft.fftn(np.asarray(self.filt, np.float64), s=pad, axes=(0, 1))
        L_A = float(np.max(np.abs(Hf)))
        beta = 2.0 * L_A**2
        L_K = math.sqrt(8.0)  # ||Gradient||_2 <= sqrt(sum_axis (2/step)^2)
        if tau is None:
            tau = (1.0 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
        self.tau = self.sigma = float(tau)
        self.beta = beta

        # precomputed transfer functions for the halo-extended local blocks
        h_local = H // n_dev
        m0 = self.filt.shape[0]
        # halo widths: forward conv needs (m0-1-m0//2) rows from the previous
        # neighbour and m0//2 from the next (adjoint: the complements).  A
        # ppermute halo only reaches ONE neighbour, so the local block must
        # hold the widest halo we ever send (ADVICE r1: validate explicitly
        # instead of failing with an FFT shape mismatch).
        min_rows = max(1, m0 // 2, m0 - 1 - m0 // 2)
        if h_local < min_rows:
            raise ValueError(
                f"local block of {h_local} rows is too short for a "
                f"{m0}-row kernel: need at least {min_rows} rows per device "
                f"(H={H} over {n_dev} devices; use fewer devices or a taller image)"
            )
        ext_shape = (h_local + m0 - 1, W)
        self._h_hat_fwd = _split(conv_transfer(self.filt, ext_shape))
        self._h_hat_adj = _split(conv_transfer(jnp.flip(self.filt, (0, 1)), ext_shape))
        # fused-Gram path: autocorrelation transfer for the (m-1)-halo block
        from pycsou_tpu.ops._gram import conv_full_direct

        acorr = conv_full_direct(self.filt, jnp.flip(self.filt, (0, 1)))
        self._acorr_hat = _split(conv_transfer(acorr, (h_local + 2 * (m0 - 1), W)))
        self._use_gram = h_local >= m0  # gram strips need block >= kernel

        # rank-1 banded Gram (kernels/band.py): same (m0-1)-row halo as the
        # FFT overlap-save path, but the local work per iteration is four
        # 128x128 MXU matmul passes instead of an FFT roundtrip (single-chip
        # measurement: 2.4ms banded vs 9.2ms FFT at 4096^2, docs/BENCH.md)
        m1 = self.filt.shape[1]
        self._band_rows = self._band_cols = None
        self._use_band = False
        from pycsou_tpu.ops.conv import lowrank_factors

        fac = lowrank_factors(np.asarray(self.filt))
        if (
            fac is not None
            and fac[0].shape[1] == 1
            and not jnp.issubdtype(self.filt.dtype, jnp.complexfloating)
            and H >= 3 * m0
            and W >= 3 * m1
            and h_local >= max(m0 - 1, 2 * m0 - 2)  # halo + local edge window
        ):
            from pycsou_tpu.kernels.band import make_gram_band

            us, vs = fac

            def _jn(gp):
                (b0, b1, lead), Et, Eb, L = gp
                Et = None if Et is None else jnp.asarray(Et)
                Eb = None if Eb is None else jnp.asarray(Eb)
                return (jnp.asarray(b0), jnp.asarray(b1), Et, Eb), lead, L

            self._band_rows, lead_r, L_r = _jn(make_gram_band(us[:, 0], H))
            self._band_cols, lead_c, L_c = _jn(make_gram_band(vs[:, 0], W))
            self._band_meta = (lead_r, L_r, lead_c, L_c)
            self._use_band = True
            from pycsou_tpu.kernels.band import CHAN_TILE, make_chanconv

            if W % CHAN_TILE == 0:
                v1 = np.asarray(vs[:, 0], np.float64)
                Kc = make_chanconv(np.convolve(v1, v1[::-1]), v1.size - 1)
                if Kc is not None:
                    self._band_cols_chan = jnp.asarray(Kc)

        spec_x = NamedSharding(self.mesh, PartitionSpec(self.axis_name, None))
        self.y = jax.device_put(jnp.asarray(y, dtype), spec_x)
        # A^H y, precomputed once with the same sharded adjoint
        ax = self.axis_name
        atb = jax.jit(
            jax.shard_map(
                lambda yb: sharded_conv2d_adjoint(yb, self.filt, ax, h_hat=_join(self._h_hat_adj)),
                mesh=self.mesh,
                in_specs=PartitionSpec(ax, None),
                out_specs=PartitionSpec(ax, None),
            )
        )(self.y)
        self.atb = atb

        # ---- per-shard fused Pallas engine selection (VERDICT r2 task 1):
        # the single-chip mega2/sweep kernels run INSIDE shard_map with
        # R-row (= one tile) ppermute halos and shard-aware global masks, so
        # multi-chip per-shard compute matches the single-chip flagship.
        self._mega_B = self._mega_C = self._mega_F = self._atb_ext = None
        self._megar_Bf = self._megar_Cf = self._megar_Ba = self._megar_Ca = None
        self._sp_engine, self._sp_r = "", 0
        self._pallas_interpret = use_pallas == "interpret"
        # (the use_pallas=True-on-CPU guard already ran before mode dispatch)
        if _pallas_on(use_pallas) and not jnp.issubdtype(self.filt.dtype, jnp.complexfloating):
            from pycsou_tpu.kernels.tv import MEGA_HG, make_mega2_lane_plan, make_mega_band

            mega_r = sweep_r = 0
            if self._use_band and W % 128 == 0 and W >= 384:
                u1 = np.asarray(fac[0][:, 0], np.float64)
                v1 = np.asarray(fac[1][:, 0], np.float64)
                K1r, K1c = u1.size - 1, v1.size - 1
                if K1r <= MEGA_HG - 1 and 2 * K1c <= 128:
                    for r in (32, 16):
                        if h_local % r == 0 and h_local >= r and (r + 8) * W * 4 <= 820_000:
                            mega_r = r
                            break
            if mega_r:
                self._sp_engine, self._sp_r = "megasp", mega_r
                self._mega_B = jnp.asarray(make_mega_band(np.convolve(u1, u1[::-1]), r=mega_r))
                Cm, Fm = make_mega2_lane_plan(v1, W)
                self._mega_C = jnp.asarray(Cm)
                self._mega_F = jnp.asarray(Fm)
                self._atb_ext = self._make_ext(self.atb, mega_r)
            else:
                # megarsp: any rank <= 4 PSF rides the fused
                # forward+adjoint-sweep stencil per shard (kernels/tvr.py);
                # needs R = 32 >= 2*HG so one R-row halo tile covers the
                # two-stage pipeline's compute reach into a neighbour
                megar_plan = None
                if fac is not None and h_local % 32 == 0:
                    from pycsou_tpu.kernels.tvr import make_megar_plan

                    megar_plan = make_megar_plan(fac[0], fac[1], (h_local + 64, W))
                    if megar_plan is not None and megar_plan[4] != 32:
                        megar_plan = None
                if megar_plan is not None:
                    self._sp_engine, self._sp_r = "megarsp", 32
                    (self._megar_Bf, self._megar_Cf, self._megar_Ba,
                     self._megar_Ca, _) = megar_plan
                    self._atb_ext = self._make_ext(self.atb, 32)
                else:
                    sweep_r = _pick_sweepsp_rows(h_local, W)
                    if sweep_r:
                        self._sp_engine, self._sp_r = "sweepsp", sweep_r

    # -- halo-extension helpers (per-shard Pallas engines) -------------------
    def _ext_local(self, a, R: int):
        """(h_loc + 2R, W) halo-extended local block: R rows from the
        previous device on top, R from the next below; ``ppermute`` zeros at
        the global edges — exactly the Gram's zero boundary condition."""
        top, bot = self._halos_local(a, R)
        return jnp.concatenate([top, a, bot], axis=0)

    def _make_ext(self, arr, R: int):
        """Halo-extend a row-sharded GLOBAL array once (init-time; e.g. the
        iteration-constant A^H y)."""
        P = PartitionSpec
        ax = self.axis_name
        return jax.jit(
            jax.shard_map(
                lambda a: self._ext_local(a, R),
                mesh=self.mesh,
                in_specs=P(ax, None),
                out_specs=P(ax, None),
                check_vma=False,
            )
        )(arr)

    def _corr_local(self, x_loc):
        """x2-scaled row-Gram edge corrections from the device's own local
        edge rows (only devices holding the global first/last tiles ever
        have theirs APPLIED — the kernel's global-row flags gate it)."""
        from pycsou_tpu.kernels.band import gram_band_cols, gram_chanconv_cols
        from pycsou_tpu.kernels.tv import MEGA_HG

        lead_r, L_r, lead_c, L_c = self._band_meta
        cb0, cb1, cEt, cEb = self._band_cols
        rEt, rEb = self._band_rows[2], self._band_rows[3]
        W = x_loc.shape[1]
        if rEt is None:  # K == 1 row factor: no 'same'-crop corrections
            return jnp.zeros((2 * MEGA_HG, W), x_loc.dtype)
        Ec = None if cEt is None else (cEt, cEb)
        if self._band_cols_chan is not None:
            w_top = gram_chanconv_cols(x_loc[:L_r], self._band_cols_chan, Ec, L_c)
            w_bot = gram_chanconv_cols(x_loc[-L_r:], self._band_cols_chan, Ec, L_c)
        else:
            gp = ((cb0, cb1, lead_c), cEt, cEb, L_c)
            w_top = gram_band_cols(x_loc[:L_r], gp)
            w_bot = gram_band_cols(x_loc[-L_r:], gp)
        prec = jax.lax.Precision.HIGHEST
        K1 = rEt.shape[0]  # rEt is not None past the early return above
        top = 2.0 * jnp.matmul(rEt, w_top, precision=prec)
        bot = 2.0 * jnp.matmul(rEb, w_bot, precision=prec)
        return (
            jnp.zeros((2 * MEGA_HG, W), x_loc.dtype)
            .at[:K1].set(top)
            .at[2 * MEGA_HG - K1 :].set(bot)
        )

    # legacy attribute API (round-1 callers)
    @property
    def x0(self):
        """Initial (zero) primal iterand, sharded over the mesh."""
        return self.initial_state()["x"]

    @property
    def z0(self):
        """Initial (zero) stacked dual iterand, sharded over the mesh."""
        init = self.initial_state()
        if "z" in init:
            return init["z"]
        return jnp.stack([init["z0"], init["z1"]], axis=0)

    # -- sharding specs ------------------------------------------------------
    def _spec_x(self):
        return PartitionSpec(self.axis_name, None)

    def _spec_z(self):
        return PartitionSpec(None, self.axis_name, None)

    # -- one PDS iteration on LOCAL blocks (inside shard_map) --------------
    def _data_grad(self, x, atb_loc, y_loc=None):
        """Per-shard data-term gradient ``2 (A^H A x - A^H y)`` on the
        fastest available route — shared by the XLA-chain and sweepsp
        engines (band > fused FFT Gram > forward+adjoint)."""
        ax = self.axis_name
        filt = self.filt
        if self._use_band:
            # rank-1 banded Gram: four MXU matmul passes, NO FFT (fastest)
            lead_r, L_r, lead_c, L_c = self._band_meta
            rb0, rb1, rEt, rEb = self._band_rows
            cb0, cb1, cEt, cEb = self._band_cols
            g_rows = ((rb0, rb1, lead_r), rEt, rEb, L_r)
            g_cols = ((cb0, cb1, lead_c), cEt, cEb, L_c)
            return 2.0 * (
                sharded_sepgram_rank1(
                    x, g_rows, g_cols, ax, g_cols_chan=self._band_cols_chan
                )
                - atb_loc
            )
        if self._use_gram:
            # fused Gram: grad = 2 (A^H A x - A^H y); ONE local FFT roundtrip
            return 2.0 * (
                sharded_conv2d_gram(x, filt, ax, acorr_hat=_join(self._acorr_hat)) - atb_loc
            )
        # grad F = 2 A^H (A x - y): forward + adjoint (two roundtrips)
        r = sharded_conv2d(x, filt, ax, h_hat=_join(self._h_hat_fwd)) - y_loc
        return 2.0 * sharded_conv2d_adjoint(r, filt, ax, h_hat=_join(self._h_hat_adj))

    def _local_step(self, x, z, atb_loc, y_loc=None, m_loc=None):
        ax = self.axis_name
        tau, sigma, rho, lam = self.tau, self.sigma, self.rho, self.lam

        if m_loc is not None:  # diagonal (sampling) Gram: elementwise
            grad = 2.0 * (m_loc * x - atb_loc)
        else:
            grad = self._data_grad(x, atb_loc, y_loc)

        # x+ = prox_G(x - tau grad - tau K^H z)
        x_temp = x - tau * grad - tau * sharded_grad2d_adjoint(z, ax)
        if self.nonneg:
            x_temp = jnp.maximum(x_temp, 0.0)

        # z+ = prox_{sigma H*}(z + sigma K (2 x+ - x)):
        # (lam ||.||_{2,1})* = indicator of the per-pixel l2 ball of radius
        # lam -> fenchel prox is the per-pixel ball projection (fused, local)
        v = z + sigma * sharded_grad2d(2.0 * x_temp - x, ax)
        if self.iso:
            mag = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            z_temp = v * (lam / jnp.maximum(mag, lam))
        else:  # anisotropic: per-component box projection
            z_temp = jnp.clip(v, -lam, lam)

        x_new = rho * x_temp + (1 - rho) * x
        z_new = rho * z_temp + (1 - rho) * z
        return x_new, z_new

    # -- per-shard fused Pallas iterations (VERDICT r2 task 1) ---------------
    def _halos_local(self, a, R: int):
        """(top, bottom) (R, W) neighbour-row blocks: R rows from the
        previous device and R from the next (``ppermute`` zeros at the
        global edges — exactly the Gram's zero boundary condition)."""
        ax = self.axis_name
        n = self.mesh.devices.size
        top = jax.lax.ppermute(a[-R:], ax, [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(a[:R], ax, [(i + 1, i) for i in range(n - 1)])
        return top, bot

    def _local_step_megasp(self, x, z0, z1, atb_ext):
        """One full PDS iteration with BOTH Gram directions fused in-kernel
        per shard: R-row halo blocks of (x, z0, z1) ride ``ppermute`` and
        are stitched in-VMEM by the shard-aware mega2 kernel
        (kernels/tv.py tv_pds_mega2_shard_step) — no halo-extended iterate
        array ever touches HBM."""
        from pycsou_tpu.kernels.tv import tv_pds_mega2_shard_step

        ax = self.axis_name
        R = self._sp_r
        H, W = self.shape
        h_loc = H // self.mesh.devices.size
        off = (jax.lax.axis_index(ax) * h_loc - R).astype(jnp.int32).reshape(1)
        xt, xb = self._halos_local(x, R)
        z0t, z0b = self._halos_local(z0, R)
        z1t, z1b = self._halos_local(z1, R)
        corr = self._corr_local(x)
        xn, z0n, z1n, st = tv_pds_mega2_shard_step(
            x, z0, z1, atb_ext, (xt, xb, z0t, z0b, z1t, z1b), corr,
            self._mega_B, self._mega_C, self._mega_F,
            off, H_global=H, mega_r=R, interpret=self._pallas_interpret,
            tau=self.tau, sigma=self.sigma, rho=self.rho, lam=self.lam,
            nonneg=self.nonneg, iso=self.iso,
        )
        st = jax.lax.psum(st[0, :6], ax)
        return xn, z0n, z1n, st

    def _local_step_megarsp(self, x, z0, z1, atb_ext):
        """One full rank-r PDS iteration fully fused per shard: the
        forward+adjoint sweeps AND the stencil run in one kernel pass
        (kernels/tvr.py tv_pds_megar_shard_step) with R-row ppermute halo
        blocks stitched in-VMEM — the rank >= 2 analogue of
        :meth:`_local_step_megasp`."""
        from pycsou_tpu.kernels.tvr import tv_pds_megar_shard_step

        ax = self.axis_name
        R = self._sp_r
        H, W = self.shape
        h_loc = H // self.mesh.devices.size
        off = (jax.lax.axis_index(ax) * h_loc - R).astype(jnp.int32).reshape(1)
        xt, xb = self._halos_local(x, R)
        z0t, z0b = self._halos_local(z0, R)
        z1t, z1b = self._halos_local(z1, R)
        xn, z0n, z1n, st = tv_pds_megar_shard_step(
            x, z0, z1, atb_ext, (xt, xb, z0t, z0b, z1t, z1b),
            self._megar_Bf, self._megar_Cf, self._megar_Ba, self._megar_Ca,
            off, H_global=H, mega_r=R, interpret=self._pallas_interpret,
            tau=self.tau, sigma=self.sigma, rho=self.rho, lam=self.lam,
            nonneg=self.nonneg, iso=self.iso,
        )
        st = jax.lax.psum(st[0, :6], ax)
        return xn, z0n, z1n, st

    def _local_step_sweepsp(self, x, z0, z1, atb_loc, y_loc, m_loc=None):
        """Sharded Gram (banded / FFT / forward+adjoint — ANY mode, or the
        elementwise diagonal mask Gram) for the data-term gradient, then the
        fused stencil sweep kernel per shard with R-row halos of
        (x, g, z0, z1)."""
        from pycsou_tpu.kernels.tv import tv_pds_sweep_shard_step

        ax = self.axis_name
        R = self._sp_r
        H, W = self.shape
        h_loc = H // self.mesh.devices.size
        if m_loc is not None:  # diagonal (sampling) Gram: elementwise
            grad = 2.0 * (m_loc * x - atb_loc)
        else:
            grad = self._data_grad(x, atb_loc, y_loc)
        off = (jax.lax.axis_index(ax) * h_loc - R).astype(jnp.int32).reshape(1)
        xt, xb = self._halos_local(x, R)
        gt, gb = self._halos_local(grad, R)
        z0t, z0b = self._halos_local(z0, R)
        z1t, z1b = self._halos_local(z1, R)
        xn, z0n, z1n, st = tv_pds_sweep_shard_step(
            x, grad, z0, z1, (xt, xb, gt, gb, z0t, z0b, z1t, z1b), off,
            H_global=H, R=R, interpret=self._pallas_interpret,
            tau=self.tau, sigma=self.sigma, rho=self.rho, lam=self.lam,
            nonneg=self.nonneg, iso=self.iso,
        )
        st = jax.lax.psum(st[0, :6], ax)
        return xn, z0n, z1n, st

    # -- IterativeSolver protocol -------------------------------------------
    def initial_state(self):
        H, W = self.shape
        x0 = jax.device_put(jnp.zeros((H, W), jnp.float32), NamedSharding(self.mesh, self._spec_x()))
        if self._sp_engine:
            # duals as SEPARATE arrays (kernel I/O efficiency, see opt/tv.py)
            # + the kernel-epilogue metric partial sums
            zs = NamedSharding(self.mesh, self._spec_x())
            return {
                "x": x0,
                "z0": jax.device_put(jnp.zeros((H, W), jnp.float32), zs),
                "z1": jax.device_put(jnp.zeros((H, W), jnp.float32), zs),
                "_stats": jnp.zeros((6,), jnp.float32),
            }
        z0 = jax.device_put(jnp.zeros((2, H, W), jnp.float32), NamedSharding(self.mesh, self._spec_z()))
        return {"x": x0, "z": z0}

    def step(self, state):
        P = PartitionSpec
        ax = self.axis_name
        if self._sp_engine in ("megasp", "megarsp"):
            local = (
                self._local_step_megasp
                if self._sp_engine == "megasp"
                else self._local_step_megarsp
            )
            smapped = jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(self._spec_x(),) * 3 + (self._spec_x(),),
                out_specs=(self._spec_x(),) * 3 + (P(),),
                check_vma=False,
            )
            x, z0, z1, st = smapped(state["x"], state["z0"], state["z1"], self._atb_ext)
            return {"x": x, "z0": z0, "z1": z1, "_stats": st}
        if self._sp_engine == "sweepsp" and self.mask is not None:
            smapped = jax.shard_map(
                lambda x, z0, z1, m, t: self._local_step_sweepsp(
                    x, z0, z1, t, None, m_loc=m
                ),
                mesh=self.mesh,
                in_specs=(self._spec_x(),) * 5,
                out_specs=(self._spec_x(),) * 3 + (P(),),
                check_vma=False,
            )
            x, z0, z1, st = smapped(
                state["x"], state["z0"], state["z1"], self.mask, self.atb
            )
            return {"x": x, "z0": z0, "z1": z1, "_stats": st}
        if self._sp_engine == "sweepsp":
            third = self.atb if (self._use_band or self._use_gram) else self.y
            smapped = jax.shard_map(
                lambda x, z0, z1, t: self._local_step_sweepsp(
                    x, z0, z1,
                    t if (self._use_band or self._use_gram) else None,
                    None if (self._use_band or self._use_gram) else t,
                ),
                mesh=self.mesh,
                in_specs=(self._spec_x(),) * 4,
                out_specs=(self._spec_x(),) * 3 + (P(),),
                check_vma=False,
            )
            x, z0, z1, st = smapped(state["x"], state["z0"], state["z1"], third)
            return {"x": x, "z0": z0, "z1": z1, "_stats": st}
        if self.mask is not None:  # diagonal-Gram XLA chain
            smapped = jax.shard_map(
                lambda x, z, m, t: self._local_step(x, z, t, m_loc=m),
                mesh=self.mesh,
                in_specs=(self._spec_x(), self._spec_z(), self._spec_x(), self._spec_x()),
                out_specs=(self._spec_x(), self._spec_z()),
            )
            x, z = smapped(state["x"], state["z"], self.mask, self.atb)
            return {"x": x, "z": z}
        # same predicate _data_grad keys on: atb is consumed iff the band
        # OR fused-Gram route runs (today band implies gram-eligible, but
        # the dispatch must not rely on that coupling)
        if self._use_band or self._use_gram:
            smapped = jax.shard_map(
                lambda x, z, atb: self._local_step(x, z, atb),
                mesh=self.mesh,
                in_specs=(self._spec_x(), self._spec_z(), self._spec_x()),
                out_specs=(self._spec_x(), self._spec_z()),
            )
            x, z = smapped(state["x"], state["z"], self.atb)
        else:
            smapped = jax.shard_map(
                lambda x, z, y: self._local_step(x, z, None, y_loc=y),
                mesh=self.mesh,
                in_specs=(self._spec_x(), self._spec_z(), self._spec_x()),
                out_specs=(self._spec_x(), self._spec_z()),
            )
            x, z = smapped(state["x"], state["z"], self.y)
        return {"x": x, "z": z}

    # -- kernel-epilogue metrics (zero extra HBM passes + one tiny psum) -----
    def metric(self, old, new):
        if self._sp_engine and "_stats" in new:
            from pycsou_tpu.opt.tv import TVDeconvolution

            st = new["_stats"]
            return TVDeconvolution._rel_from_stats(st[0], st[1])
        return super().metric(old, new)

    def metrics(self, old, new):
        if self._sp_engine and "_stats" in new:
            from pycsou_tpu.opt.tv import TVDeconvolution

            st = new["_stats"]
            return {
                "x": TVDeconvolution._rel_from_stats(st[0], st[1]),
                "z0": TVDeconvolution._rel_from_stats(st[2], st[3]),
                "z1": TVDeconvolution._rel_from_stats(st[4], st[5]),
            }
        return super().metrics(old, new)

    # -- legacy fixed-iteration API (benchmarks) ------------------------------
    def run(self, n_iters: int, x=None, z=None):
        """Run ``n_iters`` fused iterations; returns (x, z) still sharded."""
        if self._sp_engine:
            state = dict(self.initial_state())
            if x is not None:
                state["x"] = x
            if z is not None:
                state["z0"], state["z1"] = z[0], z[1]
            state = self.run_fixed(n_iters, state=self._wrap_state(state))
            return state["x"], jnp.stack([state["z0"], state["z1"]], axis=0)
        state = None
        if x is not None or z is not None:
            init = self.initial_state()
            state = self._wrap_state(
                {
                    "x": x if x is not None else init["x"],
                    "z": z if z is not None else init["z"],
                }
            )
        state = self.run_fixed(n_iters, state=state)
        return state["x"], state["z"]

    def objective(self, x) -> jax.Array:
        """Global objective (pure/jittable; GSPMD reduces over the mesh).
        Mask mode scores observed pixels only (see opt/tv.py objective)."""
        from pycsou_tpu.ops.diff import fdiff_forward

        g0 = fdiff_forward(x, 0)
        g1 = fdiff_forward(x, 1)
        if self.iso:
            tv = jnp.sum(jnp.sqrt(g0 * g0 + g1 * g1))
        else:
            tv = jnp.sum(jnp.abs(g0)) + jnp.sum(jnp.abs(g1))
        if self.mask is not None:
            yc = self.atb / jnp.maximum(self.mask, 1.0)
            return jnp.sum(self.mask * (x - yc) ** 2) + self.lam * tv
        ax = self.axis_name
        P = PartitionSpec
        smapped = jax.shard_map(
            lambda xb: sharded_conv2d(xb, self.filt, ax, h_hat=_join(self._h_hat_fwd)),
            mesh=self.mesh,
            in_specs=P(ax, None),
            out_specs=P(ax, None),
        )
        r = smapped(x) - self.y
        return jnp.sum(r * r) + self.lam * tv


class BatchedDistributedTVDeconv2D(IterativeSolver):
    r"""Batched TV deconvolution on a TRUE 2-D device mesh ``(dp, sp)``:
    a batch of B images is data-parallel over ``dp`` while each image is
    row-sharded over ``sp`` — the dp x sp composition the pod-scale
    deployment uses (scenario batches x spatial decomposition).

    Per iteration each device touches only its (B/dp, H/sp, W) brick; spatial
    halos ride ``ppermute`` along ``sp`` (vmapped over the local batch) and
    there is NO collective along ``dp`` at all (problems are independent).
    First-class ``IterativeSolver``: metric/history/checkpoint included.
    """

    y: jax.Array = None
    atb: jax.Array = None
    _inner: DistributedTVDeconv2D = None
    mesh: Mesh = static_field(default=None)
    dp: str = static_field(default="dp")
    sp: str = static_field(default="sp")
    batch: int = static_field(default=1)
    shape: Tuple[int, int] = static_field(default=None)
    tau: float = static_field(default=0.1)
    sigma: float = static_field(default=0.1)
    rho: float = static_field(default=0.9)

    def __init__(
        self,
        shape: Tuple[int, int],
        filt,
        y,
        lam: float,
        nonneg: bool = True,
        mesh: Optional[Mesh] = None,
        tau: Optional[float] = None,
        rho: float = 0.9,
        dtype=jnp.float32,
        max_iter: int = 500,
        min_iter: int = 10,
        accuracy_threshold: float = 1e-6,
        verbose: Optional[int] = None,
        isotropic: bool = True,
    ):
        super().__init__(max_iter=max_iter, min_iter=min_iter, tol=accuracy_threshold, verbose=verbose)
        y = jnp.asarray(y, dtype)
        if y.ndim != 3:
            raise ValueError("y must be (batch, H, W)")
        B = y.shape[0]
        self.mesh = mesh if mesh is not None else make_mesh((1, jax.device_count()), ("dp", "sp"))
        if len(self.mesh.axis_names) != 2:
            raise ValueError("mesh must be 2-D (dp, sp)")
        self.dp, self.sp = self.mesh.axis_names
        n_dp, n_sp = self.mesh.devices.shape
        H, W = shape
        if B % n_dp or H % n_sp:
            raise ValueError(f"batch {B} must divide over {n_dp} and height {H} over {n_sp}")
        self.batch = B
        self.shape = (H, W)

        # one per-image solver supplies the step math and precomputed
        # transfers; build it on a 1-D view of the sp axis
        sp_mesh = Mesh(self.mesh.devices.reshape(-1)[:n_sp], (self.sp,))
        inner = DistributedTVDeconv2D(
            shape,
            filt,
            jnp.zeros(shape, dtype),
            lam,
            nonneg=nonneg,
            # Batched only calls inner._local_step (the XLA chain); skip the
            # per-shard Pallas engine setup (plans, halo-extended atb) it
            # would never use
            use_pallas=False,
            mesh=sp_mesh,
            tau=tau,
            rho=rho,
            dtype=dtype,
            max_iter=max_iter,
            isotropic=isotropic,
        )
        self._inner = inner
        self.tau, self.sigma, self.rho = inner.tau, inner.sigma, inner.rho

        P = PartitionSpec
        self.y = jax.device_put(y, NamedSharding(self.mesh, P(self.dp, self.sp, None)))
        # per-image A^H y (vmapped sharded adjoint over the local batch)
        smapped = jax.shard_map(
            lambda yb: jax.vmap(
                lambda img: sharded_conv2d_adjoint(
                    img, inner.filt, self.sp, h_hat=_join(inner._h_hat_adj)
                )
            )(yb),
            mesh=self.mesh,
            in_specs=P(self.dp, self.sp, None),
            out_specs=P(self.dp, self.sp, None),
        )
        self.atb = jax.jit(smapped)(self.y)

    def initial_state(self):
        P = PartitionSpec
        B, (H, W) = self.batch, self.shape
        x0 = jax.device_put(
            jnp.zeros((B, H, W), jnp.float32), NamedSharding(self.mesh, P(self.dp, self.sp, None))
        )
        z0 = jax.device_put(
            jnp.zeros((B, 2, H, W), jnp.float32),
            NamedSharding(self.mesh, P(self.dp, None, self.sp, None)),
        )
        return {"x": x0, "z": z0}

    def step(self, state):
        P = PartitionSpec
        inner = self._inner

        if inner._use_gram:
            def local(x, z, atb):
                return jax.vmap(lambda xi, zi, ai: inner._local_step(xi, zi, ai))(x, z, atb)
            third = self.atb
        else:
            def local(x, z, y):
                return jax.vmap(lambda xi, zi, yi: inner._local_step(xi, zi, None, y_loc=yi))(x, z, y)
            third = self.y

        # the inner solver's halo exchanges name the sp axis; rebind by
        # constructing the shard_map over the 2-D mesh with the same name
        inner_ax = inner.axis_name
        assert inner_ax == self.sp
        smapped = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(self.dp, self.sp, None), P(self.dp, None, self.sp, None), P(self.dp, self.sp, None)),
            out_specs=(P(self.dp, self.sp, None), P(self.dp, None, self.sp, None)),
        )
        x, z = smapped(state["x"], state["z"], third)
        return {"x": x, "z": z}

    def run(self, n_iters: int, x=None, z=None):
        """Run ``n_iters`` fused iterations on the 2-D mesh."""
        state = None
        if x is not None or z is not None:
            init = self.initial_state()
            state = self._wrap_state(
                {"x": x if x is not None else init["x"], "z": z if z is not None else init["z"]}
            )
        state = self.run_fixed(n_iters, state=state)
        return state["x"], state["z"]


class Spatial2DTVDeconv2D(IterativeSolver):
    r"""TV deconvolution with ONE image sharded over a TRUE 2-D spatial mesh
    ``(sp0, sp1)``: rows over ``sp0``, columns over ``sp1``.

    For very wide meshes a 1-D row split leaves blocks thinner than the
    kernel halo; the 2-D split keeps blocks square-ish so halo traffic per
    device scales as the block *perimeter*.  Two engines (VERDICT r3 task 2):

    * ``megar2d`` (default on TPU, any rank <= 4 PSF): the single-chip fused
      forward-sweep + adjoint-sweep + stencil kernel (kernels/tvr.py) runs
      per shard with 128-lane column halos and 32-row row halos stitched
      in-VMEM — the sp0 x sp1 analogue of the 1-D mesh's megarsp engine;
    * pure-XLA banded chain (rank-1 PSF only): per-axis banded MXU Gram
      passes with (K-1)-wide ``ppermute`` halos along BOTH mesh axes.

    Zero FFTs, zero global collectives inside an iteration either way.
    Same mathematics as :class:`DistributedTVDeconv2D` (Condat-Vu PDS,
    reference update rule /root/reference/pycsou/opt/proxalgs.py:343-355);
    first-class ``IterativeSolver`` (stopping metric, history, checkpoint).
    """

    y: jax.Array = None
    atb: jax.Array = None
    # diagonal-Gram (sampling) mode on the 2-D mesh: grad is elementwise
    # per shard; only the gradient-stencil halos ride ppermute
    mask: jax.Array = None
    _band_rows: tuple = None
    _band_cols: tuple = None
    lam: float = static_field(default=0.1)
    tau: float = static_field(default=0.1)
    sigma: float = static_field(default=0.1)
    rho: float = static_field(default=0.9)
    beta: float = static_field(default=2.0)
    nonneg: bool = static_field(default=True)
    iso: bool = static_field(default=True)
    mesh: Mesh = static_field(default=None)
    ax_r: str = static_field(default="sp0")
    ax_c: str = static_field(default="sp1")
    shape: Tuple[int, int] = static_field(default=None)
    _band_meta: tuple = static_field(default=None)  # (lead_r, L_r, lead_c, L_c)
    _y2: float = static_field(default=0.0)
    rank: int = static_field(default=1)
    # per-shard fused engine ("megar2d") or "" = pure-XLA banded chain
    _sp_engine: str = static_field(default="")
    _sp_r: int = static_field(default=0)
    _pallas_interpret: bool = static_field(default=False)
    _megar_Bf: jax.Array = None
    _megar_Cf: jax.Array = None
    _megar_Ba: jax.Array = None
    _megar_Ca: jax.Array = None
    _atb_ext: jax.Array = None  # fully halo-extended A^H y (megar2d)
    # per-rank forward/adjoint band plans (atb init + rank >= 2 objective)
    _rank_plans: tuple = static_field(default=None)

    def __init__(
        self,
        shape: Tuple[int, int],
        filt,
        y,
        lam: float,
        nonneg: bool = True,
        mesh: Optional[Mesh] = None,
        tau: Optional[float] = None,
        rho: float = 0.9,
        dtype=jnp.float32,
        max_iter: int = 500,
        min_iter: int = 10,
        accuracy_threshold: float = 1e-6,
        verbose: Optional[int] = None,
        use_pallas: str = "auto",
        isotropic: bool = True,
        mask=None,
    ):
        super().__init__(max_iter=max_iter, min_iter=min_iter, tol=accuracy_threshold, verbose=verbose)
        self.iso = bool(isotropic)
        H, W = shape
        if mesh is None:
            n = jax.device_count()
            n0 = int(math.isqrt(n))
            while n % n0:
                n0 -= 1
            mesh = make_mesh((n0, n // n0), ("sp0", "sp1"))
        if len(mesh.axis_names) != 2:
            raise ValueError("Spatial2DTVDeconv2D needs a 2-D (rows, cols) mesh")
        self.mesh = mesh
        self.ax_r, self.ax_c = mesh.axis_names
        n0, n1 = mesh.devices.shape
        if H % n0 or W % n1:
            raise ValueError(f"image {H}x{W} must divide over the {n0}x{n1} mesh")
        self.shape = (H, W)
        self.lam = float(lam)
        self.nonneg = bool(nonneg)
        self.rho = float(rho)

        self.mask = None
        if mask is not None:
            # diagonal-Gram (sampling) mode — the 2-D-mesh twin of
            # DistributedTVDeconv2D's mask mode.  grad = 2(mask*x - atb) is
            # elementwise per shard (no Gram halos at all); the gradient
            # stencil's 1-pixel halos ride the existing sharded_grad2d_2d.
            # XLA chain only (no 2-D-mesh pallas mask engine yet).
            if filt is not None:
                raise ValueError(
                    "mask mode models a diagonal sampling forward operator; "
                    "pass filt=None"
                )
            m = jnp.asarray(mask, dtype)
            if m.shape != (H, W):
                raise ValueError(f"mask shape {m.shape} != image shape {(H, W)}")
            beta = 2.0 * float(jnp.max(m))
            L_K = math.sqrt(8.0)
            if tau is None:
                tau = (1.0 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
            self.tau = self.sigma = float(tau)
            self.beta = beta
            spec_x = NamedSharding(self.mesh, self._spec_x())
            self.y = jax.device_put(jnp.asarray(y, dtype), spec_x)
            self.atb = self.y
            self.mask = jax.device_put(m, spec_x)
            self.rank = 0
            self._band_rows = self._band_cols = None
            self._rank_plans = None
            self._y2 = 0.0
            self._sp_engine, self._sp_r = "", 0
            self._pallas_interpret = use_pallas == "interpret"
            self._megar_Bf = self._megar_Cf = self._megar_Ba = self._megar_Ca = None
            self._atb_ext = None
            return

        filt = jnp.asarray(filt, dtype)
        m0, m1 = filt.shape
        from pycsou_tpu.ops.conv import lowrank_factors

        fac = lowrank_factors(np.asarray(filt))
        if fac is None:
            raise ValueError(
                "Spatial2DTVDeconv2D requires a rank <= 4 (sum-separable) "
                "PSF; use DistributedTVDeconv2D (1-D row sharding, FFT Gram) "
                "otherwise"
            )
        rank = fac[0].shape[1]
        self.rank = rank
        h_loc, w_loc = H // n0, W // n1
        need_r, need_c = max(m0 - 1, 2 * m0 - 2), max(m1 - 1, 2 * m1 - 2)
        if h_loc < need_r or w_loc < need_c or H < 3 * m0 or W < 3 * m1:
            raise ValueError(
                f"local blocks {h_loc}x{w_loc} too small for a {m0}x{m1} kernel: "
                f"need >= {need_r} rows and >= {need_c} cols per device"
            )

        # auto step sizes (exact reference formulas, proxalgs.py:246-316)
        pad = (H + m0 - 1, W + m1 - 1)
        Hf = np.fft.fftn(np.asarray(filt, np.float64), s=pad, axes=(0, 1))
        L_A = float(np.max(np.abs(Hf)))
        beta = 2.0 * L_A**2
        L_K = math.sqrt(8.0)
        if tau is None:
            tau = (1.0 / L_K**2) * (-beta / 4 + math.sqrt(beta**2 / 16 + L_K**2))
        self.tau = self.sigma = float(tau)
        self.beta = beta

        from pycsou_tpu.kernels.band import make_gram_band

        us, vs = fac

        def _jn(gp):
            (b0, b1, lead), Et, Eb, L = gp
            Et = None if Et is None else jnp.asarray(Et)
            Eb = None if Eb is None else jnp.asarray(Eb)
            return (jnp.asarray(b0), jnp.asarray(b1), Et, Eb), lead, L

        self._band_rows = self._band_cols = None
        if rank == 1:
            self._band_rows, lead_r, L_r = _jn(make_gram_band(us[:, 0], H))
            self._band_cols, lead_c, L_c = _jn(make_gram_band(vs[:, 0], W))
            self._band_meta = (lead_r, L_r, lead_c, L_c)

        # ---- per-shard fused megar2d engine (VERDICT r3 task 2) ----------
        self._megar_Bf = self._megar_Cf = self._megar_Ba = self._megar_Ca = None
        self._atb_ext = None
        self._sp_engine, self._sp_r = "", 0
        self._pallas_interpret = use_pallas == "interpret"
        if use_pallas is True and jax.default_backend() in ("cpu",):
            # a compiled (non-interpret) Mosaic kernel cannot lower on the
            # CPU backend — fail at construction with the fix named instead
            # of at compile time with a Mosaic internal error (ADVICE r4)
            raise ValueError(
                "use_pallas=True forces the compiled TPU engine but the "
                "active backend is CPU; pass use_pallas='interpret' for "
                "CPU meshes or leave the default 'auto'"
            )
        pallas_on = (
            use_pallas == "interpret"
            or bool(use_pallas is True)
            or (use_pallas == "auto" and jax.default_backend() not in ("cpu",))
        )
        if (
            pallas_on
            and not jnp.issubdtype(filt.dtype, jnp.complexfloating)
            and h_loc % 32 == 0
            and w_loc % 128 == 0
            and m1 <= 128  # the 128-lane halo must cover one iteration's
            # column reach (gram m1 - 1 plus the stencil's 1)
            and (n1 > 1 or w_loc >= 384)  # n1 == 1 runs the un-extended
            # 1-D kernel path, whose width gate is the raw w_loc
        ):
            from pycsou_tpu.kernels.tvr import make_megar_plan

            w_ext = w_loc + (256 if n1 > 1 else 0)
            plan = make_megar_plan(fac[0], fac[1], (h_loc + 64, max(w_ext, 384)))
            if plan is not None and plan[4] == 32:
                self._sp_engine, self._sp_r = "megar2d", 32
                (self._megar_Bf, self._megar_Cf, self._megar_Ba,
                 self._megar_Ca, _) = plan
        if rank > 1 and not self._sp_engine:
            raise ValueError(
                f"rank-{rank} PSF on the 2-D mesh needs the fused megar2d "
                "engine (TPU, h_loc % 32 == 0, w_loc % 128 == 0, taps within "
                "the sweep gates); this configuration does not qualify — use "
                "DistributedTVDeconv2D (1-D row sharding) instead"
            )

        spec_x = NamedSharding(self.mesh, PartitionSpec(self.ax_r, self.ax_c))
        self.y = jax.device_put(jnp.asarray(y, dtype), spec_x)
        # A^H y once at init, with the SAME sharded banded halo passes the
        # iteration uses — no step ever materialises a full image on one
        # device (VERDICT r2 task 8).  Adjoint of the separable 'same' conv =
        # per-axis banded Toeplitz transposes: flipped taps at the
        # complementary offset, exactly (no edge corrections); rank >= 2
        # sums the per-rank separable adjoints.
        from pycsou_tpu.kernels.band import make_band_blocks
        from pycsou_tpu.parallel.spatial import sharded_sepconv2d_adjoint_2d

        rank_plans = []
        for i in range(rank):
            ui = np.asarray(us[:, i], np.float64)
            vi = np.asarray(vs[:, i], np.float64)
            # forward plans feed only the rank >= 2 Gram composition
            # (_gram_local); rank-1 rides the banded _band_rows path
            fwd = (
                (
                    (make_band_blocks(ui, m0 // 2), m0 - 1),
                    (make_band_blocks(vi, m1 // 2), m1 - 1),
                )
                if rank > 1
                else None
            )
            adj = (
                (make_band_blocks(ui[::-1], m0 - 1 - m0 // 2), m0 - 1),
                (make_band_blocks(vi[::-1], m1 - 1 - m1 // 2), m1 - 1),
            )
            rank_plans.append((fwd, adj))
        self._rank_plans = tuple(rank_plans)
        P = PartitionSpec

        def _atb_local(yb):
            out = None
            for (_, (rp, cp)) in self._rank_plans:
                g = sharded_sepconv2d_adjoint_2d(yb, rp, cp, self.ax_r, self.ax_c)
                out = g if out is None else out + g
            return out

        atb_fn = jax.jit(
            jax.shard_map(
                _atb_local,
                mesh=self.mesh,
                in_specs=P(self.ax_r, self.ax_c),
                out_specs=P(self.ax_r, self.ax_c),
            )
        )
        self.atb = atb_fn(self.y)
        self._y2 = float(jnp.vdot(self.y, self.y))
        if self._sp_engine:
            R = self._sp_r
            if n1 == 1:
                # row-halo extension only (the 1-D kernel path)
                local_ext = lambda a: self._row_ext_local(a, R)
            else:
                local_ext = lambda a: self._row_ext_local(self._lane_ext_local(a), R)
            ext_fn = jax.jit(
                jax.shard_map(
                    local_ext,
                    mesh=self.mesh,
                    in_specs=P(self.ax_r, self.ax_c),
                    out_specs=P(self.ax_r, self.ax_c),
                    check_vma=False,
                )
            )
            self._atb_ext = ext_fn(self.atb)

    # -- halo helpers (megar2d engine; all called INSIDE shard_map) ----------
    def _lane_ext_local(self, a):
        """(h, w_loc + 256) lane-halo-extended local block: one 128-lane
        chunk from each column neighbour (``ppermute`` zeros at the global
        column edges = the sweeps' zero boundary)."""
        ac = self.ax_c
        n1 = self.mesh.devices.shape[1]
        left = jax.lax.ppermute(a[:, -128:], ac, [(i, i + 1) for i in range(n1 - 1)])
        right = jax.lax.ppermute(a[:, :128], ac, [(i + 1, i) for i in range(n1 - 1)])
        return jnp.concatenate([left, a, right], axis=1)

    def _row_halos_local(self, a, R: int):
        """(top, bottom) (R, w) row-halo blocks along ``ax_r``.  Taking them
        from LANE-EXTENDED blocks carries the diagonal corners: the row
        neighbour's lane halo came from ITS column neighbour — this
        device's diagonal."""
        ar = self.ax_r
        n0 = self.mesh.devices.shape[0]
        top = jax.lax.ppermute(a[-R:], ar, [(i, i + 1) for i in range(n0 - 1)])
        bot = jax.lax.ppermute(a[:R], ar, [(i + 1, i) for i in range(n0 - 1)])
        return top, bot

    def _row_ext_local(self, a, R: int):
        top, bot = self._row_halos_local(a, R)
        return jnp.concatenate([top, a, bot], axis=0)

    # -- sharding specs ------------------------------------------------------
    def _spec_x(self):
        return PartitionSpec(self.ax_r, self.ax_c)

    def _spec_z(self):
        return PartitionSpec(None, self.ax_r, self.ax_c)

    def _gplans(self):
        lead_r, L_r, lead_c, L_c = self._band_meta
        rb0, rb1, rEt, rEb = self._band_rows
        cb0, cb1, cEt, cEb = self._band_cols
        g_rows = ((rb0, rb1, lead_r), rEt, rEb, L_r)
        g_cols = ((cb0, cb1, lead_c), cEt, cEb, L_c)
        return g_rows, g_cols

    # -- per-shard fused megar2d iteration (inside shard_map) ----------------
    def _local_step_megar2d(self, x, z0, z1, atb_ext):
        """One full rank-r PDS iteration fused per shard on the 2-D mesh:
        lane halos ride ``ppermute`` along sp1, row halos (of the
        lane-extended blocks, corners included) along sp0, and the
        forward+adjoint sweeps + stencil run in one kernel pass
        (kernels/tvr.py tv_pds_megar_shard2d_step)."""
        from pycsou_tpu.kernels.tvr import (
            tv_pds_megar_shard_step,
            tv_pds_megar_shard2d_step,
        )

        ar, ac = self.ax_r, self.ax_c
        R = self._sp_r
        H, W = self.shape
        n0, n1 = self.mesh.devices.shape
        h_loc, w_loc = H // n0, W // n1
        if n1 == 1:
            # columns unsharded: lane halos would be all-zero machinery —
            # take the 1-D (row-halo-only) kernel path, which io-aliases
            # x/z0/z1 in place (the lane-ext path cannot: ext inputs and
            # core outputs differ in shape)
            xt, xb = self._row_halos_local(x, R)
            z0t, z0b = self._row_halos_local(z0, R)
            z1t, z1b = self._row_halos_local(z1, R)
            off = jnp.stack(
                [jax.lax.axis_index(ar) * h_loc - R, jnp.zeros((), jnp.int32)]
            ).astype(jnp.int32)
            xn, z0n, z1n, st = tv_pds_megar_shard_step(
                x, z0, z1, atb_ext, (xt, xb, z0t, z0b, z1t, z1b),
                self._megar_Bf, self._megar_Cf, self._megar_Ba, self._megar_Ca,
                off, H_global=H, mega_r=R, interpret=self._pallas_interpret,
                tau=self.tau, sigma=self.sigma, rho=self.rho, lam=self.lam,
                nonneg=self.nonneg, iso=self.iso,
            )
            st = jax.lax.psum(jax.lax.psum(st[0, :6], ar), ac)
            return xn, z0n, z1n, st
        xe = self._lane_ext_local(x)
        z0e = self._lane_ext_local(z0)
        z1e = self._lane_ext_local(z1)
        xt, xb = self._row_halos_local(xe, R)
        z0t, z0b = self._row_halos_local(z0e, R)
        z1t, z1b = self._row_halos_local(z1e, R)
        off = jnp.stack(
            [
                jax.lax.axis_index(ar) * h_loc - R,
                jax.lax.axis_index(ac) * w_loc - 128,
            ]
        ).astype(jnp.int32)
        xn, z0n, z1n, st = tv_pds_megar_shard2d_step(
            xe, z0e, z1e, atb_ext, (xt, xb, z0t, z0b, z1t, z1b),
            self._megar_Bf, self._megar_Cf, self._megar_Ba, self._megar_Ca,
            off, H_global=H, W_global=W, mega_r=R,
            interpret=self._pallas_interpret,
            tau=self.tau, sigma=self.sigma, rho=self.rho, lam=self.lam,
            nonneg=self.nonneg, iso=self.iso,
        )
        st = jax.lax.psum(jax.lax.psum(st[0, :6], ar), ac)
        return xn, z0n, z1n, st

    # -- one PDS iteration on LOCAL blocks (inside a 2-D shard_map) ---------
    def _local_step(self, x, z, atb_loc, m_loc=None):
        from pycsou_tpu.parallel.spatial import (
            sharded_grad2d_2d,
            sharded_grad2d_adjoint_2d,
            sharded_sepgram_rank1_2d,
        )

        tau, sigma, rho, lam = self.tau, self.sigma, self.rho, self.lam
        ar, ac = self.ax_r, self.ax_c

        if m_loc is not None:  # diagonal (sampling) Gram: elementwise
            grad = 2.0 * (m_loc * x - atb_loc)
        else:
            g_rows, g_cols = self._gplans()
            grad = 2.0 * (sharded_sepgram_rank1_2d(x, g_rows, g_cols, ar, ac) - atb_loc)
        x_temp = x - tau * grad - tau * sharded_grad2d_adjoint_2d(z, ar, ac)
        if self.nonneg:
            x_temp = jnp.maximum(x_temp, 0.0)
        v = z + sigma * sharded_grad2d_2d(2.0 * x_temp - x, ar, ac)
        if self.iso:
            mag = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            z_temp = v * (lam / jnp.maximum(mag, lam))
        else:  # anisotropic: per-component box projection
            z_temp = jnp.clip(v, -lam, lam)
        return rho * x_temp + (1 - rho) * x, rho * z_temp + (1 - rho) * z

    # -- IterativeSolver protocol -------------------------------------------
    def initial_state(self):
        H, W = self.shape
        x0 = jax.device_put(jnp.zeros((H, W), jnp.float32), NamedSharding(self.mesh, self._spec_x()))
        if self._sp_engine:
            zs = NamedSharding(self.mesh, self._spec_x())
            return {
                "x": x0,
                "z0": jax.device_put(jnp.zeros((H, W), jnp.float32), zs),
                "z1": jax.device_put(jnp.zeros((H, W), jnp.float32), zs),
                "_stats": jnp.zeros((6,), jnp.float32),
            }
        z0 = jax.device_put(jnp.zeros((2, H, W), jnp.float32), NamedSharding(self.mesh, self._spec_z()))
        return {"x": x0, "z": z0}

    def step(self, state):
        P = PartitionSpec
        if self._sp_engine:
            smapped = jax.shard_map(
                self._local_step_megar2d,
                mesh=self.mesh,
                in_specs=(self._spec_x(),) * 4,
                out_specs=(self._spec_x(),) * 3 + (P(),),
                check_vma=False,
            )
            x, z0, z1, st = smapped(state["x"], state["z0"], state["z1"], self._atb_ext)
            return {"x": x, "z0": z0, "z1": z1, "_stats": st}
        if self.mask is not None:  # diagonal-Gram (sampling) chain
            smapped = jax.shard_map(
                lambda x, z, m, t: self._local_step(x, z, t, m_loc=m),
                mesh=self.mesh,
                in_specs=(self._spec_x(), self._spec_z(), self._spec_x(), self._spec_x()),
                out_specs=(self._spec_x(), self._spec_z()),
            )
            x, z = smapped(state["x"], state["z"], self.mask, self.atb)
            return {"x": x, "z": z}
        smapped = jax.shard_map(
            self._local_step,
            mesh=self.mesh,
            in_specs=(self._spec_x(), self._spec_z(), self._spec_x()),
            out_specs=(self._spec_x(), self._spec_z()),
        )
        x, z = smapped(state["x"], state["z"], self.atb)
        return {"x": x, "z": z}

    # -- kernel-epilogue metrics (megar2d; zero extra HBM passes) ------------
    def metric(self, old, new):
        if self._sp_engine and "_stats" in new:
            from pycsou_tpu.opt.tv import TVDeconvolution

            st = new["_stats"]
            return TVDeconvolution._rel_from_stats(st[0], st[1])
        return super().metric(old, new)

    def metrics(self, old, new):
        if self._sp_engine and "_stats" in new:
            from pycsou_tpu.opt.tv import TVDeconvolution

            st = new["_stats"]
            return {
                "x": TVDeconvolution._rel_from_stats(st[0], st[1]),
                "z0": TVDeconvolution._rel_from_stats(st[2], st[3]),
                "z1": TVDeconvolution._rel_from_stats(st[4], st[5]),
            }
        return super().metrics(old, new)

    def run(self, n_iters: int, x=None, z=None):
        """Fixed-iteration API (benchmarks); returns (x, z) still sharded."""
        if self._sp_engine:
            state = dict(self.initial_state())
            if x is not None:
                state["x"] = x
            if z is not None:
                state["z0"], state["z1"] = z[0], z[1]
            state = self.run_fixed(n_iters, state=self._wrap_state(state))
            return state["x"], jnp.stack([state["z0"], state["z1"]], axis=0)
        state = None
        if x is not None or z is not None:
            init = self.initial_state()
            state = self._wrap_state(
                {"x": x if x is not None else init["x"], "z": z if z is not None else init["z"]}
            )
        state = self.run_fixed(n_iters, state=state)
        return state["x"], state["z"]

    def _gram_local(self, b):
        """Per-shard ``A^H A`` block: the rank-1 banded Gram when available,
        else the per-rank forward-then-adjoint composition (exact for any
        rank — the sweeps are exact 'same' convolutions)."""
        from pycsou_tpu.parallel.spatial import (
            sharded_sepconv2d_2d,
            sharded_sepconv2d_adjoint_2d,
            sharded_sepgram_rank1_2d,
        )

        if self._band_rows is not None:
            g_rows, g_cols = self._gplans()
            return sharded_sepgram_rank1_2d(b, g_rows, g_cols, self.ax_r, self.ax_c)
        t = None
        for ((rp, cp), _) in self._rank_plans:
            ti = sharded_sepconv2d_2d(b, rp, cp, self.ax_r, self.ax_c)
            t = ti if t is None else t + ti
        g = None
        for (_, (rp, cp)) in self._rank_plans:
            gi = sharded_sepconv2d_adjoint_2d(t, rp, cp, self.ax_r, self.ax_c)
            g = gi if g is None else g + gi
        return g

    def objective(self, x) -> jax.Array:
        """Global objective via the Gram identity
        ``||Ax-y||^2 = <x, A^H A x> - 2 <x, A^H y> + ||y||^2`` (pure/jittable;
        GSPMD reduces over the mesh)."""
        from pycsou_tpu.ops.diff import fdiff_forward

        if self.mask is not None:  # observed pixels only (see opt/tv.py)
            yc = self.atb / jnp.maximum(self.mask, 1.0)
            data = jnp.sum(self.mask * (x - yc) ** 2)
        else:
            smapped = jax.shard_map(
                self._gram_local,
                mesh=self.mesh,
                in_specs=(self._spec_x(),),
                out_specs=self._spec_x(),
            )
            data = jnp.vdot(x, smapped(x)) - 2.0 * jnp.vdot(x, self.atb) + self._y2
        g0 = fdiff_forward(x, 0)
        g1 = fdiff_forward(x, 1)
        if self.iso:
            tv = jnp.sum(jnp.sqrt(g0 * g0 + g1 * g1))
        else:
            tv = jnp.sum(jnp.abs(g0)) + jnp.sum(jnp.abs(g1))
        return data + self.lam * tv
