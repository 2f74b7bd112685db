"""Batched fast wave kernel — the TPU execution path.

Same ETDRK4 stage structure, budget integration and physics as
:class:`~niwqg_tpu.models.kernel.WaveKernel`, re-organised for the MXU:

  - every stage's transforms are grouped into a few *batched* calls
    (leading-axis stacking), so the matmul-DFT sees large flattened
    matmuls instead of ~22 individual transforms;
  - the elliptic inversion stays in spectral space:
    ``ph = -(qh - qwh)/wv2`` — the reference's
    ``fft(real(ifft(...)))`` sandwich (``CoupledModel.py:91-94``) is an
    Hermitian projection that is the identity here because ``q`` and the
    wave PV are real, so three transforms per stage vanish;
  - every transform whose input or output is a *real* field goes through
    the provider's half-spectrum path (``fft2_real``/``ifft2_real`` →
    even/odd rfft2/irfft2 on the MXU provider), which halves the matmul
    work per real field with exact same-field arithmetic. This replaces
    the round-1 two-for-one *forward* pair packing, whose cross-field
    unpack leaked ``eps*||big||`` noise between paired fields and NaN'd a
    100-step 4096² f32 run once the k² wave-PV factors amplified it.
    (``pair_inverse=True`` revisits packing in the INVERSE direction
    only, where inputs are Hermitian up to rounding and the unpack is
    the re/im planes themselves, so the residual leak is physical-space
    eps-grade noise rather than k²-amplified spectrum noise; see
    ``__init__`` below and ``ops/fft._pairs_via_ifft2``);
  - with ``spectral_budgets=True`` (default) the per-stage energy-budget
    sources (``niwqg/Kernel.py:629-701``) are evaluated by Parseval
    instead of in physical space, which makes them FREE of transforms:
    every quadratic mean is a weighted reduction of ``|phih|^2`` or
    ``Re(conj(qh)*ph)``, and every triple-product conversion term pairs a
    prognostic spectrum with a forward transform the stage already does
    for the RHS — ``fft(J(psi,phi))`` and ``fft(phi*q_psi)`` (see
    :meth:`_sources_spectral` for the identities). The physical path
    needed 4 complex + 2 real inverse transforms per stage.

Agrees with the faithful kernel to rounding error (f64 CPU: ~1e-12 over
multiple steps; asserted in ``tests/test_fast_kernel.py``). This is a
*re-association* of the reference arithmetic, not a different scheme.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from typing import NamedTuple

from ..carray import C, jmul, mul_i, stack, unstack
from ..etdrk4 import ETDRK4Coefs
from ..ops import spectral
from .kernel import (Derived, KernelParams, StageSources, WaveKernel,
                     WavePhysics, WaveState)


class _QTables(NamedTuple):
    """q-side wavenumber/filter tables (full-spectrum grid views, or the
    same tables sliced to the rfft half-spectrum in ``q_half`` mode)."""

    k: object
    l: object
    wv: object
    wv2: object
    wv2i: object
    wv4: object
    filtr: object


class FastWaveKernel(WaveKernel):
    """Batched-transform wave kernel (Coupled / UnCoupled / QL physics).

    ``q_half`` (default: on for even grids whose transform provider has a
    half-spectrum path): carry every q/psi-side spectrum — ``qh``,
    ``qwh``, ``ph`` and the q-equation ETDRK4 tables — on the rfft
    half-spectrum ``(ny, nx//2+1)``. All q-side spectra in this kernel are
    Hermitian bitwise (they come from transforms of real fields and
    symmetric-table multiplies; the only asymmetry, mean-flow advection's
    Nyquist-column phase, lives *within* a retained column), so the half
    layout stores the same information while (a) skipping the
    expand/project gathers that ``fft2_real``/``ifft2_real`` pay per real
    field (a full-field HBM round trip each) and (b) halving the q-side
    spectral elementwise work (ETDRK4 combinations, filters, budget
    reductions). Tables are sliced from the FULL-spectrum grid so the
    retained columns — including the reference's negative-Nyquist
    convention in the advection phase (``niwqg/Kernel.py:417-418``) — are
    bitwise identical to the full-layout arithmetic.
    """

    def __init__(self, params: KernelParams, physics: WavePhysics,
                 q_half=None, pair_inverse: bool = False,
                 fold_filter: bool = True, **kw):
        super().__init__(params, physics, **kw)
        self.pair_inverse = bool(pair_inverse)
        if self.pair_inverse:
            # pair packing rides full complex inverses, so the q side must
            # carry full-width spectra (the q_half trade — ROADMAP item 1)
            if q_half:
                raise ValueError(
                    "pair_inverse requires the full-spectrum q side "
                    "(q_half=False)")
            if params.nx % 2 or not hasattr(self.tr, "ifft2_real_pairs"):
                raise ValueError(
                    "pair_inverse needs even nx and a transform provider "
                    "with ifft2_real_pairs")
            if not physics.hermitian_ph:
                # same constraint as q_half: QL keeps ph UNPROJECTED
                # (``QLModel.py:86``), whose anti-Hermitian content the
                # packed inverse would deposit on the partner field
                # (verified: ~3e-4 phi corruption in 4 f64 steps)
                raise ValueError(
                    "pair_inverse requires Hermitian-projecting physics "
                    f"({type(physics).__name__} keeps ph unprojected)")
            q_half = False
        if q_half is None:
            q_half = (params.nx % 2 == 0 and hasattr(self.tr, "rfft2")
                      and physics.hermitian_ph)
        elif q_half and not physics.hermitian_ph:
            # QL keeps ph UNPROJECTED (``QLModel.py:86``): the carried
            # anti-Hermitian Nyquist content of qh leaks into its
            # velocities through the l-derivative (h = -i*l*a), which the
            # half layout cannot represent. Bug-for-bug parity requires
            # the full-spectrum q side here.
            raise ValueError(
                "q_half requires Hermitian-projecting physics "
                f"({type(physics).__name__} keeps ph unprojected)")
        self.q_half = bool(q_half)
        g = self.grid
        if self.q_half:
            nk = params.nx // 2 + 1
            cut = lambda t: t[:, :nk]
            ccut = lambda z: C(cut(z.re), cut(z.im))
            self.qtab = _QTables(
                k=cut(g.k), l=cut(g.l), wv=cut(g.wv), wv2=cut(g.wv2),
                wv2i=cut(g.wv2i), wv4=cut(g.wv4), filtr=cut(g.filtr),
            )
            self._flt_q = self.qtab.filtr
            self.coefs_q = ETDRK4Coefs(*[ccut(t) for t in self.coefs_q])
            self._fwd_real = self.tr.rfft2
            # the reference reads every q-side spectrum through
            # ``real(ifft(.))``, which projects within-column (l <-> -l)
            # asymmetry at the self-mirror columns k=0 and k=nx/2 (e.g.
            # ``-i*l*ph`` is anti-Hermitian at unpaired Nyquist rows);
            # ``irfft2`` alone projects only the k-direction residue, so
            # fold the 2-column projection in — O(ny) per field
            nx = params.nx

            def _inv_real(z):
                return self.tr.irfft2(spectral.hermitian_project_half(z, nx))

            self._inv_real = _inv_real
            # Hermitian-degeneracy weights: interior columns stand for
            # their dropped conjugate mirrors (``niwqg/QGModel.py:611-619``)
            deg = np.full((1, nk), 2.0)
            deg[0, 0] = deg[0, params.nx // 2] = 1.0
            self._qdeg = jnp.asarray(deg.astype(self.dtype))
            # y-derivative l table: zero the Nyquist row's interior
            # columns (see WaveKernel.__init__ on ``_l_dy``)
            l_dy = np.asarray(self.qtab.l).copy()
            l_dy[g.ny // 2, 1:params.nx // 2] = 0.0
            self._l_dy = jnp.asarray(l_dy)
        if self.pair_inverse:
            # full-spectrum q side + pair-packed inverse reads: every
            # stacked ifft2_real batch rides nf/2 complex inverses. The
            # O(ny) 2-column projection replaces the reference's full
            # fft(real(ifft(.))) sandwich: interior mirror columns stay
            # Hermitian up to rounding (the MXU forward real path expands
            # exact mirrors and table multiplies are conjugate-symmetric
            # to <=1 ulp; contour tables with U != 0 and the native-FFT
            # provider are conjugate-symmetric only to rounding), so only
            # the self-mirror columns k=0, nx/2 carry systematic
            # anti-Hermitian content (mean-flow advection phase).
            # Residual rounding-grade asymmetry lands on the partner
            # field as eps*||q||-scale noise — measured ~9e-5 relative Ke
            # divergence over 20 f32 steps at 4096^2 (PERFORMANCE.md),
            # 1e-11-exact in f64 (tests/test_pair_inverse.py). The mode
            # is opt-in (measured slower single-chip; an ICI lever on
            # pencil meshes) — validate long-horizon f32 stability before
            # production use.
            nx_ = params.nx

            def _inv_real_pairs(z):
                if z.re.ndim == 2:
                    return self.tr.ifft2_real(z)
                return self.tr.ifft2_real_pairs(
                    spectral.hermitian_project_half(z, nx_))

            self._inv_real = _inv_real_pairs
            # l-derivative table, Nyquist-row interior columns zeroed: an
            # l-derivative of a Hermitian spectrum is PURELY anti-Hermitian
            # there (pair (ny/2, k) <-> (ny/2, nx-k) has z2 = -conj(z1));
            # the full-projection read annihilates it, and the packed read
            # must never create it (it would land on the partner field).
            # Exactly the half-layout ``_l_dy`` rule, full-width.
            g_ = self.grid
            l_dy = np.asarray(g_.l).copy()
            l_dy[g_.ny // 2, 1:nx_ // 2] = 0.0
            l_dy[g_.ny // 2, nx_ // 2 + 1:] = 0.0
            self._l_dy = jnp.asarray(l_dy)
        # Spectral-budget weight tables (f64 numpy, cast once). All three
        # fold the dissipation coefficients into a single wavenumber
        # weight so each budget scalar is ONE weighted reduction:
        #   w_d      : hat of the phi-dissipation operator,
        #              diss_phi = w_d * phih  (also = the ep_phi density
        #              weight, since ep_phi = mean(Re(conj(phi)*diss_phi)))
        #   w_chi    : chi_phi density weight over |phih|^2
        #   w_eppsi  : ep_psi density weight over Re(conj(qh)*ph)
        p = params
        wv2 = self.grid.wv2_np.astype(np.float64)
        wv4 = self.grid.wv4_np.astype(np.float64)
        k2 = p.kappa2
        w_d = -(p.nu4w * wv4 + p.nuw * wv2 + p.muw)
        w_chi = -0.5 * (p.nu4w * wv2 * wv4 + p.nuw * wv4 + p.muw * wv2) / k2
        w_eppsi = p.nu4 * wv4 + p.nu * wv2 + p.mu
        self._w_d = jnp.asarray(w_d.astype(self.dtype))
        self._w_chi = jnp.asarray(w_chi.astype(self.dtype))
        if self.q_half:
            # ep_psi reduces a q-side spectrum: fold the Hermitian
            # degeneracy into the weight (the (0,0) mode keeps weight 1,
            # matching the full-spectrum mean-of-product sum)
            w_eppsi = (w_eppsi[:, :params.nx // 2 + 1]
                       * np.asarray(self._qdeg, np.float64))
        self._w_eppsi = jnp.asarray(w_eppsi.astype(self.dtype))

        self.fold_filter = bool(fold_filter)
        if self.fold_filter:
            # pre-multiply the stage filter into every ETDRK4 table and
            # skip the explicit per-stage ``* filtr`` pass (one fewer
            # full-size table read per update, 2 equations x 4 stages).
            # Pure reassociation of the reference arithmetic (3e-16
            # relative over 8 f64 steps vs the unfolded kernel); the
            # wave-PV filter (``qwh *= filtr``) is untouched. Default ON
            # for the fast kernel: measured +3.3% full-step at 2048^2 on
            # the target chip, tie at 4096^2, identical Ke printed
            # (``scripts/sweep_ff_r4.log``).
            from ..etdrk4 import fold_filter_into

            self.coefs_q = fold_filter_into(self.coefs_q, self._flt_q)
            self.coefs_w = fold_filter_into(self.coefs_w, self._flt_w)
            self._flt_q = None
            self._flt_w = None

    @property
    def _drop_p(self) -> bool:
        # the physical streamfunction is consumed only by the
        # physical-space budget sources; the spectral path never needs it
        return self._spectral_src

    @property
    def _spectral_src(self) -> bool:
        # bug-for-bug stale-gradient mode must keep the physical-space
        # evaluation: spectrally, the gradient-dependent quadratics
        # (ep_phi's nuw term, chi_phi's muw term) always see FRESH
        # gradients (they read phih), while the reference integrates the
        # stale physical phix/phiy (``niwqg/Kernel.py:608-611``).
        # Stale-q_psi (faithful QL) likewise: ep_psi mixes the FROZEN
        # ``self.q`` with current ph/qh (``niwqg/Kernel.py:635-640``),
        # which the single Re(conj(qh)*ph) reduction cannot express.
        return self.params.spectral_budgets and \
            not self.physics.stale_phi_gradients and \
            not self.physics.stale_q_psi

    # ------------------------------------------------------------------
    def derive(self, qh: C, phih: C, prev=None) -> Derived:
        g, tr = self.grid, self.tr
        pg = tr.ifft2(stack([phih, mul_i(phih, g.k), mul_i(phih, g.l)]))
        phi, phix, phiy = unstack(pg, 3)
        if self.physics.stale_phi_gradients and prev is not None:
            phix, phiy = prev.phix, prev.phiy
        D = self._invert_core(qh, phi, phix, phiy)
        if self.physics.stale_q_psi and prev is not None:
            # bug-for-bug QL mode: q_psi frozen at the set_q value
            D = D._replace(q_psi=prev.q_psi)
        return D

    def _project_ph(self, ph: C) -> C:
        """The reference inversion's ``fft(real(ifft(.)))`` sandwich."""
        if self.q_half or self.pair_inverse:
            # 2-column projection suffices: see the pair_inverse note in
            # __init__ (interior mirror columns bitwise Hermitian)
            return spectral.hermitian_project_half(ph, self.params.nx)
        return spectral.hermitian_project(ph)

    def _invert_core(self, qh: C, phi: C, phix: C, phiy: C) -> Derived:
        """Inversion + derived physical fields from given wave fields
        (shared by per-stage ``derive`` and ``apply_set_q``, which must
        invert with the *carried* phi — ``niwqg/Kernel.py:520-551``)."""
        qt, p = self.qtab, self.params

        if self.physics.has_wave_pv:
            z = phix.conj() * phiy - phiy.conj() * phix
            fj = self._fwd_real(jnp.stack([phi.abs2(), jmul(z).re]))
            gphi2h = fj[0] * (-qt.wv2)
            jach = spectral.zero_mean_mode(fj[1])
            if self.physics.wave_pv_imag_jac:
                # reference QL transcription bug (``QLModel.py:83``)
                jach = jmul(jach)
            qwh = ((0.5 * gphi2h + jach) * 0.5 / p.f) * qt.filtr
        else:
            qwh = C.zeros(qh.shape, qh.dtype)

        ph = -((qh - qwh) * qt.wv2i)
        if self.physics.hermitian_ph:
            # Coupled/UnCoupled invert through a fft(real(ifft(.)))
            # sandwich (``CoupledModel.py:91-94``, ``UnCoupledModel.py:60-61``)
            # = Hermitian projection; QL keeps ph unprojected
            # (``QLModel.py:86``)
            ph = self._project_ph(ph)
        # batch only the fields a stage actually consumes: the physical
        # streamfunction feeds nothing but the physical-space budget
        # sources (spectral mode carries p=None; the api recomputes it on
        # access), and q_psi is an alias of q unless the physics subtracts
        # the wave PV (``niwqg/Kernel.py:492-501``)
        specs = [mul_i(ph, -self._l_dy), mul_i(ph, qt.k), qh]
        if not self._drop_p:
            specs.insert(0, ph)
        if self.physics.subtracts_wave_pv:
            specs.append(qh - qwh)
        gb = self._inv_real(stack(specs))
        i = 0 if self._drop_p else 1
        p_ = None if self._drop_p else gb[0]
        u, v, q = gb[i], gb[i + 1], gb[i + 2]
        q_psi = gb[i + 3] if self.physics.subtracts_wave_pv else q
        return Derived(ph=ph, p=p_, q=q, q_psi=q_psi, qwh=qwh, phi=phi,
                       phix=phix, phiy=phiy, u=u, v=v)

    # ------------------------------------------------------------------
    # shared RHS products (also feed the spectral budget sources)
    # ------------------------------------------------------------------
    def _wave_products(self, qh: C, D: Derived):
        """Forward transforms of the stage's nonlinear products:
        ``fft(J_adv)`` (the advection term entering the phi-RHS),
        ``fft(phi*q_psi)`` (refraction, pre-``0.5j``), and ``fft(J_full)``
        — the Jacobian by the FULL geostrophic flow, which the budget
        sources use (``niwqg/Kernel.py:664-701`` reads ``self.u/self.v``).
        For Coupled/UnCoupled ``J_adv == J_full``; QL advects waves by the
        q-part velocities only (``QLModel.py:54-67``), so it transforms
        one extra field in the same batch."""
        qt, tr = self.qtab, self.tr
        refr_prod = D.phi * D.q_psi
        if self.physics.advect_by_vortex_flow:
            ph_q = -(qh * qt.wv2i)
            uv = self._inv_real(stack([mul_i(ph_q, -self._l_dy),
                                       mul_i(ph_q, qt.k)]))
            j_adv = D.phix * uv[0] + D.phiy * uv[1]
            j_full = D.phix * D.u + D.phiy * D.v
            nlc = tr.fft2(stack([j_adv, refr_prod, j_full]))
            jacwh_raw, refrh_raw, jh_full = unstack(nlc, 3)
        else:
            j_full = D.phix * D.u + D.phiy * D.v
            nlc = tr.fft2(stack([j_full, refr_prod]))
            jacwh_raw, refrh_raw = unstack(nlc, 2)
            jh_full = jacwh_raw
        return jacwh_raw, refrh_raw, jh_full

    def _rhs_from_products(self, D: Derived, jacwh_raw: C, refrh_raw: C):
        qt = self.qtab
        uvqh = self._fwd_real(jnp.stack([D.u * D.q, D.v * D.q]))
        # _l_dy stores the half-layout Hermitian representative of the
        # l-derivative (exactly 0 at the Nyquist row's interior columns,
        # where the reference's full-spectrum qh carries purely
        # anti-Hermitian content that every real(ifft(.)) readout
        # projects away)
        jacq = spectral.zero_mean_mode(mul_i(uvqh[0], qt.k)
                                       + mul_i(uvqh[1], self._l_dy))
        Fn = -jacq
        jacwh = jacwh_raw
        if self.physics.zero_mean_jac_psi_phi:
            jacwh = spectral.zero_mean_mode(jacwh)
        Fnw = -jacwh - jmul(refrh_raw, 0.5)
        return Fn, Fnw

    def stage_terms(self, qh: C, phih: C, D: Derived, want_sources: bool):
        jacwh_raw, refrh_raw, jh_full = self._wave_products(qh, D)
        Fn, Fnw = self._rhs_from_products(D, jacwh_raw, refrh_raw)
        if not want_sources:
            src = self.zero_sources()
        elif self._spectral_src:
            src = self._sources_spectral(qh, phih, D, refrh_raw, jh_full)
        else:
            src = self._stage_sources_batched(qh, phih, D)
        return Fn, Fnw, src

    def nonlinear(self, qh: C, D: Derived):
        jacwh_raw, refrh_raw, _ = self._wave_products(qh, D)
        return self._rhs_from_products(D, jacwh_raw, refrh_raw)

    # ------------------------------------------------------------------
    # budget sources
    # ------------------------------------------------------------------
    def stage_sources(self, qh: C, phih: C, D: Derived) -> StageSources:
        """Standalone source evaluation (diagnostics cadence); inside the
        step the sources share the stage's transforms via
        :meth:`stage_terms`."""
        if self._spectral_src:
            _, refrh_raw, jh_full = self._wave_products(qh, D)
            return self._sources_spectral(qh, phih, D, refrh_raw, jh_full)
        return self._stage_sources_batched(qh, phih, D)

    def _sources_spectral(self, qh: C, phih: C, D: Derived,
                          refrh_raw: C, jh_full: C) -> StageSources:
        """Parseval evaluation of ``niwqg/Kernel.py:629-701``: exact
        re-associations of the physical-space means, zero transforms.

        With ``Rh = fft(phi*q_psi)``, ``Jh = fft(phix*u + phiy*v)``,
        ``lapphi_h = -wv2*phih`` and ``diss_phi_h = w_d*phih``:

          ep_phi  = mean(Re(conj(phi) diss_phi))        = Σ w_d|phih|²/M²
          chi_phi = (quadratic gradient means)           = Σ w_chi|phih|²/M²
          ep_psi  = nu4 mean(q lap²ψ) − nu mean(p lap q) + mu mean(p q)
                  = Σ w_eppsi Re(conj(qh) ph)/M²
          gamma1  = ¼ hslash/f mean(q_psi Im(conj(phi) lapphi))
                  = ¼ hslash/f Im(Σ conj(Rh)(−wv2 phih))/M²
          gamma2  = ½ hslash/f mean(Re(conj(lapphi) J))
                  = ½ hslash/f Re(Σ conj(−wv2 phih) Jh)/M²
          xi1     = −mean(Im(diss_phi conj(J)))/f
                  = −Im(Σ w_d phih conj(Jh))/M²/f
          xi2     = ½ mean(Re(diss_phi conj(phi)) q_psi)/f
                  = ½ Re(Σ w_d phih conj(Rh))/M²/f
          pi      = ½ Im(phih[0,0] conj(Rh[0,0]))/M²

        The q_psi-weighted terms fold the real factor into the conjugated
        transform (``q_psi`` real ⇒ ``conj(phi) q_psi = conj(phi q_psi)``).
        ``Jh``/``Rh`` are the raw products — BEFORE the Jacobian's
        mean-mode zeroing and the refraction's ``0.5j`` factor — because
        the reference's physical-space means see the un-zeroed products.
        """
        g, p = self.grid, self.params
        M2 = self._s(1.0 / float(g.M) ** 2)
        hs, f = p.hslash, p.f

        aphi2 = phih.abs2()
        ep_phi = (self._w_d * aphi2).sum() * M2
        chi_phi = (self._w_chi * aphi2).sum() * M2

        # ep_psi pairs ph with qh; the Parseval identity matches the
        # physical-space mean of the ``real(ifft(.))`` fields exactly iff
        # one side is Hermitian. qh carries genuine anti-Hermitian content
        # in the unpaired Nyquist modes (mean-flow advection rotates them
        # off the real axis), so when the physics keeps ph unprojected
        # (QL) we project it here — reproducing what ``ifft(ph).real``
        # computes (``spectral.hermitian_project``).
        if self.physics.hermitian_ph:
            ph = D.ph
        elif self.q_half:
            ph = spectral.hermitian_project_half(D.ph, p.nx)
        else:
            ph = spectral.hermitian_project(D.ph)
        rqp = qh.re * ph.re + qh.im * ph.im  # Re(conj(qh)*ph)
        # (_w_eppsi carries the Hermitian-degeneracy weights in q_half mode)
        ep_psi = (self._w_eppsi * rqp).sum() * M2

        # Im(conj(Rh) * (-wv2*phih)) and Re(conj(-wv2*phih) * Jh)
        gamma1 = (0.25 * hs / f) * M2 * (
            (-g.wv2) * (refrh_raw.re * phih.im - refrh_raw.im * phih.re)
        ).sum()
        gamma2 = (0.5 * hs / f) * M2 * (
            (-g.wv2) * (phih.re * jh_full.re + phih.im * jh_full.im)
        ).sum()
        # Im(w_d*phih * conj(Jh)) and Re(w_d*phih * conj(Rh))
        xi1 = (-1.0 / f) * M2 * (
            self._w_d * (phih.im * jh_full.re - phih.re * jh_full.im)
        ).sum()
        xi2 = (0.5 / f) * M2 * (
            self._w_d * (phih.re * refrh_raw.re + phih.im * refrh_raw.im)
        ).sum()
        pi = 0.5 * M2 * (phih.im[0, 0] * refrh_raw.re[0, 0]
                         - phih.re[0, 0] * refrh_raw.im[0, 0])

        k_src = -(gamma1 + gamma2) + (xi1 + xi2) + ep_psi
        p_src = gamma1 + gamma2 + chi_phi
        a_src = ep_phi
        return StageSources(k_src, p_src, a_src, gamma1, gamma2, xi1, xi2, pi,
                            ep_psi, chi_phi, ep_phi)

    def _stage_sources_batched(self, qh: C, phih: C, D: Derived) -> StageSources:
        """Physical-space sources with batched transforms (used when
        ``spectral_budgets=False`` or in the stale-gradient quirks mode)."""
        g, qt, tr = self.grid, self.qtab, self.tr
        if D.p is None:  # spectral-mode state driven through the physical path
            D = D._replace(p=self._inv_real(D.ph))
        batch = tr.ifft2(stack([
            phih * (-g.wv2),                 # lapphi
            phih * g.wv4,                    # lap2phi
            mul_i(phih, -g.k * g.wv2),       # lphix
            mul_i(phih, -g.l * g.wv2),       # lphiy
        ]))
        lapphi, lap2phi, lphix, lphiy = unstack(batch, 4)
        rb = self._inv_real(stack([D.ph * qt.wv4, qh * (-qt.wv2)]))
        lap2psi, lapq = rb[0], rb[1]
        return self.sources_from_fields(D, lapphi, lap2phi, lphix, lphiy,
                                        lap2psi, lapq)

    # ------------------------------------------------------------------
    # state construction / initialization (q_half-aware layouts)
    # ------------------------------------------------------------------
    def zero_state(self) -> WaveState:
        if not self.q_half:
            return super().zero_state()
        shape = (self.grid.nl, self.grid.nk)
        hshape = (self.grid.nl, self.params.nx // 2 + 1)
        zf = C.zeros(shape, self.dtype)   # phi-side spectra / physical C
        zh = C.zeros(hshape, self.dtype)  # q-side half spectra
        r = jnp.zeros(shape, self.dtype)
        D = Derived(ph=zh, p=None if self._drop_p else r, q=r, q_psi=r,
                    qwh=zh, phi=zf, phix=zf, phiy=zf, u=r, v=r)
        zero = self._s(0.0)
        return WaveState(t=zero, tc=jnp.asarray(0, jnp.int32), qh=zh,
                         phih=zf, d=D, Ke=zero, Pw=zero, Kw=zero)

    def apply_set_q(self, s: WaveState, q) -> WaveState:
        if not self.q_half:
            return super().apply_set_q(s, q)
        # same semantics as the base (``niwqg/Kernel.py:520-551``): invert
        # with the *carried* phi/gradients, preserve the carried wave
        # fields, refresh Ke
        q = self._cast_field(q)
        qh = self._fwd_real(q)
        D = self._invert_core(qh, s.d.phi, s.d.phix, s.d.phiy)
        D = D._replace(phi=s.d.phi, phix=s.d.phix, phiy=s.d.phiy)
        Ke = self.ke_qg(D.ph)
        return s._replace(qh=qh, d=D, Ke=Ke)
