"""Shared NIW–QG wave kernel: functional ETDRK4 co-evolution of (qh, phih).

This is the TPU-native re-design of the reference's mutable ``Kernel`` god
object (``niwqg/Kernel.py:9-878``): a frozen :class:`WaveKernel` holding all
precomputed tables, an immutable :class:`WaveState` pytree, and a pure
``step(state) -> state`` suitable for ``jax.jit``/``lax.scan``/``shard_map``.

Faithfulness notes (the "numerical contract", SURVEY.md §2):
  - The four ETDRK4 stage updates and their filter applications replicate
    ``niwqg/Kernel.py:307-398`` operation-for-operation.
  - The energy budgets Ke/Pw/Kw are advanced *inside* the step with RK4
    weights from stage-wise sources (``niwqg/Kernel.py:319-392``).
  - Stage sources are evaluated from the *carried* derived state (the
    reference's instance attributes), including the initial-condition quirk
    where the first step's stage 1 sees the inversion computed by ``set_q``
    with phi = 0 (``niwqg/Kernel.py:520-551``; see ``apply_set_q``).
  - Model variants plug in an ``invert`` and ``jac_psi_phi`` strategy
    instead of subclassing a stateful kernel (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..carray import C, jmul, mul_i
from ..etdrk4 import (ETDRK4Coefs, build_coefs, linear_operator_phi,
                      linear_operator_q)
from ..grid import Grid
from ..ops import spectral
from ..ops.fft import make_transform


@dataclasses.dataclass(frozen=True)
class KernelParams:
    """Physical and numerical parameters (reference defaults,
    ``niwqg/Kernel.py:70-98``)."""

    nx: int = 128
    L: float = 5e5
    dt: float = 10000.0
    tmax: float = 250000.0
    twrite: int = 1000
    cflmax: float = 0.8
    U: float = 0.0
    f: float = 1.0e-4
    N: float = 0.01
    m: float = 0.025
    g: float = 9.81
    nu4: float = 0.0
    nu4w: float = 0.0
    nu: float = 20.0
    nuw: float = 50.0
    mu: float = 0.0
    muw: float = 0.0
    use_filter: bool = True
    dealias: bool = False
    tdiags: int = 10
    tsave_snapshots: int = 10
    # stage-interleaved RK4 energy-budget integration (Ke/Pw/Kw,
    # ``niwqg/Kernel.py:319-392``). Disabling skips the per-stage source
    # transforms (~30% of the step) and freezes the budget accumulators —
    # for production runs that only need the cadenced diagnostics.
    compute_budgets: bool = True
    # evaluate the budget sources spectrally (Parseval) in the fast kernel:
    # every quadratic mean becomes a weighted spectral reduction and every
    # triple-product term pairs a prognostic spectrum with the nonlinear
    # transforms the stage already computes, so the sources cost ZERO extra
    # transforms (vs 4 complex + 2 real inverse transforms per stage for
    # the physical-space evaluation of ``niwqg/Kernel.py:629-701``). Exact
    # to rounding (same quantities, re-associated); the faithful kernel
    # ignores this flag and keeps the reference's physical-space arithmetic.
    spectral_budgets: bool = True

    @property
    def kappa(self) -> float:
        return self.m * self.f / self.N

    @property
    def kappa2(self) -> float:
        return self.kappa**2

    @property
    def hslash(self) -> float:
        return self.f / self.kappa2


class Derived(NamedTuple):
    """Derived fields recomputed after every stage update (the reference's
    ``phi = ifft(phih); _invert(); _calc_rel_vorticity()`` block plus
    velocities)."""

    ph: C
    p: jnp.ndarray
    q: jnp.ndarray
    q_psi: jnp.ndarray
    qwh: C
    phi: C
    phix: C
    phiy: C
    u: jnp.ndarray
    v: jnp.ndarray


class WaveState(NamedTuple):
    """Full model state (prognostic + carried derived + budgets + clock)."""

    t: jnp.ndarray
    tc: jnp.ndarray
    qh: C
    phih: C
    d: Derived
    Ke: jnp.ndarray
    Pw: jnp.ndarray
    Kw: jnp.ndarray


class StageSources(NamedTuple):
    k: jnp.ndarray   # dKe/dt source
    p: jnp.ndarray   # dPw/dt source
    a: jnp.ndarray   # dKw/dt source
    gamma1: jnp.ndarray
    gamma2: jnp.ndarray
    xi1: jnp.ndarray
    xi2: jnp.ndarray
    pi: jnp.ndarray
    ep_psi: jnp.ndarray
    chi_phi: jnp.ndarray
    ep_phi: jnp.ndarray


class WavePhysics:
    """Model-variant strategy: inversion + wave advection term."""

    name = "wave"
    zero_mean_jac_psi_phi = True
    # declarative capability flags (used by the batched fast kernel instead
    # of isinstance/class-name dispatch):
    #   has_wave_pv       — the inversion carries a wave PV qwh
    #   subtracts_wave_pv — relative vorticity is q - qw
    #                       (``niwqg/CoupledModel.py:145-152``; others keep
    #                       q_psi = q, ``niwqg/Kernel.py:492-501``)
    has_wave_pv = False
    subtracts_wave_pv = False
    # reference UnCoupledModel quirk: phi gradients are refreshed only by
    # ``_calc_pe_niw`` (diagnostics every tdiags steps, status print every
    # twrite steps, set_phi) — never per stage (``niwqg/Kernel.py:608-611``;
    # UnCoupled's ``_invert`` at ``UnCoupledModel.py:54-64`` does not touch
    # them, unlike Coupled's ``jacobian_phic_phi``)
    stale_phi_gradients = False
    #   hermitian_ph      — the inversion Hermitian-projects ph (the
    #                       reference's ``fft(real(ifft(...)))`` sandwich,
    #                       ``CoupledModel.py:91-94``); QL keeps ph raw
    #                       (``QLModel.py:86``). Matters at the unpaired
    #                       Nyquist modes, which mean-flow advection
    #                       rotates off the Hermitian subspace.
    #   advect_by_vortex_flow — waves advected by the vortex-part
    #                       velocities only (quasilinear, ``QLModel.py:54-67``)
    hermitian_ph = True
    advect_by_vortex_flow = False
    #   wave_pv_imag_jac  — reference QL transcription bug: the wave-PV
    #                       Jacobian term enters as ``1j*jach``
    #                       (``niwqg/QLModel.py:83``)
    #   stale_q_psi       — reference QL never updates ``self.q`` inside
    #                       ``_invert`` (``QLModel.py:69-88``, unlike
    #                       ``CoupledModel.py:97``), so ``_calc_rel_vorticity``
    #                       (``Kernel.py:492-501``) pins ``q_psi`` to the
    #                       INITIAL vorticity from ``set_q`` forever; the
    #                       advection Jacobian is unaffected (it recomputes
    #                       ``q = ifft(qh).real`` locally, ``Kernel.py:481``)
    wave_pv_imag_jac = False
    stale_q_psi = False
    #   jac_reads_updated_qh — reference QL stage-ordering quirk: the
    #                       mutable stepper updates ``self.qh`` BEFORE
    #                       calling ``jacobian_psi_phi`` (e.g.
    #                       ``niwqg/Kernel.py:347`` updates, ``:350``
    #                       consumes), and QL's quasilinear Jacobian reads
    #                       ``self.qh`` for its vortex velocities
    #                       (``QLModel.py:65-66``) — so the wave advection
    #                       sees the *just-updated* qh of the current
    #                       stage, not the stage input. Only QL physics
    #                       reads qh there, so only QL carries the skew.
    jac_reads_updated_qh = False

    def invert(self, K: "WaveKernel", qh: C, phih: C, phi: C) -> Derived:
        raise NotImplementedError

    def jac_psi_phi(self, K: "WaveKernel", D: Derived, qh: C) -> C:
        """Default: J(psi, phi) advection by the full geostrophic flow
        (``niwqg/Kernel.py:457-469``)."""
        return spectral.jacobian_psi_phi_hat(
            K.tr, D.u, D.v, D.phix, D.phiy, zero_mean=self.zero_mean_jac_psi_phi
        )


class WaveKernel:
    """Static configuration + pure step/diagnostic functions."""

    def __init__(self, params: KernelParams, physics: WavePhysics,
                 dtype=np.float64, backend: str = "auto", precision: str = "auto",
                 transform=None, transform_opts=None):
        self.params = params
        self.physics = physics
        self.dtype = np.dtype(dtype)
        self.grid = Grid(
            nx=params.nx, L=params.L, dtype=self.dtype, spectrum="full",
            use_filter=params.use_filter, dealias=params.dealias,
        ).materialize()
        if transform is not None:
            self.tr = transform
        else:
            self.tr = make_transform(params.nx, self.dtype, backend,
                                     precision=precision,
                                     **(transform_opts or {}))
        # ETDRK4 tables for the q- and phi-equations
        p = params
        self.coefs_q = build_coefs(
            self.grid, linear_operator_q(self.grid, p.U, p.nu4, p.nu, p.mu), p.dt
        )
        self.coefs_w = build_coefs(
            self.grid,
            linear_operator_phi(self.grid, p.U, p.f, p.kappa2, p.nu4w, p.nuw, p.muw),
            p.dt,
        )
        # q-side layout indirection: the faithful kernel keeps the q/psi
        # side on the same full-spectrum layout as phi, so these aliases
        # are identities here. The batched fast kernel's ``q_half`` mode
        # rebinds them to the rfft half-spectrum (tables sliced from the
        # full grid so the retained columns — including the reference's
        # negative-Nyquist convention — are bitwise identical).
        self.qtab = self.grid          # wavenumber/filter tables, q side
        self._flt_q = self.grid.filtr  # step-stage filter, q equation
        self._flt_w = self.grid.filtr  # step-stage filter, phi equation
        self._fwd_real = self.tr.fft2_real   # real field -> q-side layout
        self._inv_real = self.tr.ifft2_real  # q-side layout -> real field
        self._qdeg = None  # Hermitian-degeneracy weights (half mode only)
        # l table for q-side y-derivatives (i*l*zh). In half mode the
        # Nyquist row's interior columns are zeroed: an l-derivative of a
        # Hermitian spectrum is PURELY anti-Hermitian there (pair
        # (ny/2, j)<->(ny/2, nx-j) has z2 = -conj(z1)), so its half-layout
        # Hermitian representative is exactly 0 — matching what the
        # reference's real(ifft(.)) readout computes. Even powers of l
        # (e.g. the strain's l^2) keep the plain table.
        self._l_dy = self.grid.l

    # ------------------------------------------------------------------
    # scalars
    # ------------------------------------------------------------------
    def _s(self, x) -> jnp.ndarray:
        return jnp.asarray(x, dtype=self.dtype)

    @property
    def _drop_p(self) -> bool:
        """Whether the carried state omits the physical streamfunction
        (the fast kernel's spectral-budget mode; None is a valid pytree
        leaf-slot so scan carries stay consistent)."""
        return False

    # ------------------------------------------------------------------
    # derived-state computation (invert + rel. vorticity + velocities)
    # ------------------------------------------------------------------
    def derive(self, qh: C, phih: C, prev: Optional[Derived] = None) -> Derived:
        phi = self.tr.ifft2(phih)
        D = self.physics.invert(self, qh, phih, phi)
        if self.physics.stale_phi_gradients and prev is not None:
            # bug-for-bug mode: keep the carried gradients (see
            # WavePhysics.stale_phi_gradients); refreshes happen only via
            # refresh_phi_gradients on the reference's cadence
            D = D._replace(phix=prev.phix, phiy=prev.phiy)
        if self.physics.stale_q_psi and prev is not None:
            # bug-for-bug QL mode: q_psi frozen at the set_q value (see
            # WavePhysics.stale_q_psi)
            D = D._replace(q_psi=prev.q_psi)
        u, v = spectral.velocities(self.tr, self.grid, D.ph)
        return D._replace(u=u, v=v)

    def refresh_phi_gradients(self, s: WaveState) -> WaveState:
        """The state mutation hidden inside the reference's
        ``_calc_pe_niw`` (``niwqg/Kernel.py:608-611``)."""
        phix, phiy = spectral.gradients(self.tr, self.grid, s.phih)
        return s._replace(d=s.d._replace(phix=phix, phiy=phiy))

    # ------------------------------------------------------------------
    # per-stage computation: budget sources + nonlinear terms
    # ------------------------------------------------------------------
    def stage_sources(self, qh: C, phih: C, D: Derived) -> StageSources:
        """Energy conversion & dissipation sources
        (``niwqg/Kernel.py:629-701``), evaluated on the carried state."""
        g, tr = self.grid, self.tr
        lapphi = tr.ifft2(phih * (-g.wv2))
        lap2phi = tr.ifft2(phih * g.wv4)
        lap2psi = tr.ifft2_real(D.ph * g.wv4)
        lapq = tr.ifft2_real(qh * (-g.wv2))
        lphix = tr.ifft2(mul_i(phih, -g.k * g.wv2))
        lphiy = tr.ifft2(mul_i(phih, -g.l * g.wv2))
        return self.sources_from_fields(D, lapphi, lap2phi, lphix, lphiy,
                                        lap2psi, lapq)

    def sources_from_fields(self, D: Derived, lapphi: C, lap2phi: C,
                            lphix: C, lphiy: C, lap2psi, lapq) -> StageSources:
        """Budget-source formulas on precomputed derived fields
        (``niwqg/Kernel.py:629-701``); shared by the faithful and the
        batched fast kernels."""
        p = self.params
        phi, phix, phiy, q_psi = D.phi, D.phix, D.phiy, D.q_psi

        # NOTE: keep C operands on the LEFT of mixed products — a jax array
        # on the left relies on jax returning NotImplemented for the C
        # NamedTuple, which is version-fragile (see carray.py module note).
        J_psi_phi = phix * D.u + phiy * D.v
        diss_phi = -p.nu4w * lap2phi + p.nuw * lapphi - p.muw * phi
        J_diss_phi = -(diss_phi * J_psi_phi.conj()).im
        L_diss_phi = 0.5 * (diss_phi * phi.conj()).re * q_psi
        divFw = 0.5 * p.hslash * (phi.conj() * lapphi).im

        gamma1 = (0.5 * q_psi * divFw).mean() / p.f
        gamma2 = 0.5 * p.hslash * ((lapphi.conj() * J_psi_phi).re).mean() / p.f
        xi1 = J_diss_phi.mean() / p.f
        xi2 = L_diss_phi.mean() / p.f
        pi = (0.5 * phi.mean() * (phi.conj() * q_psi).mean()).im

        # ep_psi (``niwqg/Kernel.py:635-640``). It reads ``self.q``, which
        # QL's ``_invert`` never refreshes (stale_q_psi) — there the frozen
        # field is exactly q_psi; all other physics keep self.q fresh.
        q_eps = q_psi if self.physics.stale_q_psi else D.q
        ep_psi = (
            p.nu4 * (q_eps * lap2psi).mean()
            - p.nu * (D.p * lapq).mean()
            + p.mu * (D.p * q_eps).mean()
        )

        # chi_phi (``niwqg/Kernel.py:646-652``)
        k2 = p.kappa2
        chi_phi = (
            -0.5 * p.nu4w * (lphix.abs2() + lphiy.abs2()).mean() / k2
            - 0.5 * p.nuw * lapphi.abs2().mean() / k2
            - 0.5 * p.muw * (phix.abs2() + phiy.abs2()).mean() / k2
        )

        # ep_phi (``niwqg/Kernel.py:629-633``)
        ep_phi = (
            -p.nu4w * lapphi.abs2().mean()
            - p.nuw * (phix.abs2() + phiy.abs2()).mean()
            - p.muw * phi.abs2().mean()
        )

        k_src = -(gamma1 + gamma2) + (xi1 + xi2) + ep_psi
        p_src = gamma1 + gamma2 + chi_phi
        a_src = ep_phi
        return StageSources(k_src, p_src, a_src, gamma1, gamma2, xi1, xi2, pi,
                            ep_psi, chi_phi, ep_phi)

    def nonlinear(self, qh: C, D: Derived):
        """RHS nonlinear terms Fn (q-eq) and Fnw (phi-eq)
        (``niwqg/Kernel.py:326,332``)."""
        g = self.grid
        jacq = spectral.jacobian_psi_q_hat(self.tr, g, D.u, D.v, D.q)
        Fn = -jacq
        jacw = self.physics.jac_psi_phi(self, D, qh)
        refr = jmul(self.tr.fft2(D.phi * D.q_psi), 0.5)  # 0.5j*fft(phi*q_psi)
        Fnw = -jacw - refr
        return Fn, Fnw

    def zero_sources(self) -> StageSources:
        z = self._s(0.0)
        return StageSources(*([z] * len(StageSources._fields)))

    def stage_terms(self, qh: C, phih: C, D: Derived, want_sources: bool):
        """One stage's RHS nonlinear terms plus (optionally) its budget
        sources. Hook point: the batched fast kernel overrides this to
        share the nonlinear-term transforms with the spectral (Parseval)
        source evaluation."""
        src = (self.stage_sources(qh, phih, D) if want_sources
               else self.zero_sources())
        Fn, Fnw = self.nonlinear(qh, D)
        return Fn, Fnw, src

    # ------------------------------------------------------------------
    # one ETDRK4 step (``niwqg/Kernel.py:307-398``)
    # ------------------------------------------------------------------
    @staticmethod
    def _mulf(x, f):
        """Stage filter multiply; ``f=None`` means the filter is folded
        into the ETDRK4 tables (FastWaveKernel ``fold_filter``) and the
        explicit pass is skipped."""
        return x if f is None else x * f

    def step(self, s: WaveState) -> WaveState:
        cq, cw = self.coefs_q, self.coefs_w
        fq, fw = self._flt_q, self._flt_w
        mulf = self._mulf
        dt = self._s(self.params.dt)
        want = self.params.compute_budgets

        # QL stage-ordering quirk: the reference updates qh before the
        # wave Jacobian reads it (WavePhysics.jac_reads_updated_qh) — the
        # skewed Fnw replaces the stage-input one everywhere it is reused
        skew = self.physics.jac_reads_updated_qh
        reFnw = (lambda qh_new, D_: self.nonlinear(qh_new, D_)[1])

        # -- stage 1 (sources from carried state)
        Fn0, Fn0w, src1 = self.stage_terms(s.qh, s.phih, s.d, want)
        qh0, phih0 = s.qh, s.phih
        qh = mulf(cq.expch_h * qh0 + Fn0 * cq.Qh, fq)
        if skew:
            Fn0w = reFnw(qh, s.d)
        phih = mulf(cw.expch_h * phih0 + Fn0w * cw.Qh, fw)
        qh1, phih1 = qh, phih
        D = self.derive(qh, phih, s.d)

        # -- stage 2
        Fna, Fnaw, src2 = self.stage_terms(qh, phih, D, want)
        qh = mulf(cq.expch_h * qh0 + Fna * cq.Qh, fq)
        if skew:
            Fnaw = reFnw(qh, D)
        phih = mulf(cw.expch_h * phih0 + Fnaw * cw.Qh, fw)
        D = self.derive(qh, phih, D)

        # -- stage 3
        Fnb, Fnbw, src3 = self.stage_terms(qh, phih, D, want)
        qh = mulf(cq.expch_h * qh1 + (2.0 * Fnb - Fn0) * cq.Qh, fq)
        if skew:
            Fnbw = reFnw(qh, D)
        phih = mulf(cw.expch_h * phih1 + (2.0 * Fnbw - Fn0w) * cw.Qh, fw)
        D = self.derive(qh, phih, D)

        # -- stage 4 + final combination
        Fnc, Fncw, src4 = self.stage_terms(qh, phih, D, want)
        qh = mulf(cq.expch * qh0 + Fn0 * cq.f0 + 2.0 * (Fna + Fnb) * cq.fab
                   + Fnc * cq.fc, fq)
        if skew:
            Fncw = reFnw(qh, D)
        phih = mulf(cw.expch * phih0 + Fn0w * cw.f0
                     + 2.0 * (Fnaw + Fnbw) * cw.fab + Fncw * cw.fc, fw)

        if self.params.compute_budgets:
            Ke = s.Ke + dt * (src1.k + 2.0 * (src2.k + src3.k) + src4.k) / 6.0
            Pw = s.Pw + dt * (src1.p + 2.0 * (src2.p + src3.p) + src4.p) / 6.0
            Kw = s.Kw + dt * (src1.a + 2.0 * (src2.a + src3.a) + src4.a) / 6.0
        else:
            Ke, Pw, Kw = s.Ke, s.Pw, s.Kw

        D = self.derive(qh, phih, D)
        return WaveState(
            t=s.t + dt, tc=s.tc + 1, qh=qh, phih=phih, d=D, Ke=Ke, Pw=Pw, Kw=Kw
        )

    # ------------------------------------------------------------------
    # initialization (replicates set_q/set_phi ordering,
    # ``niwqg/Kernel.py:520-551``)
    # ------------------------------------------------------------------
    def zero_state(self) -> WaveState:
        shape = (self.grid.nl, self.grid.nk)
        z = C.zeros(shape, self.dtype)
        r = jnp.zeros(shape, self.dtype)
        D = Derived(ph=z, p=None if self._drop_p else r, q=r, q_psi=r,
                    qwh=z, phi=z, phix=z, phiy=z, u=r, v=r)
        zero = self._s(0.0)
        return WaveState(t=zero, tc=jnp.asarray(0, jnp.int32), qh=z, phih=z,
                         d=D, Ke=zero, Pw=zero, Kw=zero)

    def _cast_field(self, q):
        """Model-dtype cast that is also jit-traceable (the model shells
        queue set_* calls and flush them through one jitted apply)."""
        if not isinstance(q, jax.Array):
            q = np.asarray(q, dtype=self.dtype)
        return jnp.asarray(q).astype(self.dtype)

    def apply_set_q(self, s: WaveState, q) -> WaveState:
        """``set_q``: transform, invert with the *current* phi (zero right
        after construction — the reference quirk), compute Ke."""
        q = self._cast_field(q)
        qh = self.tr.fft2_real(q)
        D = self.physics.invert(self, qh, s.phih, s.d.phi)
        u, v = spectral.velocities(self.tr, self.grid, D.ph)
        # preserve the phi-gradients currently carried (set_phi provides them)
        D = D._replace(u=u, v=v, phix=s.d.phix, phiy=s.d.phiy, phi=s.d.phi)
        if self._drop_p:
            D = D._replace(p=None)
        Ke = self.ke_qg(D.ph)
        return s._replace(qh=qh, d=D, Ke=Ke)

    def apply_set_phi(self, s: WaveState, phi) -> WaveState:
        """``set_phi``: transform, compute Pw (which refreshes phix/phiy —
        the reference stores them, ``niwqg/Kernel.py:608-611``) and Kw."""
        if isinstance(phi, C):
            phi_c = phi.astype(self.dtype)
        else:  # eager-only convenience path (not jit-traceable)
            phi_np = np.asarray(phi)
            phi_c = C.from_complex(phi_np, dtype=self.dtype)
        phih = self.tr.fft2(phi_c)
        phix, phiy = spectral.gradients(self.tr, self.grid, phih)
        Pw = 0.25 * (phix.abs2() + phiy.abs2()).mean() / self.params.kappa2
        Kw = 0.5 * phi_c.abs2().mean()
        D = s.d._replace(phi=phi_c, phix=phix, phiy=phiy)
        return s._replace(phih=phih, d=D, Pw=Pw, Kw=Kw)

    # ------------------------------------------------------------------
    # energy / diagnostic scalars (``niwqg/Kernel.py:600-706``)
    # ------------------------------------------------------------------
    def spec_var(self, zh: C):
        """Variance of a q-side spectrum (layout-aware: the fast kernel's
        ``q_half`` mode sums with Hermitian-degeneracy weights)."""
        if self._qdeg is None:
            return self.grid.spec_var(zh)
        dens = zh.abs2() * self._qdeg
        dens = dens.at[0, 0].set(0.0)
        return dens.sum() / self._s(float(self.grid.M) ** 2)

    def ke_qg(self, ph: C):
        return 0.5 * self.spec_var(ph * self.qtab.wv)

    def ke_niw(self, phi: C):
        return 0.5 * phi.abs2().mean()

    def pe_niw(self, phih: C):
        phix, phiy = spectral.gradients(self.tr, self.grid, phih)
        return 0.25 * (phix.abs2() + phiy.abs2()).mean() / self.params.kappa2

    def cke_niw(self, phi: C):
        m = phi.mean()
        return 0.5 * m.abs2()

    def ens(self, q):
        return 0.5 * (q * q).mean()

    def conc_niw(self, phi: C, q_psi):
        ups = phi.abs2()
        ups = ups - ups.mean()
        return (ups * q_psi).mean() / jnp.std(ups) / jnp.std(q_psi)

    def skewness(self, q_psi):
        return (q_psi**3).mean() / ((q_psi**2).mean()) ** 1.5

    def chi_q(self, qh: C):
        return -self.params.nu4 * self.spec_var(qh * self.qtab.wv2)

    def cfl(self, s: WaveState):
        phimax = jnp.sqrt(s.d.phi.abs2().max())
        return spectral.cfl_number(s.d.u, s.d.v, phimax, self.params.dt,
                                   self.grid.dx)

    def strain(self, ph: C):
        """Geostrophic rate of strain (``niwqg/Kernel.py:503-509``)."""
        g = self.qtab
        pxx = self._inv_real(ph * (-g.k * g.k))
        pyy = self._inv_real(ph * (-g.l * g.l))
        # k*l is odd in l: use the y-derivative table (half-layout
        # Hermitian representative at the Nyquist row)
        pxy = self._inv_real(ph * (-g.k * self._l_dy))
        return 4.0 * pxy**2 + (pxx - pyy) ** 2

    def okubo_weiss(self, s: WaveState):
        """Okubo–Weiss parameter: squared strain minus squared relative
        vorticity. The reference's (never-called) ``_calc_OW`` squares the
        already-squared strain (``niwqg/Kernel.py:518``) — corrected here.
        """
        return self.strain(s.d.ph) - s.d.q_psi**2
