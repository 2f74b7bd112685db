"""Standalone barotropic QG model with beta and an optional passive scalar.

Re-design of ``niwqg/QGModel.py`` on the shared spectral substrate — the
reference implements this as a copy-paste fork of ``Kernel`` (SURVEY.md §1
wart); here it is the same grid/transform/ETDRK4 machinery in the
half-spectrum (real-FFT) layout ``nk = nx//2+1`` (``QGModel.py:244-249``).

Faithfulness notes:
  - the stage structure follows ``QGModel.py:328-408``: budget sources
    ``k1..k4`` are evaluated *after* each stage's inversion (unlike the wave
    kernel, which samples before the update), and ``k1..k3`` use the stale
    physical ``q`` from the step start while ``k4`` uses the fresh one;
  - the passive-scalar variance budget ``cvar`` integrates stage sources
    ``c1..c4`` with RK4 weights (``QGModel.py:345-394``);
  - ``_calc_ep_c``/``_calc_chi_c`` use the *vorticity* diffusivity
    ``self.nu`` in their middle term (``QGModel.py:597,603``) — reproduced
    literally (it only matters when ``nu != 0``);
  - the QG Jacobian does not zero the spectral mean mode
    (``QGModel.py:469-481``), unlike the wave kernel's.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..carray import C, mul_i, stack
from ..etdrk4 import (build_coefs, linear_operator_c, linear_operator_q)
from ..grid import Grid
from ..ops.fft import make_transform


@dataclasses.dataclass(frozen=True)
class QGParams:
    """Reference defaults, ``niwqg/QGModel.py:65-91``."""

    nx: int = 128
    L: float = 5e5
    dt: float = 10000.0
    tmax: float = 250000.0
    twrite: int = 1000
    cflmax: float = 0.5
    U: float = 0.0
    beta: float = 0.0
    nu4: float = 5.0e9
    nu: float = 0.0
    mu: float = 0.0
    passive_scalar: bool = False
    nu4c: float = 5.0e9
    nuc: float = 0.0
    muc: float = 0.0
    use_filter: bool = True
    dealias: bool = False
    tdiags: int = 10
    tsave_snapshots: int = 10
    # evaluate the quadratic budget means (ep_psi, ep_c, chi_c, Gamma_c)
    # spectrally via Parseval (``Grid.spec_cross``/``spec_var``): exact
    # re-associations of the physical-space means of ``QGModel.py:588-604``
    # that need ZERO transforms, vs 2 inverse transforms per stage for
    # ep_psi plus 3 inverse + 2 forward per stage for the scalar budget.
    spectral_budgets: bool = True


class QGState(NamedTuple):
    t: jnp.ndarray
    tc: jnp.ndarray
    qh: C
    ch: C
    ph: C
    p: jnp.ndarray
    q: jnp.ndarray
    c: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    Ke: jnp.ndarray
    cvar: jnp.ndarray


class QGKernel:
    """Static config + pure step for the standalone QG model."""

    def __init__(self, params: QGParams, dtype=np.float64,
                 backend: str = "auto", precision: str = "auto",
                 transform=None, spectrum: str = "half",
                 transform_opts=None, fold_filter: bool = False):
        self.params = params
        self.dtype = np.dtype(dtype)
        self.spectrum = spectrum
        if transform is not None:
            self.tr = transform
        else:
            self.tr = make_transform(params.nx, self.dtype, backend,
                                     precision=precision,
                                     **(transform_opts or {}))
        # the distributed pencil rfft pads the spectral column count up to
        # a multiple of the mesh size; the grid mirrors that layout
        pad = getattr(self.tr, "rfft_pad", 0) if spectrum == "half" else 0
        self.grid = Grid(
            nx=params.nx, L=params.L, dtype=self.dtype, spectrum=spectrum,
            use_filter=params.use_filter, dealias=params.dealias, pad=pad,
        ).materialize()
        # half-spectrum (rfft, the reference layout) or full-spectrum
        # (needed by the distributed pencil transform)
        if spectrum == "half":
            self._fwd, self._bwd = self.tr.rfft2, self.tr.irfft2
        else:
            self._fwd, self._bwd = self.tr.fft2_real, self.tr.ifft2_real
        p = params
        self.coefs_q = build_coefs(
            self.grid,
            linear_operator_q(self.grid, p.U, p.nu4, p.nu, p.mu, beta=p.beta),
            p.dt,
        )
        self.coefs_c = build_coefs(
            self.grid, linear_operator_c(self.grid, p.nu4c, p.nuc, p.muc), p.dt
        ) if p.passive_scalar else None
        # pre-multiply the stage filter into the ETDRK4 tables and skip
        # the explicit per-stage ``* filtr`` pass — pure reassociation
        # (see FastWaveKernel.fold_filter). Measured 3.4% SLOWER for the
        # QG step at 2048^2 (49.52 -> 47.86 steps/s same-process,
        # sweep_qgybj_r4.log) even though it reads fewer tables — the
        # shared filtr read across the q/c equations evidently schedules
        # better than per-equation filtered copies. Default OFF here;
        # the coupled fast kernel keeps it ON (+3.3% there).
        self.fold_filter = bool(fold_filter)
        if self.fold_filter:
            from ..etdrk4 import fold_filter_into

            f = self.grid.filtr
            self.coefs_q = fold_filter_into(self.coefs_q, f)
            if self.coefs_c is not None:
                self.coefs_c = fold_filter_into(self.coefs_c, f)

    def _s(self, x):
        return jnp.asarray(x, dtype=self.dtype)

    # -- spectral helpers (half-spectrum layout) ---------------------------
    def spec_var(self, zh: C):
        return self.grid.spec_var(zh)

    def _velocities(self, ph: C):
        u = self._bwd(mul_i(ph, -self.grid.l))
        v = self._bwd(mul_i(ph, self.grid.k))
        return u, v

    def _jacobian_hat(self, u, v, field):
        """ik*rfft(u*f) + il*rfft(v*f) — no mean-mode zeroing
        (``QGModel.py:469-481``)."""
        g = self.grid
        return mul_i(self._fwd(u * field), g.k) + mul_i(
            self._fwd(v * field), g.l
        )

    def _invert(self, qh: C):
        ph = -(qh * self.grid.wv2i)
        p = self._bwd(ph)
        return ph, p

    def _invert_stage(self, qh: C):
        """Stage inversion: under ``spectral_budgets`` the physical ``p``
        is not consumed by anything between stages (ep_psi is spectral),
        so the inverse transform is skipped; the carried state's ``p`` is
        still produced by the final :meth:`_invert`."""
        if self.params.spectral_budgets:
            return -(qh * self.grid.wv2i), None
        return self._invert(qh)

    def ep_psi(self, q, p, qh: C, ph: C, qh_q: Optional[C] = None):
        """``QGModel.py:588-593``. The reference evaluates stages 1–3 with
        the STALE physical ``q`` from the step start and a fresh ``p`` —
        under ``spectral_budgets`` the stale pairing uses ``qh_q`` (the
        transform corresponding to ``q``) while the dissipation terms pair
        the fresh ``qh``/``ph``."""
        g, pr = self.grid, self.params
        if self.params.spectral_budgets:
            if qh_q is None:
                qh_q = qh
            # nu4 mean(q lap²ψ) + mu mean(p q): (qh_q, ph) pairings;
            # −nu mean(p lap q) = +nu Σ w wv2 Re(conj(qh) ph)/M²
            s = g.spec_cross(qh_q, ph * (pr.nu4 * g.wv4 + pr.mu))
            if pr.nu:
                s = s + pr.nu * g.spec_cross(qh, ph * g.wv2)
            return s
        lap2psi = self._bwd(ph * g.wv4)
        lapq = self._bwd(-(qh * g.wv2))
        return (
            pr.nu4 * (q * lap2psi).mean()
            - pr.nu * (p * lapq).mean()
            + pr.mu * (p * q).mean()
        )

    def ep_c_stage(self, ch: C):
        """Per-stage tracer-variance source (the only scalar-budget piece
        the step integrates, ``QGModel.py:345-394``): transform-free under
        ``spectral_budgets`` — all three terms are quadratic means."""
        if not self.params.spectral_budgets:
            C2, gradC2, lapc, _ = self._scalar_derived(ch, None, None, None)
            return self.ep_c(C2, gradC2, lapc)
        g, pr = self.grid, self.params
        C2 = self.spec_var(ch)
        gradC2 = self.spec_var(ch * g.wv)
        lapc2 = self.spec_var(ch * g.wv2)   # mean(lapc²): lapc is zero-mean
        return -2.0 * pr.nu4c * lapc2 - 2.0 * pr.nu * gradC2 \
            - 2.0 * pr.muc * C2

    def _scalar_derived(self, ch: C, u, v, c=None):
        """C2, gradC2, lapc (or its variance), Gamma_c
        (``QGModel.py:724-737``). Under ``spectral_budgets`` the third
        return is ``mean(lapc²)`` (what every consumer reduces ``lapc``
        to) and Gamma_c pairs the Jacobian transform with ``-wv2*ch``;
        ``c`` is then the carried physical field (no inverse transform)."""
        g = self.grid
        C2 = self.spec_var(ch)
        gradC2 = self.spec_var(ch * g.wv)
        if self.params.spectral_budgets:
            lapc2 = self.spec_var(ch * g.wv2)
            if u is None:
                return C2, gradC2, lapc2, None
            jac_c = self._jacobian_hat(u, v, c)
            Gamma_c = 2.0 * g.spec_cross(-(ch * g.wv2), jac_c)
            return C2, gradC2, lapc2, Gamma_c
        lapc = self._bwd(-(ch * g.wv2))
        if u is None:
            return C2, gradC2, lapc, None
        c = self._bwd(ch) if c is None else c
        jac_c = self._jacobian_hat(u, v, c)
        Gamma_c = 2.0 * (lapc * self._bwd(jac_c)).mean()
        return C2, gradC2, lapc, Gamma_c

    def ep_c(self, C2, gradC2, lapc):
        """``QGModel.py:595-598`` (middle term uses ``nu``, not ``nuc``).
        ``lapc`` is the physical field (physical mode) or ``mean(lapc²)``
        (spectral mode)."""
        pr = self.params
        lapc2 = lapc if jnp.ndim(lapc) == 0 else (lapc**2).mean()
        return -2.0 * pr.nu4c * lapc2 - 2.0 * pr.nu * gradC2 \
            - 2.0 * pr.muc * C2

    def chi_c(self, ch: C, gradC2, lapc):
        """``QGModel.py:600-604``."""
        g, pr = self.grid, self.params
        if self.params.spectral_budgets:
            # mean(lap²c lapc) = −Σ w wv2 wv4 |ch|²/M²; mean(lapc²) passed
            # through (or recomputed) as a spectral moment
            lapc2 = lapc if jnp.ndim(lapc) == 0 else self.spec_var(ch * g.wv2)
            cross = -g.spec_cross(ch * g.wv4, ch * g.wv2)
            return (2.0 * pr.nu4c * cross - 2.0 * pr.nu * lapc2
                    - 2.0 * pr.muc * gradC2)
        lap2c = self._bwd(ch * g.wv4)
        return (
            2.0 * pr.nu4c * (lap2c * lapc).mean()
            - 2.0 * pr.nu * (lapc**2).mean()
            - 2.0 * pr.muc * gradC2
        )

    def chi_q(self, qh: C):
        return -self.params.nu4 * self.spec_var(qh * self.grid.wv2)

    def ke_qg(self, ph: C):
        return 0.5 * self.spec_var(ph * self.grid.wv)

    # -- one ETDRK4 step (``QGModel.py:328-408``) --------------------------
    def _stage_rhs(self, ph: C, qh: C, ch: Optional[C]):
        """One stage's nonlinear terms with BATCHED transforms.

        Groups the reference's per-stage transforms — ``u``/``v`` from
        ``ph`` (``QGModel.py:479``), ``q = ifft(qh)`` (``:480``), and the
        scalar's ``c = ifft(ch)`` (``:494``) — into ONE inverse call, and
        the Jacobian products ``fft(u*q), fft(v*q)(, fft(u*c), fft(v*c))``
        (``:481,495``) into ONE forward call, so the matmul-DFT sees two
        large batched matmuls per stage instead of 5–7 single-field calls
        (same arithmetic per slice; the wave kernel already batches this
        way, ``fast_kernel.py``)."""
        g = self.grid
        specs = [mul_i(ph, -g.l), mul_i(ph, g.k), qh]
        if ch is not None:
            specs.append(ch)
        gb = self._bwd(stack(specs))
        u, v, q = gb[0], gb[1], gb[2]
        prods = [u * q, v * q]
        if ch is not None:
            c = gb[3]
            prods += [u * c, v * c]
        fj = self._fwd(jnp.stack(prods))
        jac_q = mul_i(fj[0], g.k) + mul_i(fj[1], g.l)
        jac_c = (mul_i(fj[2], g.k) + mul_i(fj[3], g.l)
                 if ch is not None else None)
        return jac_q, jac_c, u, v

    @staticmethod
    def _mulf(x, f):
        return x if f is None else x * f

    def step(self, s: QGState) -> QGState:
        pr = self.params
        cq = self.coefs_q
        flt = None if self.fold_filter else self.grid.filtr
        mulf = self._mulf
        dt = self._s(pr.dt)
        scalar = pr.passive_scalar

        # stage 1
        qh0, ch0 = s.qh, s.ch
        jac, jacc, u, v = self._stage_rhs(s.ph, s.qh, ch0 if scalar else None)
        Fn0 = -jac
        qh = mulf(cq.expch_h * qh0 + Fn0 * cq.Qh, flt)
        qh1 = qh
        if scalar:
            cc = self.coefs_c
            Fn0c = -jacc
            ch = mulf(cc.expch_h * ch0 + Fn0c * cc.Qh, flt)
            ch1 = ch
            c1 = self.ep_c_stage(ch)
        else:
            ch = ch0
        ph, p = self._invert_stage(qh)
        k1 = self.ep_psi(s.q, p, qh, ph, qh_q=s.qh)

        # stage 2
        jac, jacc, u, v = self._stage_rhs(ph, qh, ch if scalar else None)
        Fna = -jac
        qh = mulf(cq.expch_h * qh0 + Fna * cq.Qh, flt)
        if scalar:
            Fnac = -jacc
            ch = mulf(cc.expch_h * ch0 + Fnac * cc.Qh, flt)
            c2 = self.ep_c_stage(ch)
        ph, p = self._invert_stage(qh)
        k2 = self.ep_psi(s.q, p, qh, ph, qh_q=s.qh)

        # stage 3
        jac, jacc, u, v = self._stage_rhs(ph, qh, ch if scalar else None)
        Fnb = -jac
        qh = mulf(cq.expch_h * qh1 + (2.0 * Fnb - Fn0) * cq.Qh, flt)
        if scalar:
            Fnbc = -jacc
            ch = mulf(cc.expch_h * ch1 + (2.0 * Fnbc - Fn0c) * cc.Qh, flt)
            c3 = self.ep_c_stage(ch)
        ph, p = self._invert_stage(qh)
        k3 = self.ep_psi(s.q, p, qh, ph, qh_q=s.qh)

        # stage 4 + final combination
        jac, jacc, u, v = self._stage_rhs(ph, qh, ch if scalar else None)
        Fnc = -jac
        qh = mulf(cq.expch * qh0 + Fn0 * cq.f0 + 2.0 * (Fna + Fnb) * cq.fab
                   + Fnc * cq.fc, flt)
        cvar = s.cvar
        if scalar:
            Fncc = -jacc
            ch = mulf(cc.expch * ch0 + Fn0c * cc.f0
                       + 2.0 * (Fnac + Fnbc) * cc.fab + Fncc * cc.fc, flt)
            c4 = self.ep_c_stage(ch)
            cvar = s.cvar + dt * (c1 + 2.0 * (c2 + c3) + c4) / 6.0

        # final inversion + physical fields (one batched inverse call)
        ph = -(qh * self.grid.wv2i)
        finals = [ph, qh] + ([ch] if scalar else [])
        fb = self._bwd(stack(finals))
        p, q = fb[0], fb[1]
        cphys = fb[2] if scalar else s.c
        k4 = self.ep_psi(q, p, qh, ph)
        Ke = s.Ke + dt * (k1 + 2.0 * (k2 + k3) + k4) / 6.0

        return QGState(t=s.t + dt, tc=s.tc + 1, qh=qh, ch=ch, ph=ph, p=p,
                       q=q, c=cphys, u=u, v=v, Ke=Ke, cvar=cvar)

    # -- initialization ----------------------------------------------------
    def zero_state(self) -> QGState:
        shape_r = (self.grid.ny, self.grid.nx)
        shape_h = (self.grid.nl, self.grid.nk)
        z = C.zeros(shape_h, self.dtype)
        r = jnp.zeros(shape_r, self.dtype)
        zero = self._s(0.0)
        return QGState(t=zero, tc=jnp.asarray(0, jnp.int32), qh=z, ch=z,
                       ph=z, p=r, q=r, c=r, u=r, v=r, Ke=zero, cvar=zero)

    def _cast_field(self, q):
        """Model-dtype cast that is also jit-traceable (the model shell
        queues set_* calls and flushes them through one jitted apply)."""
        if not isinstance(q, jax.Array):
            q = np.asarray(q, dtype=self.dtype)
        return jnp.asarray(q).astype(self.dtype)

    def apply_set_q(self, s: QGState, q) -> QGState:
        """``QGModel.set_q`` (``QGModel.py:507-520``)."""
        q = self._cast_field(q)
        qh = self._fwd(q)
        ph, p = self._invert(qh)
        Ke = self.ke_qg(ph)
        return s._replace(qh=qh, ph=ph, p=p, q=q, Ke=Ke)

    def apply_set_c(self, s: QGState, c) -> QGState:
        """``QGModel.set_c`` (``QGModel.py:522-534``; the reference relied
        on numpy's silent imag-discard in ``rfft2(complex)``)."""
        if not isinstance(c, jax.Array):
            c = np.real(np.asarray(c)).astype(self.dtype)
        c = jnp.real(jnp.asarray(c)).astype(self.dtype)
        ch = self._fwd(c)
        cvar = self.spec_var(ch)
        return s._replace(ch=ch, c=c, cvar=cvar)

    def cfl(self, s: QGState):
        u, v = self._velocities(s.ph)
        m = jnp.maximum(jnp.abs(u).max(), jnp.abs(v).max())
        return m * self.params.dt / (self.grid.dx)
