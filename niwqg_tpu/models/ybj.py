"""YBJ model: NIW phi evolving on a prescribed, frozen QG streamfunction.

Re-design of ``niwqg/YBJModel.py`` (Young & Ben Jelloul 1997): only the
phi-equation is stepped (``YBJModel.py:52-87``); ``q``, ``psi``, ``u``,
``v`` and ``q_psi`` are frozen at their ``set_q`` values; the inversion sets
``ph = -qh/wv2`` only (``YBJModel.py:141-146``); the wave Jacobian does not
zero the mean mode (``YBJModel.py:123-133``); no energy budgets are
integrated in the step (Ke/Pw/Kw stay at their initialisation values).

Reference quirk, reproduced when ``faithful_quirks=True`` (default): the
physical ``phi`` entering the refraction term is only refreshed at the *end*
of a step (``YBJModel.py:87``), so all four stages use the step-start
``phi`` while the gradients ``phix/phiy`` are recomputed per stage
(``YBJModel.py:64,70,75,81``). With ``faithful_quirks=False`` the refraction
uses the stage-consistent ``phi = ifft(phih)``.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from ..carray import C, jmul, mul_i, stack, unstack
from ..ops import spectral
from .kernel import Derived, KernelParams, WaveKernel, WavePhysics, WaveState


class YBJPhysics(WavePhysics):
    name = "YBJ Model (Steady QG flow)"
    zero_mean_jac_psi_phi = False

    def invert(self, K: WaveKernel, qh: C, phih: C, phi: C) -> Derived:
        g, tr = K.grid, K.tr
        ph = -(qh * g.wv2i)
        phix, phiy = spectral.gradients(tr, g, phih)
        q = tr.ifft2_real(qh)
        zero = jnp.zeros(qh.shape, qh.dtype)
        qwh = C.zeros(qh.shape, qh.dtype)
        return Derived(ph=ph, p=zero, q=q, q_psi=q, qwh=qwh, phi=phi,
                       phix=phix, phiy=phiy, u=q, v=q)


class YBJKernel(WaveKernel):
    """Wave-only ETDRK4 stepper on a frozen flow."""

    def __init__(self, params: KernelParams, faithful_quirks: bool = True,
                 dtype=np.float64, backend: str = "auto", precision: str = "auto",
                 transform=None, transform_opts=None,
                 fold_filter: bool = False):
        super().__init__(params, YBJPhysics(), dtype=dtype, backend=backend,
                         precision=precision, transform=transform,
                         transform_opts=transform_opts)
        self.faithful_quirks = faithful_quirks
        # pre-multiply the stage filter into the phi-equation tables
        # (pure reassociation; see FastWaveKernel.fold_filter)
        self.fold_filter = bool(fold_filter)
        if self.fold_filter:
            from ..etdrk4 import fold_filter_into

            self.coefs_w = fold_filter_into(self.coefs_w, self.grid.filtr)

    def _ybj_nonlinear(self, phih: C, s: WaveState):
        """-J(psi,phi)hat - 0.5j*fft(phi*q_psi) with frozen u,v,q_psi.

        Transforms are batched (leading-axis stacking) so each stage issues
        one inverse and one forward call — on the MXU matmul-DFT path the
        flattened matmuls are ~2-3x larger than per-field calls."""
        g, tr = self.grid, self.tr
        if self.faithful_quirks:
            # the physical phi entering refraction is only refreshed at the
            # END of a step (``YBJModel.py:87``): stages use the carried one
            grads = tr.ifft2(stack([mul_i(phih, g.k), mul_i(phih, g.l)]))
            phix, phiy = unstack(grads, 2)
            phi = s.d.phi
        else:
            b = tr.ifft2(stack([phih, mul_i(phih, g.k), mul_i(phih, g.l)]))
            phi, phix, phiy = unstack(b, 3)
        nl = tr.fft2(stack([phix * s.d.u + phiy * s.d.v,
                            phi * s.d.q_psi]))
        jacw, refr = unstack(nl, 2)
        # no mean-mode zeroing (``YBJModel.py:123-133``)
        return -jacw - jmul(refr, 0.5)

    def step(self, s: WaveState) -> WaveState:
        cw = self.coefs_w
        flt = None if self.fold_filter else self.grid.filtr
        mulf = self._mulf
        dt = self._s(self.params.dt)

        phih0 = s.phih
        Fn0w = self._ybj_nonlinear(phih0, s)
        phih = mulf(cw.expch_h * phih0 + Fn0w * cw.Qh, flt)
        phih1 = phih

        Fnaw = self._ybj_nonlinear(phih, s)
        phih = mulf(cw.expch_h * phih0 + Fnaw * cw.Qh, flt)

        Fnbw = self._ybj_nonlinear(phih, s)
        phih = mulf(cw.expch_h * phih1 + (2.0 * Fnbw - Fn0w) * cw.Qh, flt)

        Fncw = self._ybj_nonlinear(phih, s)
        phih = mulf(cw.expch * phih0 + Fn0w * cw.f0
                     + 2.0 * (Fnaw + Fnbw) * cw.fab + Fncw * cw.fc, flt)

        phi = self.tr.ifft2(phih)
        phix, phiy = spectral.gradients(self.tr, self.grid, phih)
        D = s.d._replace(phi=phi, phix=phix, phiy=phiy)
        return s._replace(t=s.t + dt, tc=s.tc + 1, phih=phih, d=D)

    def apply_set_q(self, s: WaveState, q) -> WaveState:
        """Frozen-flow setup (``Kernel.set_q`` with YBJ ``_invert``)."""
        q = self._cast_field(q)
        qh = self.tr.fft2_real(q)
        ph = -(qh * self.grid.wv2i)
        u, v = spectral.velocities(self.tr, self.grid, ph)
        D = s.d._replace(ph=ph, q=q, q_psi=q, u=u, v=v)
        Ke = self.ke_qg(ph)
        return s._replace(qh=qh, d=D, Ke=Ke)
