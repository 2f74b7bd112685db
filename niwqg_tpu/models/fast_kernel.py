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
    the round-1 two-for-one *pair* packing, whose cross-field unpack
    leaked ``eps*||big||`` noise between paired fields and NaN'd a
    100-step 4096² f32 run once the k² wave-PV factors amplified it.

Agrees with the faithful kernel to rounding error (f64 CPU: ~1e-12 over
multiple steps; asserted in ``tests/test_fast_kernel.py``). This is a
*re-association* of the reference arithmetic, not a different scheme.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..carray import C, jmul, mul_i, stack, unstack
from ..ops import spectral
from .kernel import Derived, StageSources, WaveKernel
from .ql import QLPhysics


class FastWaveKernel(WaveKernel):
    """Batched-transform wave kernel (Coupled / UnCoupled / QL physics)."""

    # ------------------------------------------------------------------
    def derive(self, qh: C, phih: C, prev=None) -> Derived:
        g, tr, p = self.grid, self.tr, self.params

        pg = tr.ifft2(stack([phih, mul_i(phih, g.k), mul_i(phih, g.l)]))
        phi, phix, phiy = unstack(pg, 3)
        if self.physics.stale_phi_gradients and prev is not None:
            phix, phiy = prev.phix, prev.phiy

        if self.physics.has_wave_pv:
            z = phix.conj() * phiy - phiy.conj() * phix
            fj = tr.fft2_real(jnp.stack([phi.abs2(), jmul(z).re]))
            gphi2h = fj[0] * (-g.wv2)
            jach = spectral.zero_mean_mode(fj[1])
            qwh = ((0.5 * gphi2h + jach) * 0.5 / p.f) * g.filtr
        else:
            qwh = C.zeros(qh.shape, qh.dtype)

        ph = -((qh - qwh) * g.wv2i)
        if not isinstance(self.physics, QLPhysics):
            # Coupled/UnCoupled invert through a fft(real(ifft(.)))
            # sandwich (``CoupledModel.py:91-94``, ``UnCoupledModel.py:60-61``)
            # = Hermitian projection; QL keeps ph unprojected
            # (``QLModel.py:86``)
            ph = spectral.hermitian_project(ph)
        qpsi_h = (qh - qwh) if self.physics.subtracts_wave_pv else qh
        gb = tr.ifft2_real(stack([ph, mul_i(ph, -g.l), mul_i(ph, g.k), qh,
                                  qpsi_h]))
        p_, u, v, q, q_psi = (gb[i] for i in range(5))
        return Derived(ph=ph, p=p_, q=q, q_psi=q_psi, qwh=qwh, phi=phi,
                       phix=phix, phiy=phiy, u=u, v=v)

    # ------------------------------------------------------------------
    def stage_sources(self, qh: C, phih: C, D: Derived) -> StageSources:
        g, tr = self.grid, self.tr
        batch = tr.ifft2(stack([
            phih * (-g.wv2),                 # lapphi
            phih * g.wv4,                    # lap2phi
            mul_i(phih, -g.k * g.wv2),       # lphix
            mul_i(phih, -g.l * g.wv2),       # lphiy
        ]))
        lapphi, lap2phi, lphix, lphiy = unstack(batch, 4)
        rb = tr.ifft2_real(stack([D.ph * g.wv4, qh * (-g.wv2)]))
        lap2psi, lapq = rb[0], rb[1]
        return self.sources_from_fields(D, lapphi, lap2phi, lphix, lphiy,
                                        lap2psi, lapq)

    # ------------------------------------------------------------------
    def nonlinear(self, qh: C, D: Derived):
        g, tr = self.grid, self.tr
        if isinstance(self.physics, QLPhysics):
            ph_q = -(qh * g.wv2i)
            uv = tr.ifft2_real(stack([mul_i(ph_q, -g.l), mul_i(ph_q, g.k)]))
            adv_u, adv_v = uv[0], uv[1]
        else:
            adv_u, adv_v = D.u, D.v

        uvqh = tr.fft2_real(jnp.stack([D.u * D.q, D.v * D.q]))
        nlc = tr.fft2(stack([
            D.phix * adv_u + D.phiy * adv_v,
            D.phi * D.q_psi,
        ]))
        jacwh, refrh = unstack(nlc, 2)
        jacq = spectral.zero_mean_mode(mul_i(uvqh[0], g.k)
                                       + mul_i(uvqh[1], g.l))
        Fn = -jacq
        if self.physics.zero_mean_jac_psi_phi:
            jacwh = spectral.zero_mean_mode(jacwh)
        Fnw = -jacwh - jmul(refrh, 0.5)
        return Fn, Fnw
