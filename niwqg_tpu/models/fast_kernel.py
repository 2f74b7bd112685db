"""Batched fast wave kernel — the TPU execution path.

Same ETDRK4 stage structure, budget integration and physics as
:class:`~niwqg_tpu.models.kernel.WaveKernel`, re-organised for the MXU:

  - every stage's inverse transforms are grouped into a few *batched*
    transform calls (leading-axis stacking), so the matmul-DFT sees large
    flattened matmuls instead of ~22 individual transforms;
  - the elliptic inversion stays in spectral space:
    ``ph = -(qh - qwh)/wv2`` — the reference's
    ``fft(real(ifft(...)))`` sandwich (``CoupledModel.py:91-94``) is an
    Hermitian projection that is the identity here because ``q`` and the
    wave PV are real, so three transforms per stage vanish.

Agrees with the faithful kernel to rounding error (f64 CPU: ~1e-12 over
multiple steps; asserted in ``tests/test_fast_kernel.py``). This is a
*re-association* of the reference arithmetic, not a different scheme.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..carray import C, jmul, mul_i, stack, unstack
from ..ops import spectral
from .kernel import Derived, StageSources, WaveKernel, WaveState
from .ql import QLPhysics
from .uncoupled import UnCoupledPhysics


class FastWaveKernel(WaveKernel):
    """Batched-transform wave kernel (Coupled / UnCoupled / QL physics).

    Real-field two-for-one packing (``pack_min_nx``) trades transform
    slices for Hermitian-projection flips/rolls: measured +28% at 2048²
    (4.77 vs 3.71 steps/s) but -20% at 512². DISABLED by default pending a
    stability investigation: a 100-step 4096² f32 run went NaN with
    packing enabled where the unpacked kernel holds budget closure at
    2.6e-5 — prime suspect is forward-unpack crosstalk (the Hermitian
    separation of fft(x+iy) leaks ~transform-error × ||x|| between the
    pair, injecting correlated high-k noise each stage). f64 agreement
    with the faithful kernel is verified either way; the issue is
    f32-at-scale. Set ``pack_min_nx = 1024`` to re-enable.
    """

    pack_min_nx = None  # disabled pending f32-at-scale stability work

    @property
    def _pack(self) -> bool:
        return (self.pack_min_nx is not None
                and self.params.nx >= self.pack_min_nx)

    def _has_wave_pv(self) -> bool:
        return not isinstance(self.physics, UnCoupledPhysics)

    def _subtracts_wave_pv(self) -> bool:
        # only the coupled model's relative vorticity is q - qw
        # (``CoupledModel.py:145-152``); UnCoupled/QL keep q_psi = q
        # (``Kernel.py:492-501``)
        return type(self.physics).__name__ == "CoupledPhysics"

    # ------------------------------------------------------------------
    def derive(self, qh: C, phih: C) -> Derived:
        g, tr, p = self.grid, self.tr, self.params

        pg = tr.ifft2(stack([phih, mul_i(phih, g.k), mul_i(phih, g.l)]))
        phi, phix, phiy = unstack(pg, 3)

        if self._has_wave_pv():
            z = phix.conj() * phiy - phiy.conj() * phix
            if self._pack:
                # two real forward transforms packed into one (two-for-one)
                packed = tr.fft2(spectral.pack_two_real(phi.abs2(),
                                                        jmul(z).re))
                gphi2h, jach = spectral.unpack_two_real_hat(packed)
            else:
                fj = tr.fft2(stack([C.from_real(phi.abs2()),
                                    C.from_real(jmul(z).re)]))
                gphi2h, jach = unstack(fj, 2)
            gphi2h = gphi2h * (-g.wv2)
            jach = spectral.zero_mean_mode(jach)
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
        qpsi_h = (qh - qwh) if self._subtracts_wave_pv() else qh
        if self._pack:
            # all five outputs are real fields of Hermitian transforms:
            # pack them pairwise so five inverse transforms become three
            gb = tr.ifft2(stack([
                spectral.combine_two_real_hat(ph, mul_i(ph, -g.l)),  # p, u
                spectral.combine_two_real_hat(mul_i(ph, g.k), qh),   # v, q
                qpsi_h,                                              # q_psi
            ]))
            s0, s1, s2 = unstack(gb, 3)
            p_, u = s0.re, s0.im
            v, q = s1.re, s1.im
            q_psi = s2.re
        else:
            gb = tr.ifft2(stack([ph, mul_i(ph, -g.l), mul_i(ph, g.k), qh,
                                 qpsi_h]))
            p_, u, v, q, q_psi = [x.re for x in unstack(gb, 5)]
        return Derived(ph=ph, p=p_, q=q, q_psi=q_psi, qwh=qwh, phi=phi,
                       phix=phix, phiy=phiy, u=u, v=v)

    # ------------------------------------------------------------------
    def stage_sources(self, qh: C, phih: C, D: Derived) -> StageSources:
        g, tr = self.grid, self.tr
        phih_slices = [
            phih * (-g.wv2),                 # lapphi
            phih * g.wv4,                    # lap2phi
            mul_i(phih, -g.k * g.wv2),       # lphix
            mul_i(phih, -g.l * g.wv2),       # lphiy
        ]
        if self._pack:
            batch = tr.ifft2(stack(phih_slices + [
                spectral.combine_two_real_hat(D.ph * g.wv4,
                                              qh * (-g.wv2)),
            ]))
            lapphi, lap2phi, lphix, lphiy, packed = unstack(batch, 5)
            lap2psi, lapq = packed.re, packed.im
        else:
            batch = tr.ifft2(stack(phih_slices + [
                D.ph * g.wv4, qh * (-g.wv2),
            ]))
            lapphi, lap2phi, lphix, lphiy, s4, s5 = unstack(batch, 6)
            lap2psi, lapq = s4.re, s5.re
        return self.sources_from_fields(D, lapphi, lap2phi, lphix, lphiy,
                                        lap2psi, lapq)

    # ------------------------------------------------------------------
    def nonlinear(self, qh: C, D: Derived):
        g, tr = self.grid, self.tr
        if isinstance(self.physics, QLPhysics):
            ph_q = -(qh * g.wv2i)
            if self._pack:
                uv = tr.ifft2(spectral.combine_two_real_hat(
                    mul_i(ph_q, -g.l), mul_i(ph_q, g.k)))
                adv_u, adv_v = uv.re, uv.im
            else:
                uv = tr.ifft2(stack([mul_i(ph_q, -g.l), mul_i(ph_q, g.k)]))
                adv_u, adv_v = [x.re for x in unstack(uv, 2)]
        else:
            adv_u, adv_v = D.u, D.v

        if self._pack:
            nl = tr.fft2(stack([
                spectral.pack_two_real(D.u * D.q, D.v * D.q),
                adv_u * D.phix + adv_v * D.phiy,
                D.phi * D.q_psi,
            ]))
            packed, jacwh, refrh = unstack(nl, 3)
            uqh, vqh = spectral.unpack_two_real_hat(packed)
        else:
            nl = tr.fft2(stack([
                C.from_real(D.u * D.q),
                C.from_real(D.v * D.q),
                adv_u * D.phix + adv_v * D.phiy,
                D.phi * D.q_psi,
            ]))
            uqh, vqh, jacwh, refrh = unstack(nl, 4)
        jacq = spectral.zero_mean_mode(mul_i(uqh, g.k) + mul_i(vqh, g.l))
        Fn = -jacq
        if self.physics.zero_mean_jac_psi_phi:
            jacwh = spectral.zero_mean_mode(jacwh)
        Fnw = -jacwh - jmul(refrh, 0.5)
        return Fn, Fnw
