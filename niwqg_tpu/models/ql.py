"""Quasilinear coupled physics.

The reference ``niwqg/QLModel.py`` ships broken (it never sets
``self.model`` so construction crashes at ``niwqg/Kernel.py:140``, and it
calls a ``jacobian_phic_phi`` that only ``CoupledModel`` defines,
``QLModel.py:81``). This implements the *intended* quasilinear physics
(SURVEY.md §2 #4):

  - inversion with wave PV: ``ph = -(qh - qwh)/wv2`` (``QLModel.py:69-88``),
    using the Coupled wave-PV definition for ``qwh`` (the reference's extra
    ``1j`` factor at ``QLModel.py:83`` is a transcription bug — the Jacobian
    term is already the transform of a real field);
  - quasilinear advection: phi is advected only by the *vortex* part of the
    flow, ``uq, vq`` from ``ph_q = -qh/wv2`` (``QLModel.py:54-67``), with no
    mean-mode zeroing (as in the reference);
  - relative vorticity defaults to ``q_psi = q`` (``QLModel`` does not
    override ``_calc_rel_vorticity``).
"""

from __future__ import annotations

from ..carray import C
from ..ops import spectral
from .kernel import Derived, WaveKernel, WavePhysics


class QLPhysics(WavePhysics):
    name = "Quasilinear Model"
    zero_mean_jac_psi_phi = False
    has_wave_pv = True
    subtracts_wave_pv = False
    hermitian_ph = False          # reference QL keeps ph unprojected
    advect_by_vortex_flow = True

    def invert(self, K: WaveKernel, qh: C, phih: C, phi: C) -> Derived:
        g, tr, p = K.grid, K.tr, K.params
        phix, phiy = spectral.gradients(tr, g, phih)
        qwh = spectral.wave_pv_hat(tr, g, p.f, phi, phix, phiy)
        qwh = qwh * g.filtr
        ph = -((qh - qwh) * g.wv2i)
        psi = tr.ifft2_real(ph)
        q = tr.ifft2_real(qh)
        return Derived(ph=ph, p=psi, q=q, q_psi=q, qwh=qwh, phi=phi,
                       phix=phix, phiy=phiy, u=q, v=q)  # u,v filled by caller

    def jac_psi_phi(self, K: WaveKernel, D: Derived, qh: C) -> C:
        """Advection by the vortex streamfunction only (``QLModel.py:54-67``)."""
        g, tr = K.grid, K.tr
        ph_q = -(qh * g.wv2i)
        uq, vq = spectral.velocities(tr, g, ph_q)
        return spectral.jacobian_psi_phi_hat(tr, uq, vq, D.phix, D.phiy,
                                             zero_mean=False)
