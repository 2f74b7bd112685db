"""Quasilinear coupled physics.

The reference ``niwqg/QLModel.py`` ships broken (it never sets
``self.model`` so construction crashes at ``niwqg/Kernel.py:140``, and it
calls a ``jacobian_phic_phi`` that only ``CoupledModel`` defines,
``QLModel.py:81``). The default here implements the *intended* quasilinear
physics (SURVEY.md §2 #4):

  - inversion with wave PV: ``ph = -(qh - qwh)/wv2`` (``QLModel.py:69-88``),
    using the Coupled wave-PV definition for ``qwh`` (the reference's extra
    ``1j`` factor at ``QLModel.py:83`` is a transcription bug — the Jacobian
    term is already the transform of a real field);
  - quasilinear advection: phi is advected only by the *vortex* part of the
    flow, ``uq, vq`` from ``ph_q = -qh/wv2`` (``QLModel.py:54-67``), with no
    mean-mode zeroing (as in the reference);
  - relative vorticity: ``q_psi = q`` each stage (``QLModel`` does not
    override ``_calc_rel_vorticity``, ``niwqg/Kernel.py:492-501``).

``faithful_quirks=True`` reproduces the *repaired* reference bug-for-bug
(the parity oracle: monkeypatch-set ``model`` and alias
``jacobian_phic_phi`` from ``CoupledModel.py:59-73``, the only two fixes
needed to construct it — ``tests/test_golden_reference.py``):

  - the wave-PV Jacobian term enters as ``1j*jach`` (``QLModel.py:83``);
  - ``ph`` stays unprojected (``QLModel.py:86`` — no
    ``fft(real(ifft(.)))`` sandwich; both modes keep this);
  - ``QLModel._invert`` never updates ``self.q`` (unlike
    ``CoupledModel.py:97``), so ``q_psi = self.q`` (``Kernel.py:501``) is
    pinned to the INITIAL vorticity from ``set_q`` for the whole run —
    the refraction term, the energy-conversion sources (incl. ``ep_psi``'s
    ``self.q``, ``Kernel.py:639``) and the ``ens``/``skew``/``conc_niw``
    diagnostics all see the frozen field, while the advection Jacobian
    still sees the evolving ``ifft(qh)`` (recomputed locally at
    ``Kernel.py:481``);
  - stage ordering: the stepper updates ``self.qh`` *before* calling
    ``jacobian_psi_phi`` (``Kernel.py:347`` updates, ``:350`` consumes),
    so the quasilinear vortex velocities ``uq, vq`` come from the
    just-updated qh of the current stage, not the stage input
    (``WavePhysics.jac_reads_updated_qh``).
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

    def __init__(self, faithful_quirks: bool = False):
        self.wave_pv_imag_jac = bool(faithful_quirks)
        self.stale_q_psi = bool(faithful_quirks)
        self.jac_reads_updated_qh = bool(faithful_quirks)

    def invert(self, K: WaveKernel, qh: C, phih: C, phi: C) -> Derived:
        g, tr, p = K.grid, K.tr, K.params
        phix, phiy = spectral.gradients(tr, g, phih)
        qwh = spectral.wave_pv_hat(tr, g, p.f, phi, phix, phiy,
                                   imag_jac=self.wave_pv_imag_jac)
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
