"""Uncoupled (YBJ waves on an evolving QG flow) physics.

Re-design of ``niwqg/UnCoupledModel.py``: plain inversion
``p = ifft(-qh/wv2)`` (``UnCoupledModel.py:54-64``); waves are refracted and
advected by the flow but exert no feedback (``q_psi = q``,
``niwqg/Kernel.py:492-501``).

Reference quirk: the reference only refreshes the wave gradients
``phix/phiy`` when a diagnostic routine happens to run (``_calc_pe_niw``,
``niwqg/Kernel.py:608-611`` — every ``tdiags``/``twrite`` steps), so its
uncoupled advection term uses stale gradients. ``faithful_quirks=True``
— the model-shell default, per the uniform "defaults reproduce the
reference as it runs" policy — carries the gradients through all four
stages and refreshes them only on the reference's cadence (golden
parity; see ``WavePhysics.stale_phi_gradients`` and the model shells'
refresh hooks). ``faithful_quirks=False`` recomputes the gradients from
the current ``phih`` at every stage — the intended Young & Ben Jelloul
physics (opt-in fix).
"""

from __future__ import annotations

from ..carray import C
from ..ops import spectral
from .kernel import Derived, WaveKernel, WavePhysics


class UnCoupledPhysics(WavePhysics):
    name = "Uncoupled Model"

    def __init__(self, faithful_quirks: bool = False):
        self.stale_phi_gradients = bool(faithful_quirks)

    def invert(self, K: WaveKernel, qh: C, phih: C, phi: C) -> Derived:
        g, tr = K.grid, K.tr
        phix, phiy = spectral.gradients(tr, g, phih)
        psi = tr.ifft2_real(-(qh * g.wv2i))
        ph = tr.fft2_real(psi)
        q = tr.ifft2_real(qh)
        qwh = C.zeros(qh.shape, qh.dtype)
        return Derived(ph=ph, p=psi, q=q, q_psi=q, qwh=qwh, phi=phi,
                       phix=phix, phiy=phiy, u=q, v=q)  # u,v filled by caller
