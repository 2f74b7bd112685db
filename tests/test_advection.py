"""Operator tests: Jacobians vanish on plane-wave states.

Port of ``niwqg/tests/test_advection.py``: with psi proportional to q (a
single plane wave), J(psi,q), J(phi*,phi) and J(psi,phi) must all vanish.
"""

import numpy as np

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu.ops import spectral


def _std_c(z):
    return np.std(np.asarray(z.to_complex()))


class TestQGNIWJacobians:
    def setup_method(self):
        self.m = CoupledModel.Model(use_filter=False)
        k, l = 2 * np.pi * 5 / self.m.L, 2 * np.pi * 9 / self.m.L
        wave = np.sin(k * self.m.x + l * self.m.y)
        self.m.set_q(wave)
        self.m.set_phi(wave)

    def test_jacobian(self, rtol=1e-12):
        K, s = self.m.kernel, self.m.state
        D = K.derive(s.qh, s.phih)

        jacq = spectral.jacobian_psi_q_hat(K.tr, K.grid, D.u, D.v, D.q)
        assert _std_c(jacq) < rtol, "J(psi,q) is broken"

        # J(phi*, phi): the wave-PV Jacobian term
        from niwqg_tpu.carray import jmul
        z = D.phix.conj() * D.phiy - D.phiy.conj() * D.phix
        jach = spectral.zero_mean_mode(K.tr.fft2_real(jmul(z).re))
        assert _std_c(jach) < rtol, "J(phi*,phi) is broken"

        jacw = spectral.jacobian_psi_phi_hat(K.tr, D.u, D.v, D.phix, D.phiy)
        assert _std_c(jacw) < rtol, "J(psi,phi) is broken"


class TestQGJacobian:
    def setup_method(self):
        self.m = QGModel.Model(use_filter=False)
        k, l = 2 * np.pi * 5 / self.m.L, 2 * np.pi * 9 / self.m.L
        self.m.set_q(np.sin(k * self.m.x + l * self.m.y))

    def test_jacobian(self, rtol=1e-12):
        K, s = self.m.kernel, self.m.state
        u, v = K._velocities(s.ph)
        jac = K._jacobian_hat(u, v, s.q)
        assert _std_c(jac) < rtol, "J(psi,q) is broken"
