"""Integration tests: energy/variance budget closure over a full run.

Port of ``niwqg/tests/test_diagnostics.py``: the RK4-time-integrated
``Ke``/``Kw``/``Pw`` (and ``cvar``) series must agree with the
instantaneous diagnostics to the reference tolerances.
"""

import numpy as np

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu import InitialConditions as ic


class TestQGNIWBudgets:
    def setup_method(self):
        U0 = 0.05
        self.m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1)
        k0 = 10 * (2 * np.pi / self.m.L)
        q = ic.LambDipole(self.m, U=U0, R=2 * np.pi / k0)
        phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
        self.m.set_q(q)
        self.m.set_phi(phi)
        self.m.run()

    def test_energy(self, rtol=1e-15):
        d = self.m.diagnostics
        assert np.allclose(d["ke_qg"]["value"], d["Ke"]["value"], rtol=rtol)
        assert np.allclose(d["ke_niw"]["value"], d["Kw"]["value"], rtol=rtol)
        assert np.allclose(d["pe_niw"]["value"], d["Pw"]["value"], rtol=rtol)


class TestQGBudgets:
    def setup_method(self):
        U0 = 0.05
        self.m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                               passive_scalar=True)
        k0 = 10 * (2 * np.pi / self.m.L)
        q = ic.LambDipole(self.m, U=U0, R=2 * np.pi / k0)
        c = ic.PlaneWave(self.m, k=k0, l=k0) * q.mean()
        self.m.set_q(q)
        self.m.set_c(c)
        self.m.run()

    def test_energy(self, rtol=1e-14):
        d = self.m.diagnostics
        assert np.allclose(d["ke_qg"]["value"], d["Ke"]["value"], rtol=rtol)

    def test_tracer_variance(self, rtol=1e-14):
        d = self.m.diagnostics
        assert np.allclose(d["C2"]["value"], d["cvar"]["value"], rtol=rtol)
