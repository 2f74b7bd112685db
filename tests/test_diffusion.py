"""ETDRK4 vs analytic hyperviscous decay.

Port of ``niwqg/tests/test_diffusion.py`` with two deliberate improvements:

  - the reference drives the excited mode to zero (``nu4=1e14`` means
    ``exp(-2900)``), so its comparison is ``0 == 0``; here ``nu4`` is chosen
    for a *partial* ~e^-3 decay so the contour-integral coefficients are
    genuinely exercised;
  - the reference's O(1)-amplitude ``sin`` gives u ~ 1e4 m/s (CFL ~ 4e4);
    that advective noise amplification is only contained by its enormous
    hyperdiffusion (verified: the reference solver blows up at nu4=1e11
    exactly like this one). A small amplitude keeps the nonlinear term
    negligible so the linear-decay oracle applies.
"""

import numpy as np

from niwqg_tpu import CoupledModel, QGModel

AMP = 1e-7


class TestQGNIWDiffusion:
    def setup_method(self):
        self.m = CoupledModel.Model(use_filter=False, nu4=1e11, nu4w=0.0,
                                    nu=0.0, nuw=0.0,
                                    tmax=10 * 10000.0)
        k, l = 2 * np.pi * 5 / self.m.L, 2 * np.pi * 9 / self.m.L
        self.qi = AMP * np.sin(k * self.m.x + l * self.m.y)
        self.m.set_q(self.qi)
        self.m.set_phi(self.qi * 0)

    def test_hyperviscosity(self, rtol=1e-12):
        self.m.run()
        g = self.m.kernel.grid
        qfh = np.fft.fft2(self.qi) * np.exp(
            -self.m.params.nu4 * g.wv4_np * self.m.params.tmax
        )
        scale = np.abs(qfh).max()
        assert np.abs(qfh - self.m.qh).max() < rtol * scale


class TestQGDiffusion:
    def setup_method(self):
        self.m = QGModel.Model(use_filter=False, nu4=1e10,
                               tmax=100 * 10000.0)
        k, l = 2 * np.pi * 5 / self.m.L, 2 * np.pi * 9 / self.m.L
        self.qi = AMP * np.sin(k * self.m.x + l * self.m.y)
        self.m.set_q(self.qi)

    def test_hyperviscosity(self, rtol=1e-12):
        self.m.run()
        g = self.m.kernel.grid
        qfh = np.fft.rfft2(self.qi) * np.exp(
            -self.m.params.nu4 * g.wv4_np * self.m.params.tmax
        )
        scale = np.abs(qfh).max()
        assert np.abs(qfh - self.m.qh).max() < rtol * scale


class TestReferenceConfigDiffusion:
    """The reference's own configuration (``test_diffusion.py:12-27``):
    total decay, checks nothing explodes."""

    def test_total_decay(self):
        m = CoupledModel.Model(use_filter=False, nu4=1e14, nu4w=0.0,
                               tmax=10 * 10000.0)
        k, l = 2 * np.pi * 5 / m.L, 2 * np.pi * 9 / m.L
        qi = np.sin(k * m.x + l * m.y)
        m.set_q(qi)
        m.set_phi(qi * 0)
        m.run()
        qfh = np.fft.fft2(qi) * np.exp(-1e14 * m.kernel.grid.wv4_np * m.params.tmax)
        assert np.allclose(qfh, m.qh, rtol=1e-15)
