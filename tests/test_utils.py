"""Tests for analysis utilities: isotropic spectrum, strain/Okubo-Weiss."""

import numpy as np

from niwqg_tpu import CoupledModel
from niwqg_tpu.utils.spectrum import spectrum_2d


def test_isotropic_spectrum_peak():
    """A single plane wave concentrates the ring spectrum at its |k|."""
    n, L = 128, 2 * np.pi
    d = L / n
    x, y = np.meshgrid(np.arange(n) * d, np.arange(n) * d)
    k0 = 10
    field = np.cos(k0 * x)
    s = spectrum_2d(field, d, d)
    assert abs(s.ki[np.argmax(s.ispec)] - k0) <= 1.0


def test_parseval_ring_sum():
    """Ring-integrated spectrum integrates to the field variance."""
    rng = np.random.default_rng(5)
    n, L = 128, 1.0
    d = L / n
    field = rng.standard_normal((n, n))
    field -= field.mean()
    s = spectrum_2d(field, d, d)
    dk = s.ki[1] - s.ki[0]
    var_spec = s.ispec.sum() * dk
    # ring binning is approximate at the corners; 10% agreement
    assert abs(var_spec - field.var()) / field.var() < 0.1


def test_strain_and_okubo_weiss():
    m = CoupledModel.Model(use_filter=False)
    k = 2 * np.pi * 5 / m.L
    m.set_q(np.sin(k * m.x))
    m.set_phi(np.zeros_like(m.x) + 0j)
    K, s = m.kernel, m.state
    strain = np.asarray(K.strain(s.d.ph))
    ow = np.asarray(K.okubo_weiss(s))
    # for psi = A cos(kx): strain = (psi_xx)^2 = q_psi^2 -> OW == 0
    assert np.abs(ow).max() < 1e-12 * (strain.max() ** 1) + 1e-30
