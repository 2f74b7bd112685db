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


def test_model_isotropic_spectrum_method():
    """The model-surface ``isotropic_spectrum`` (the pyspec replacement,
    reference ``examples/LambDipole.py:159-171``) accepts field names and
    arrays and peaks at the injected wavenumber."""
    from niwqg_tpu import InitialConditions as ic

    m = CoupledModel.Model(use_filter=False, tmax=10000.0,
                           save_to_disk=False)
    k0 = 10 * (2 * np.pi / m.L)
    m.set_q(np.asarray(ic.LambDipole(m, U=0.05, R=2 * np.pi / k0)))
    sp = m.isotropic_spectrum("q")
    assert np.all(np.isfinite(sp.ispec)) and sp.ispec.max() > 0
    sp2 = m.isotropic_spectrum(np.real(ic.PlaneWave(m, k=3 * k0, l=0)))
    assert abs(sp2.ki[np.argmax(sp2.ispec)] / k0 - 3.0) < 0.2


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


def test_spec_cross_equals_physical_mean():
    """Grid.spec_cross must equal the physical-grid mean of the product of
    the two real fields, in both spectral layouts (the Parseval identity
    the spectral budget evaluation rests on), including fields with
    nonzero means (the (0,0) mode is kept, unlike spec_var)."""
    import jax.numpy as jnp
    import numpy as np
    from niwqg_tpu.carray import C
    from niwqg_tpu.grid import Grid

    def cj(zh):
        return C(jnp.asarray(zh.real), jnp.asarray(zh.imag))

    rng = np.random.default_rng(42)
    nx = 32
    f = rng.standard_normal((nx, nx)) + 0.7   # nonzero mean
    g = rng.standard_normal((nx, nx)) - 1.3
    want = float((f * g).mean())

    half = Grid(nx=nx, L=1.0, dtype=np.float64, spectrum="half").materialize()
    fh = np.fft.rfft2(f)
    gh = np.fft.rfft2(g)
    got = float(half.spec_cross(cj(fh), cj(gh)))
    assert abs(got - want) < 1e-14 * abs(want)

    full = Grid(nx=nx, L=1.0, dtype=np.float64, spectrum="full").materialize()
    fh2 = np.fft.fft2(f)
    gh2 = np.fft.fft2(g)
    got2 = float(full.spec_cross(cj(fh2), cj(gh2)))
    assert abs(got2 - want) < 1e-14 * abs(want)
