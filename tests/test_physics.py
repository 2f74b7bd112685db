"""Additional physics oracles beyond the reference's test families."""

import numpy as np
import pytest

from niwqg_tpu import QGModel, UnCoupledModel, YBJModel
from niwqg_tpu import InitialConditions as ic


def test_rossby_wave_dispersion():
    """Linear Rossby wave: with tiny amplitude, the mode at (k,0) rotates
    at the exact phase speed -beta/k^2; ETDRK4 treats the linear operator
    exactly, so the numerical mode must match the analytic solution."""
    beta = 2e-11
    m = QGModel.Model(use_filter=False, nu4=0.0, beta=beta,
                      tmax=20 * 10000.0)
    k = 2 * np.pi * 5 / m.L
    qi = 1e-9 * np.cos(k * m.x)
    m.set_q(qi)
    qh0 = np.fft.rfft2(qi)
    m.run()
    # analytic: qh(t) = qh0 * exp(+i beta k t / wv2) at each mode
    g = m.kernel.grid
    with np.errstate(divide="ignore", invalid="ignore"):
        om = np.where(g.wv2_np > 0, beta * g.k_np / g.wv2_np, 0.0)
    qh_exact = qh0 * np.exp(1j * om * m.t)
    scale = np.abs(qh_exact).max()
    assert np.abs(qh_exact - m.qh).max() < 1e-10 * scale


def test_uncoupled_wave_energy_conservation():
    """Inviscid uncoupled run: NIW kinetic energy 0.5<|phi|^2> is conserved
    analytically by advection+refraction+dispersion; the numerical drift is
    RK4 truncation error and must converge ~dt^4."""
    U0 = 0.05
    T = 10 * 10000.0

    def drift(dt):
        # intended physics (fresh per-stage gradients): the dt^4
        # convergence below is a property of the corrected scheme, not of
        # the reference's stale-gradient cadence (the parity default)
        m = UnCoupledModel.Model(use_filter=False, nu4=0, nu=0, nuw=0, mu=0,
                                 muw=0, tdiags=1, tmax=T, dt=dt,
                                 faithful_quirks=False)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        phi = np.asarray(ic.WavePacket(m, k=2 * k0, l=0, R=2 * np.pi / k0,
                                       x0=m.L / 2, y0=m.L / 2))
        m.set_q(q)
        m.set_phi(phi)
        kw0 = m.Kw
        m.run()
        return abs(m.diagnostics["ke_niw"]["value"][-1] - kw0) / kw0

    d1 = drift(10000.0)
    d2 = drift(5000.0)
    assert d1 < 5e-4
    # third-order local refraction splitting gives >= ~8x per halving
    assert d2 < d1 / 6.0, (d1, d2)


def test_ybj_frozen_flow():
    """YBJ must not evolve q/psi at all."""
    U0 = 0.05
    m = YBJModel.Model(use_filter=False, tmax=5 * 10000.0)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi(np.asarray(ic.PlaneWave(m, k=k0, l=0)))
    q_before = m.q.copy()
    m.run_steps(5)
    assert np.array_equal(q_before, m.q)
    # but phi did evolve
    assert np.abs(np.asarray(m.phi) - ic.PlaneWave(m, k=k0, l=0)).max() > 1e-6


@pytest.mark.parametrize("gen", [ic.McWilliams1984, ic.Danioux2015])
def test_random_ic_energy_normalization_half_spectrum(gen):
    """The random ICs normalise to a target energy E via spec_var; on the
    half-spectrum QGModel the normalisation must use the physical grid size
    nx*ny, not the rfft array width (regression: Eaux was overestimated
    ~(nx/(nx//2+1))^4, handing back fields with E/14 instead of E)."""
    E = 0.5
    m = QGModel.Model(nx=64, use_filter=False)
    m.set_q(gen(m, E=E, seed=1234))
    assert abs(m.Ke - E) / E < 1e-10
    # and the full-spectrum wave model path still gives exactly E
    mw = UnCoupledModel.Model(nx=64, use_filter=False)
    mw.set_q(gen(mw, E=E, seed=1234))
    assert abs(mw.Ke - E) / E < 1e-10


def test_run_with_snapshots_generator():
    U0 = 0.05
    m = QGModel.Model(use_filter=False, tmax=10 * 10000.0, tdiags=1)
    k0 = 10 * (2 * np.pi / m.L)
    m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
    yields = list(m.run_with_snapshots(tsnapstart=0.0, tsnapint=5 * 10000.0))
    assert yields == [5 * 10000.0, 10 * 10000.0]
