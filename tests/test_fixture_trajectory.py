"""Stored-fixture trajectory regression (CI oracle without the reference).

The golden-parity suite (test_golden_reference.py) needs the reference
repo mounted at /root/reference and therefore skips on plain CI runners.
This test compares short CoupledModel and QGModel trajectories against a
committed fixture (tests/fixtures/trajectory.npz, produced by
scripts/make_fixture.py on the CPU/f64 path), so any unintended numerics
change is caught everywhere the suite runs.

Tolerances allow for BLAS/FFT summation-order differences across CPU
architectures (~1e-12 relative on a 20-step f64 trajectory), far tighter
than any real numerics bug.
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "trajectory.npz")

RTOL = 1e-9
ATOL = 0.0


@pytest.fixture(scope="module")
def fixture():
    return np.load(FIX)


def test_coupled_trajectory(fixture):
    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic

    m = CoupledModel.Model(L=2 * np.pi * 200e3, nx=64, dt=10000.0,
                           tmax=10000.0 * 20, m=1.0 / 325, N=0.005, f=1e-4,
                           use_filter=True, nu4=5e10, nu4w=5e10,
                           save_to_disk=False)
    q = ic.McWilliams1984(m, k0=6, E=2.5e-4, seed=11)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 0.05 / np.sqrt(2))
    m.run_steps(20)

    scale_q = np.abs(fixture["coupled_q"]).max()
    np.testing.assert_allclose(np.asarray(m.q), fixture["coupled_q"],
                               rtol=RTOL, atol=RTOL * scale_q)
    scale_phi = np.abs(fixture["coupled_phi"]).max()
    np.testing.assert_allclose(np.asarray(m.phi), fixture["coupled_phi"],
                               rtol=RTOL, atol=RTOL * scale_phi)
    np.testing.assert_allclose(float(m.state.Ke), float(fixture["coupled_Ke"]),
                               rtol=RTOL)
    np.testing.assert_allclose(float(m.state.Pw), float(fixture["coupled_Pw"]),
                               rtol=RTOL)
    np.testing.assert_allclose(float(m.state.Kw), float(fixture["coupled_Kw"]),
                               rtol=RTOL)


def test_qg_trajectory(fixture):
    from niwqg_tpu import QGModel
    from niwqg_tpu import InitialConditions as ic

    m = QGModel.Model(L=2 * np.pi * 200e3, nx=64, dt=10000.0,
                      tmax=10000.0 * 20, beta=1e-11, nu4=5e10,
                      use_filter=True, passive_scalar=True,
                      save_to_disk=False)
    q = ic.McWilliams1984(m, k0=6, E=2.5e-4, seed=13)
    m.set_q(q)
    m.set_c(np.asarray(q, dtype=float).copy())
    m.run_steps(20)

    scale_q = np.abs(fixture["qg_q"]).max()
    np.testing.assert_allclose(np.asarray(m.q), fixture["qg_q"],
                               rtol=RTOL, atol=RTOL * scale_q)
    scale_c = np.abs(fixture["qg_c"]).max()
    np.testing.assert_allclose(np.asarray(m.c), fixture["qg_c"],
                               rtol=RTOL, atol=RTOL * scale_c)
    np.testing.assert_allclose(float(m.state.Ke), float(fixture["qg_Ke"]),
                               rtol=RTOL)
    np.testing.assert_allclose(m.cvar, float(fixture["qg_cvar"]), rtol=RTOL)
