"""Fast (batched, spectral-inversion) kernel vs the faithful kernel.

The fast kernel re-associates the reference arithmetic (batched transforms,
inversion kept in spectral space); in float64 it must track the faithful
kernel to near machine precision over multiple steps.
"""

import numpy as np
import pytest

from niwqg_tpu import CoupledModel, QLModel, UnCoupledModel
from niwqg_tpu import InitialConditions as ic

MODELS = [CoupledModel, UnCoupledModel, QLModel]


def _run(model_mod, fast, nsteps=8):
    U0 = 0.05
    m = model_mod.Model(use_filter=False, U=-U0, tdiags=1,
                        tmax=nsteps * 10000.0, fast=fast)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    m.set_q(q)
    m.set_phi(phi)
    m.run()
    return m


def test_fast_mxu_evenodd_matches_native_f64():
    """Full TPU execution path (batched kernel + matmul-DFT with the
    even/odd real transforms forced) vs the native-FFT fast kernel, f64."""
    a = _run(CoupledModel, fast=True, nsteps=4)
    U0 = 0.05
    m = CoupledModel.Model(
        use_filter=False, U=-U0, tdiags=1, tmax=4 * 10000.0, fast=True,
        backend="mxu",
        transform_opts={"evenodd": True, "half_factors": (8, 8)},
    )
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    m.set_q(q)
    m.set_phi(phi)
    m.run()
    qs = np.abs(a.q).max()
    assert np.abs(a.q - m.q).max() < 1e-10 * qs
    assert np.abs(np.asarray(a.phi) - np.asarray(m.phi)).max() < 1e-10
    assert abs(a.Ke - m.Ke) < 1e-9 * abs(a.Ke)


@pytest.mark.parametrize("model_mod", MODELS)
def test_fast_matches_faithful(model_mod):
    a = _run(model_mod, fast=False)
    b = _run(model_mod, fast=True)
    qs = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * qs
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10
    assert abs(a.Ke - b.Ke) < 1e-10 * abs(a.Ke)
    assert abs(a.Kw - b.Kw) < 1e-10 * abs(a.Kw)
    for name in ("ke_qg", "gamma_r", "gamma_a", "ep_psi", "chi_phi"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        # absolute floor: conversion terms can be pure rounding noise
        # (~1e-14) for near-uniform phi, where relative comparison is
        # ill-posed
        scale = np.abs(va).max()
        assert np.abs(va - vb).max() < 1e-9 * scale + 1e-18, name


def test_ql_faithful_quirks_fast_matches_faithful():
    """QL ``faithful_quirks`` (1j wave-PV factor + frozen q_psi) must agree
    between the batched fast kernel and the faithful kernel."""
    runs = []
    for fast in (False, True):
        U0 = 0.05
        m = QLModel.Model(use_filter=False, U=-U0, tdiags=1,
                          tmax=6 * 10000.0, fast=fast, faithful_quirks=True)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        phi = np.asarray(ic.WavePacket(m, k=2 * k0, l=0, R=2 * np.pi / k0,
                                       x0=m.L / 2, y0=m.L / 2))
        m.set_q(q)
        m.set_phi(phi)
        m.run()
        runs.append(m)
    a, b = runs
    qs = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * qs
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10
    assert abs(a.Ke - b.Ke) < 1e-10 * (abs(a.Ke) + 1e-300)
    for name in ("ke_qg", "ens", "gamma_r", "ep_psi", "pi"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        scale = np.abs(va).max()
        assert np.abs(va - vb).max() < 1e-9 * scale + 1e-18, name


@pytest.mark.parametrize("fast", [False, True])
def test_compute_budgets_off(fast):
    """compute_budgets=False must not change the trajectory: prognostic
    fields and the instantaneous (cadenced) diagnostics match a budgets-on
    run; only the RK4-integrated Ke/Pw/Kw accumulators freeze (they keep
    their set_q/set_phi values). The comparison is near-exact rather than
    bitwise: the fast kernel's spectral budget sources consume the same
    nonlinear-product transforms as the RHS, so dropping them changes XLA's
    fusion of the shared expressions by one rounding (measured ~3e-16
    relative over 6 steps on CPU f64)."""
    on = _run(CoupledModel, fast=fast, nsteps=6)
    off_m = CoupledModel.Model(use_filter=False, U=-0.05, tdiags=1,
                               tmax=6 * 10000.0, fast=fast,
                               compute_budgets=False)
    k0 = 10 * (2 * np.pi / off_m.L)
    q = ic.LambDipole(off_m, U=0.05, R=2 * np.pi / k0)
    off_m.set_q(q)
    off_m.set_phi((np.ones_like(q) + 1j) * 5 * 0.05 / np.sqrt(2))
    Ke0, Pw0, Kw0 = (float(off_m.state.Ke), float(off_m.state.Pw),
                     float(off_m.state.Kw))
    off_m.run()

    qs = np.abs(on.q).max()
    assert np.abs(np.asarray(off_m.q) - np.asarray(on.q)).max() < 1e-13 * qs
    assert np.abs(np.asarray(off_m.phi)
                  - np.asarray(on.phi)).max() < 1e-13
    # instantaneous diagnostics unaffected
    for name in ("ke_qg", "ke_niw", "pe_niw", "ens"):
        va = np.asarray(on.diagnostics[name]["value"], dtype=float)
        vb = np.asarray(off_m.diagnostics[name]["value"], dtype=float)
        assert np.abs(va - vb).max() < 1e-13 * np.abs(va).max(), name
    # integrated budgets frozen at their initialization values
    assert float(off_m.state.Ke) == Ke0
    assert float(off_m.state.Pw) == Pw0
    assert float(off_m.state.Kw) == Kw0
    # and the budgets-on run did integrate (sanity that the A/B is real)
    assert float(on.state.Ke) != Ke0


@pytest.mark.parametrize("model_mod", MODELS)
def test_spectral_budget_sources_match_physical(model_mod):
    """The Parseval stage-source evaluation (``spectral_budgets=True``,
    zero transforms) must agree term-by-term with the physical-space
    evaluation of ``niwqg/Kernel.py:629-701`` on a generic evolved state.
    All dissipation coefficients are nonzero so every weight term in the
    fused spectral reductions is exercised (incl. the nu4w/mu/muw terms
    that are zero in the flagship configs)."""
    U0 = 0.05
    kw = {}
    if model_mod is UnCoupledModel:
        # the spectral path requires fresh per-stage gradients; the
        # parity default (faithful_quirks=True) keeps them stale and
        # falls back to the physical-space source evaluation
        kw["faithful_quirks"] = False
    m = model_mod.Model(use_filter=False, U=-U0, tdiags=1,
                        tmax=3 * 10000.0, fast=True,
                        nu4=1.0e8, nu=20.0, mu=1e-8,
                        nu4w=1.0e8, nuw=50.0, muw=1e-8, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
    for _ in range(2):
        m.state = m.kernel.step(m.state)
    s, K = m.state, m.kernel
    assert K._spectral_src
    sp = K.stage_sources(s.qh, s.phih, s.d)
    ph = K._stage_sources_batched(s.qh, s.phih, s.d)
    for name in sp._fields:
        a, b = float(getattr(sp, name)), float(getattr(ph, name))
        # conversion terms can be rounding-level for near-uniform phi;
        # compare with a small absolute floor relative to the k source
        floor = 1e-12 * abs(ph.k) + 1e-300
        assert abs(a - b) < 1e-12 * abs(b) + floor, (name, a, b)


def test_qg_spectral_budgets_match_physical():
    """QGModel with ``spectral_budgets=True`` (default; transform-free
    ep_psi/ep_c and spectral diagnostic moments) must track the
    physical-space evaluation of ``QGModel.py:588-604`` — trajectory,
    integrated budgets and every scalar series — to near machine
    precision. All dissipation knobs nonzero."""
    from niwqg_tpu import QGModel

    def run(spec):
        m = QGModel.Model(nx=64, tdiags=1, tmax=8 * 10000.0, dt=10000.0,
                          U=0.05, beta=1e-11, nu4=5e9, nu=20.0, mu=1e-8,
                          passive_scalar=True, nu4c=5e9, nuc=10.0, muc=1e-8,
                          spectral_budgets=spec)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=0.05, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_c(np.asarray(q, dtype=float).copy())
        m.run()
        return m

    a, b = run(True), run(False)
    qs = np.abs(b.q).max()
    assert np.abs(a.q - b.q).max() < 1e-12 * qs
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(b.Ke)
    assert abs(a.cvar - b.cvar) < 1e-12 * abs(b.cvar)
    for name in ("ep_psi", "C2", "gradC2", "Gamma_c", "ep_c", "chi_c"):
        va = np.asarray(a.diagnostics[name]["value"], dtype=float)
        vb = np.asarray(b.diagnostics[name]["value"], dtype=float)
        sc = np.abs(vb).max() + 1e-300
        assert np.abs(va - vb).max() / sc < 1e-11, name
