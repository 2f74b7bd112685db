"""Golden parity vs the reference NumPy solver.

Runs the reference package (mounted read-only at /root/reference) and this
framework side by side on identical initial conditions and asserts the
prognostic fields and all shared diagnostic series agree to near machine
precision. Skipped when the reference is unavailable.
"""

import logging
import os
import sys

import numpy as np
import pytest

REF_PATH = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF_PATH, "niwqg"))

if HAVE_REF and REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")

NSTEPS = 10
DT = 10000.0


@pytest.fixture(scope="module", autouse=True)
def _quiet_logging():
    logging.disable(logging.CRITICAL)
    yield
    logging.disable(logging.NOTSET)


def test_coupled_model_parity():
    from niwqg import CoupledModel as RefCoupled
    from niwqg import InitialConditions as ric

    from niwqg_tpu import CoupledModel

    U0 = 0.05
    ref = RefCoupled.Model(use_filter=False, U=-U0, tdiags=1,
                           tmax=NSTEPS * DT)
    k0 = 10 * (2 * np.pi / ref.L)
    q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    ref.set_q(q)
    ref.set_phi(phi)
    ref.run()

    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                           tmax=NSTEPS * DT)
    m.set_q(q)
    m.set_phi(phi)
    m.run()

    assert np.abs(ref.q - m.q).max() < 1e-12 * np.abs(ref.q).max()
    assert np.abs(ref.phi - m.phi).max() < 1e-12
    assert np.abs(ref.qh - m.qh).max() < 1e-12 * np.abs(ref.qh).max()
    assert abs(ref.Ke - m.Ke) < 1e-12 * abs(ref.Ke)

    for name in ref.diagnostics:
        a = np.asarray(ref.diagnostics[name]["value"], dtype=np.complex128)
        b = np.asarray(m.diagnostics[name]["value"], dtype=np.complex128)
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 1e-10, name


def test_qg_model_parity():
    from niwqg import QGModel as RefQG
    from niwqg import InitialConditions as ric

    from niwqg_tpu import QGModel

    U0 = 0.05
    ref = RefQG.Model(use_filter=False, U=-U0, tdiags=1,
                      passive_scalar=True, tmax=NSTEPS * DT)
    k0 = 10 * (2 * np.pi / ref.L)
    q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
    # the reference test feeds the complex PlaneWave straight to rfft2
    # (``tests/test_diagnostics.py:48``) relying on numpy silently dropping
    # the imaginary part; modern numpy raises, so take .real explicitly
    c = np.real(ric.PlaneWave(ref, k=k0, l=k0) * q.mean())
    ref.set_q(q)
    ref.set_c(c)
    ref.run()

    m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                      passive_scalar=True, tmax=NSTEPS * DT)
    m.set_q(q)
    m.set_c(c)
    m.run()

    assert np.abs(ref.q - m.q).max() < 1e-12 * np.abs(ref.q).max()
    assert np.abs(ref.c - m.c).max() < 1e-12 * (np.abs(ref.c).max() + 1e-300)
    assert abs(ref.Ke - m.Ke) < 1e-12 * abs(ref.Ke)
    assert abs(ref.cvar - m.cvar) < 1e-10 * (abs(ref.cvar) + 1e-300)

    for name in ref.diagnostics:
        a = np.asarray(ref.diagnostics[name]["value"], dtype=np.complex128)
        b = np.asarray(m.diagnostics[name]["value"], dtype=np.complex128)
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 1e-10, name


def test_uncoupled_model_parity():
    """UnCoupled (YBJ waves on evolving flow) with ``faithful_quirks=True``
    reproducing the reference's stale-gradient cadence
    (``niwqg/UnCoupledModel.py:54-64`` + ``niwqg/Kernel.py:608-611``)."""
    from niwqg import UnCoupledModel as RefUnc
    from niwqg import InitialConditions as ric

    from niwqg_tpu import UnCoupledModel

    U0 = 0.05
    # tdiags=3 deliberately off-cadence from twrite so the test covers the
    # tdiags-refresh AND the steps in between that keep stale gradients
    kw = dict(use_filter=False, U=-U0, tdiags=3, tmax=NSTEPS * DT)
    ref = RefUnc.Model(**kw)
    k0 = 10 * (2 * np.pi / ref.L)
    q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
    phi = np.asarray(ric.WavePacket(ref, k=2 * k0, l=0, R=2 * np.pi / k0,
                                    x0=ref.L / 2, y0=ref.L / 2))
    ref.set_q(q)
    ref.set_phi(phi)
    ref.run()

    m = UnCoupledModel.Model(faithful_quirks=True, **kw)
    m.set_q(q)
    m.set_phi(phi)
    m.run()

    assert np.abs(ref.q - m.q).max() < 1e-12 * np.abs(ref.q).max()
    assert np.abs(ref.phi - m.phi).max() < 1e-12 * np.abs(ref.phi).max()
    assert abs(ref.Ke - m.Ke) < 1e-12 * abs(ref.Ke)
    for name in ref.diagnostics:
        a = np.asarray(ref.diagnostics[name]["value"], dtype=np.complex128)
        b = np.asarray(m.diagnostics[name]["value"], dtype=np.complex128)
        scale = np.abs(a).max() + 1e-300
        # absolute floor: skew of the antisymmetric dipole is ~0 with
        # catastrophic cancellation, pure rounding noise on both sides
        assert np.abs(a - b).max() < 1e-10 * scale + 1e-13, name


def test_coupled_dealias_parity():
    """2/3-rule dealias mode vs the reference mask (``niwqg/Kernel.py:277-281``).

    Every other golden test runs ``dealias=False``; this one proves the
    mask itself (bitwise) and the masked 10-step trajectory."""
    from niwqg import CoupledModel as RefCoupled
    from niwqg import InitialConditions as ric

    from niwqg_tpu import CoupledModel

    U0 = 0.05
    kw = dict(use_filter=False, dealias=True, U=-U0, tdiags=1,
              tmax=NSTEPS * DT)
    ref = RefCoupled.Model(**kw)
    k0 = 10 * (2 * np.pi / ref.L)
    q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    ref.set_q(q)
    ref.set_phi(phi)
    ref.run()

    m = CoupledModel.Model(**kw)
    # the mask must be the reference's exact 2/3-rule mask
    assert np.array_equal(np.asarray(m.kernel.grid.filtr), ref.filtr)
    assert ref.filtr.min() == 0.0 and ref.filtr.max() == 1.0
    m.set_q(q)
    m.set_phi(phi)
    m.run()

    assert np.abs(ref.qh - m.qh).max() < 1e-12 * np.abs(ref.qh).max()
    assert np.abs(ref.phi - m.phi).max() < 1e-12
    assert abs(ref.Ke - m.Ke) < 1e-12 * abs(ref.Ke)
    for name in ("ke_qg", "ens", "gamma_r", "ep_psi", "pi"):
        a = np.asarray(ref.diagnostics[name]["value"])
        b = np.asarray(m.diagnostics[name]["value"])
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 1e-10, name


def test_qg_dealias_reference_crashes():
    """The reference QGModel's 2/3-rule mask uses float slice indices
    (``niwqg/QGModel.py:293-297``) — a latent Python-3 bug that makes
    ``dealias=True`` unusable there. Documented divergence: this framework
    uses the integer-index rule on the half spectrum instead
    (``grid.py:159-166``)."""
    from niwqg import QGModel as RefQG

    with pytest.raises(TypeError):
        RefQG.Model(use_filter=False, dealias=True, tmax=DT)


def test_qg_dealias_parity_repaired():
    """QG dealias trajectory vs the reference with ONLY the float-index
    bug repaired (``nx/3`` -> ``nx//3`` in ``QGModel.py:295-296``); the
    repaired reference mask must equal this framework's half-spectrum
    2/3-rule mask bitwise."""
    from niwqg import QGModel as RefQG
    from niwqg import InitialConditions as ric

    from niwqg_tpu import QGModel

    orig = RefQG.Model._initialize_filter

    def repaired(self):
        if self.dealias and not self.use_filter:
            self.filtr = np.ones_like(self.wv2)
            self.filtr[self.nx // 3:2 * self.nx // 3, :] = 0.0
            self.filtr[:, self.ny // 3:2 * self.ny // 3] = 0.0
        else:
            orig(self)

    RefQG.Model._initialize_filter = repaired
    try:
        U0 = 0.05
        kw = dict(use_filter=False, dealias=True, U=-U0, tdiags=1,
                  passive_scalar=True, tmax=NSTEPS * DT)
        ref = RefQG.Model(**kw)
        k0 = 10 * (2 * np.pi / ref.L)
        q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
        c = np.real(ric.PlaneWave(ref, k=k0, l=k0) * q.mean())
        ref.set_q(q)
        ref.set_c(c)
        ref.run()

        m = QGModel.Model(**kw)
        assert np.array_equal(np.asarray(m.kernel.grid.filtr), ref.filtr)
        m.set_q(q)
        m.set_c(c)
        m.run()

        assert np.abs(ref.q - m.q).max() < 1e-12 * np.abs(ref.q).max()
        assert np.abs(ref.c - m.c).max() < 1e-12 * (np.abs(ref.c).max()
                                                    + 1e-300)
        assert abs(ref.Ke - m.Ke) < 1e-12 * abs(ref.Ke)
        assert abs(ref.cvar - m.cvar) < 1e-10 * (abs(ref.cvar) + 1e-300)
    finally:
        RefQG.Model._initialize_filter = orig


def test_ql_model_parity():
    """Quasilinear model (``faithful_quirks=True``) vs the monkeypatch-
    repaired reference QL.

    The reference ``niwqg/QLModel.py`` is unconstructible as shipped; it is
    exactly two fixes from runnable (SURVEY.md §2 #4): set ``model`` (crash
    at ``Kernel.py:140``) and alias ``jacobian_phic_phi`` from
    ``CoupledModel.py:59-73`` (``QLModel.py:81``). With those applied, the
    faithful mode must reproduce it bug-for-bug: the ``1j`` wave-PV factor
    (``QLModel.py:83``), the unprojected ``ph`` (``QLModel.py:86``), and
    the frozen ``self.q``/``q_psi`` (``QL._invert`` never updates ``q``,
    so the refraction term and the ens/skew/conc_niw diagnostics see the
    initial vorticity forever)."""
    from niwqg import CoupledModel as RefCoupled
    from niwqg import InitialConditions as ric
    from niwqg import QLModel as RefQL

    from niwqg_tpu import QLModel

    RefQL.Model.model = "QL Model"
    RefQL.Model.jacobian_phic_phi = RefCoupled.Model.jacobian_phic_phi

    U0 = 0.05
    kw = dict(use_filter=False, U=-U0, tdiags=1, tmax=NSTEPS * DT)
    ref = RefQL.Model(**kw)
    k0 = 10 * (2 * np.pi / ref.L)
    q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
    # a localized packet so the wave PV (where the 1j quirk lives) is
    # nonzero and the frozen q_psi actually differs from the evolving q
    phi = np.asarray(ric.WavePacket(ref, k=2 * k0, l=0, R=2 * np.pi / k0,
                                    x0=ref.L / 2, y0=ref.L / 2))
    ref.set_q(q)
    ref.set_phi(phi)
    ref.run()

    m = QLModel.Model(faithful_quirks=True, **kw)
    m.set_q(q)
    m.set_phi(phi)
    m.run()

    assert np.abs(ref.qh - m.qh).max() < 1e-12 * np.abs(ref.qh).max()
    assert np.abs(ref.phi - m.phi).max() < 1e-12 * np.abs(ref.phi).max()
    # the reference's q attribute stays the initial vorticity (never
    # refreshed by QL._invert); the faithful shell mirrors that
    assert np.abs(ref.q - m.q).max() < 1e-12 * np.abs(ref.q).max()
    assert abs(ref.Ke - m.Ke) < 1e-12 * abs(ref.Ke)
    for name in ref.diagnostics:
        a = np.asarray(ref.diagnostics[name]["value"], dtype=np.complex128)
        b = np.asarray(m.diagnostics[name]["value"], dtype=np.complex128)
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() < 1e-10 * scale + 1e-13, name


def test_ql_intended_differs_from_faithful():
    """The default (intended-physics) QL must actually diverge from the
    faithful mode — guards against the quirk flags becoming dead code."""
    from niwqg import InitialConditions as ric

    from niwqg_tpu import QLModel

    U0 = 0.05
    kw = dict(use_filter=False, U=-U0, tdiags=1, tmax=NSTEPS * DT)
    runs = {}
    for faithful in (False, True):
        m = QLModel.Model(faithful_quirks=faithful, **kw)
        k0 = 10 * (2 * np.pi / m.L)
        q = ric.LambDipole(m, U=U0, R=2 * np.pi / k0)
        phi = np.asarray(ric.WavePacket(m, k=2 * k0, l=0, R=2 * np.pi / k0,
                                        x0=m.L / 2, y0=m.L / 2))
        m.set_q(q)
        m.set_phi(phi)
        m.run()
        runs[faithful] = m
    d = np.abs(runs[True].phih - runs[False].phih).max()
    assert d > 1e-8 * np.abs(runs[False].phih).max()


def test_ybj_model_parity():
    """YBJ wave-only evolution on a frozen dipole flow (faithful quirks)."""
    from niwqg import YBJModel as RefYBJ
    from niwqg import InitialConditions as ric

    from niwqg_tpu import YBJModel

    U0 = 0.05
    ref = RefYBJ.Model(use_filter=False, tdiags=1, tmax=NSTEPS * DT)
    k0 = 10 * (2 * np.pi / ref.L)
    q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
    phi = np.asarray(ric.WavePacket(ref, k=3 * k0, l=0, R=2 * np.pi / k0,
                                    x0=ref.L / 2, y0=ref.L / 2))
    ref.set_q(q)
    ref.set_phi(phi)
    for _ in range(NSTEPS):
        ref._step_etdrk4()

    m = YBJModel.Model(use_filter=False, tdiags=1, tmax=NSTEPS * DT)
    m.set_q(q)
    m.set_phi(phi)
    m.run_steps(NSTEPS)

    scale = np.abs(ref.phi).max()
    assert np.abs(ref.phi - m.phi).max() < 1e-12 * scale
