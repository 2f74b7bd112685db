"""Lazy set_* queue semantics (cold-build UX, VERDICT r4 item 5).

set_q/set_phi/set_c defer device work until the state is next read, then
flush the whole sequence through ONE jitted module. The observable
semantics must be identical to eager dispatch.
"""

import numpy as np
import pytest

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu import InitialConditions as ic


def _mk(**kw):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                           tmax=3 * 10000.0, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    return m, q


def test_set_q_captures_value_not_alias():
    m, q = _mk()
    q_orig = q.copy()
    m.set_q(q)
    q *= 0.0  # caller mutates AFTER set_q, BEFORE the lazy flush
    assert np.abs(np.asarray(m.q) - q_orig).max() < 1e-15 * np.abs(
        q_orig).max()


def test_lazy_equals_eager(monkeypatch):
    m1, q = _mk()
    m1.set_q(q)
    m1.set_phi((np.ones_like(q) + 1j) * 0.1)
    m1.run_steps(3)

    monkeypatch.setenv("NIWQG_LAZY_INIT", "0")
    m2, q2 = _mk()
    m2.set_q(q2)
    m2.set_phi((np.ones_like(q2) + 1j) * 0.1)
    m2.run_steps(3)

    # same arithmetic either way (one jitted module vs eager ops may
    # reassociate fusions: tolerance, not bitwise)
    assert np.abs(m1.q - m2.q).max() < 1e-13 * np.abs(m2.q).max()
    assert np.abs(np.asarray(m1.phi) - np.asarray(m2.phi)).max() < 1e-13
    assert abs(m1.Ke - m2.Ke) < 1e-13 * abs(m2.Ke)


def test_interleaved_reads_flush_correctly():
    m, q = _mk()
    m.set_q(q)
    ke_after_q = m.Ke  # forces a ("q",) flush
    m.set_phi((np.ones_like(q) + 1j) * 0.1)
    kw = m.Kw  # forces a ("phi",) flush
    assert np.isfinite(ke_after_q) and np.isfinite(kw) and kw > 0
    # re-seeding reuses the cached ("q",)/("phi",) modules
    m.set_q(q * 0.5)
    assert abs(m.Ke - 0.25 * ke_after_q) < 1e-10 * ke_after_q


def test_qg_set_c_lazy():
    U0 = 0.05
    m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                      passive_scalar=True, tmax=2 * 10000.0)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    c = np.real(np.asarray(ic.PlaneWave(m, k=k0, l=k0))) * 1e-2
    m.set_c(c)
    m.run_steps(2)
    assert np.isfinite(m.cvar) and m.cvar > 0
    assert np.isfinite(m.q).all()
