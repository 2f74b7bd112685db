"""Checkpoint/restore for the standalone QG model (flat state pytree)."""

import numpy as np

from niwqg_tpu import QGModel
from niwqg_tpu import InitialConditions as ic


def _make(tmax):
    U0 = 0.05
    m = QGModel.Model(use_filter=False, U=-U0, tdiags=1, tmax=tmax,
                      passive_scalar=True)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    c = np.real(ic.PlaneWave(m, k=k0, l=k0)) * np.abs(q).max()
    m.set_q(q)
    m.set_c(c)
    return m


def test_qg_checkpoint_resume_bitwise(tmp_path):
    dt = 10000.0
    # per-step path for bitwise comparability (run()'s fused scans differ
    # at ulp level)
    ref = _make(8 * dt)
    while ref.t < ref.params.tmax:
        ref._step_forward()

    a = _make(8 * dt)
    for _ in range(4):
        a._step_forward()
    ckpt = str(tmp_path / "qg.h5")
    a.save_checkpoint(ckpt)

    b = _make(8 * dt)
    b.load_checkpoint(ckpt)
    assert b.tc == 4
    while b.t < b.params.tmax:
        b._step_forward()

    assert np.array_equal(ref.q, b.q)
    assert np.array_equal(ref.c, b.c)
    assert ref.Ke == b.Ke and ref.cvar == b.cvar
