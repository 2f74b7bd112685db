"""Checkpoint/restore: a resumed run must continue bit-identically.

New capability over the reference, which can only re-seed q/phi from
snapshots and loses the clock, budget accumulators and diagnostics
(SURVEY.md §5).
"""

import numpy as np

from niwqg_tpu import CoupledModel
from niwqg_tpu import InitialConditions as ic


def _make_model(tmax):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1, tmax=tmax)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    m.set_q(q)
    m.set_phi(phi)
    return m


def test_checkpoint_resume_bitwise(tmp_path):
    dt = 10000.0

    # uninterrupted 10-step run (per-step path: bitwise comparability with
    # the per-step resumed run; run()'s fused scans differ at ulp level)
    ref = _make_model(10 * dt)
    while ref.t < ref.params.tmax:
        ref._step_forward()

    # 5 steps, checkpoint, restore into a fresh model, 5 more steps
    a = _make_model(10 * dt)
    for _ in range(5):
        a._step_forward()
    ckpt = str(tmp_path / "ckpt.h5")
    a.save_checkpoint(ckpt)

    b = _make_model(10 * dt)
    b.load_checkpoint(ckpt)
    assert b.tc == 5
    while b.t < b.params.tmax:
        b._step_forward()

    assert np.array_equal(ref.q, b.q)
    assert np.array_equal(np.asarray(ref.phi), np.asarray(b.phi))
    assert ref.Ke == b.Ke and ref.Pw == b.Pw and ref.Kw == b.Kw
    # diagnostics series continue seamlessly
    assert np.array_equal(ref.diagnostics["ke_qg"]["value"],
                          b.diagnostics["ke_qg"]["value"])
