"""Chunked run() vs the reference per-step cadence semantics.

``run()`` executes fused ``lax.scan`` chunks between host cadence points
(diagnostics sampled inside the scan); it must reproduce the per-step
loop's observable behavior exactly: same diagnostic series (values AND
sample times), same print/snapshot cadence, same final state
(``niwqg/Kernel.py:183-217``, ``niwqg/Diagnostics.py:41-58``).
"""

import os

import numpy as np
import pytest

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu import InitialConditions as ic


def _setup(model_mod, **kw):
    U0 = 0.05
    m = model_mod.Model(use_filter=False, U=-U0, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    if model_mod is CoupledModel:
        # modest amplitude: CFL stays under cflmax through every print
        m.set_phi((np.ones_like(q) + 1j) * 2 * U0 / np.sqrt(2))
    return m


@pytest.mark.parametrize("tdiags,twrite,tsave", [(10, 1000, 10), (3, 7, 5)])
def test_chunked_run_matches_per_step(tdiags, twrite, tsave):
    """Awkward co-prime cadences force chunk boundaries at every stride."""
    nsteps = 17
    kw = dict(tmax=nsteps * 10000.0, tdiags=tdiags, twrite=twrite,
              tsave_snapshots=tsave)
    a = _setup(CoupledModel, **kw)
    a.run()

    b = _setup(CoupledModel, **kw)
    while b.t < b.params.tmax:
        b._step_forward()

    assert a.tc == b.tc == nsteps
    # XLA fuses the scan body slightly differently from the standalone
    # step, so agreement is last-ulp, not bitwise
    assert np.abs(a.q - b.q).max() < 1e-14 * np.abs(b.q).max()
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-14
    da, db = a.diagnostics, b.diagnostics
    assert np.array_equal(da["time"]["value"], db["time"]["value"])
    for name in da:
        va, vb = da[name]["value"], db[name]["value"]
        assert va.shape == vb.shape, name
        scale = np.abs(vb).max() + 1e-300
        assert np.abs(va - vb).max() < 1e-12 * scale, name


def test_chunked_run_snapshot_files(tmp_path):
    """Snapshot cadence and file layout survive chunking."""
    nsteps = 12
    kw = dict(tmax=nsteps * 10000.0, tdiags=4, twrite=6, tsave_snapshots=5,
              save_to_disk=True, overwrite=True)
    a = _setup(QGModel, path=str(tmp_path / "a"), **kw)
    a.run()
    b = _setup(QGModel, path=str(tmp_path / "b"), **kw)
    if b.saver.save_to_disk:
        b.saver.save_snapshot(b, b._snapshot_fields())
    while b.t < b.params.tmax:
        b._step_forward()
    b.saver.save_diagnostics(b.diagnostics)

    sa = sorted(os.listdir(tmp_path / "a" / "snapshots"))
    sb = sorted(os.listdir(tmp_path / "b" / "snapshots"))
    assert sa == sb and len(sa) > 1
    assert np.array_equal(a.diagnostics["time"]["value"],
                          b.diagnostics["time"]["value"])
    for name in ("ke_qg", "Ke"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        assert np.abs(va - vb).max() < 1e-12 * (np.abs(vb).max() + 1e-300), name


def test_chunked_generator_matches_per_step():
    m = _setup(QGModel, tmax=10 * 10000.0, tdiags=1)
    ys = list(m.run_with_snapshots(tsnapstart=0.0, tsnapint=5 * 10000.0))
    assert ys == [5 * 10000.0, 10 * 10000.0]
    # diagnostics were still sampled every step along the way
    assert m.diagnostics["time"]["value"].shape == (10,)
