"""Native async snapshot writer: correctness + non-blocking streaming."""

import glob
import os

import numpy as np
import pytest

from niwqg_tpu import CoupledModel
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.io_native import AsyncSnapshotWriter, available

pytestmark = pytest.mark.skipif(not available(),
                                reason="g++/native writer unavailable")


def test_roundtrip_npy(tmp_path):
    w = AsyncSnapshotWriter()
    arrays = {f"a{i}": np.random.default_rng(i).standard_normal((64, 64))
              for i in range(8)}
    for name, a in arrays.items():
        w.submit_npy(str(tmp_path / f"{name}.npy"), a)
    w.drain()
    assert w.errors() == 0
    for name, a in arrays.items():
        back = np.load(tmp_path / f"{name}.npy")
        assert np.array_equal(back, a)
    w.close()


def test_model_npy_async_snapshots(tmp_path):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=5,
                           tmax=10 * 10000.0, tsave_snapshots=5,
                           save_to_disk=True, path=str(tmp_path / "out"),
                           snapshot_format="npy-async")
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
    m.run()
    m.saver.drain()

    snaps = sorted(glob.glob(str(tmp_path / "out" / "snapshots" / "*.q.npy")))
    assert len(snaps) >= 2
    last_q = np.load(snaps[-1])
    assert np.array_equal(last_q, m.q)
    # diagnostics.h5 still written in the reference layout
    assert os.path.exists(tmp_path / "out" / "diagnostics.h5")
