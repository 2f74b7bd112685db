"""Sharded checkpoint-resume: a mesh model restored from checkpoint must
carry pencil-consistent shardings and continue the trajectory exactly
(VERDICT r4 weakness 1 / next-round item 3).

The checkpoint reader builds host-placed arrays; ``load_checkpoint`` must
re-apply the model's ``_shard`` so the compiled step sees the same mesh
layout as an uninterrupted run — both distributed providers.
"""

import numpy as np
import pytest

import jax

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.parallel.mesh import make_mesh

NDEV = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs >= 4 devices")
    return make_mesh(NDEV)


def _coupled(mesh, backend, nsteps):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                           tmax=nsteps * 10000.0, mesh=mesh, backend=backend,
                           dtype=np.float64)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
    return m


def _assert_same_shardings(got, want, names=("qh", "phih")):
    for name in names:
        g = getattr(got, name).re
        w = getattr(want, name).re
        assert g.sharding.is_equivalent_to(w.sharding, g.ndim), (
            name, g.sharding, w.sharding)


@pytest.mark.parametrize("backend", ["auto", "mxu"])
def test_coupled_sharded_checkpoint_resume(mesh, tmp_path, backend):
    n, m_more = 4, 4

    # uninterrupted n+m mesh run
    ref = _coupled(mesh, backend, n + m_more)
    ref.run_steps(n)
    ref.run_steps(m_more)

    # n steps -> checkpoint -> fresh mesh model -> load -> m more steps
    a = _coupled(mesh, backend, n + m_more)
    a.run_steps(n)
    ckpt = str(tmp_path / f"ckpt_{backend}.h5")
    a.save_checkpoint(ckpt)

    b = _coupled(mesh, backend, n + m_more)
    b.load_checkpoint(ckpt)
    assert b.tc == n
    # the restored state must carry the mesh layout, not host placement
    _assert_same_shardings(b.state, a.state)
    assert len(b.state.qh.re.sharding.device_set) == NDEV
    b.run_steps(m_more)

    scale = np.abs(ref.q).max()
    assert np.abs(ref.q - b.q).max() < 1e-14 * scale
    assert np.abs(np.asarray(ref.phi) - np.asarray(b.phi)).max() < 1e-14
    assert abs(ref.Ke - b.Ke) < 1e-14 * abs(ref.Ke)


def test_qg_sharded_checkpoint_resume(mesh, tmp_path):
    U0 = 0.05

    def build():
        m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                          passive_scalar=True, tmax=8 * 10000.0, mesh=mesh)
        k0 = 10 * (2 * np.pi / m.L)
        m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
        m.set_c(np.real(np.asarray(ic.PlaneWave(m, k=k0, l=k0))) * 1e-2)
        return m

    ref = build()
    ref.run_steps(4)
    ref.run_steps(4)

    a = build()
    a.run_steps(4)
    ckpt = str(tmp_path / "ckpt_qg.h5")
    a.save_checkpoint(ckpt)

    b = build()
    b.load_checkpoint(ckpt)
    assert b.tc == 4
    _assert_same_shardings(b.state, a.state, names=("qh", "ch"))
    assert len(b.state.qh.re.sharding.device_set) == NDEV
    b.run_steps(4)

    scale = np.abs(ref.q).max()
    assert np.abs(ref.q - b.q).max() < 1e-14 * scale
    assert abs(ref.cvar - b.cvar) < 1e-13 * (abs(ref.cvar) + 1e-300)
