"""Distributed correctness: N-device pencil execution equals 1-device.

The distributed-correctness analog the reference never needed (SURVEY.md
§4): a step on a sharded mesh must reproduce the single-device step to
rounding error (same arithmetic, reordered reductions/transposes).
"""

import numpy as np
import pytest

import jax

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.carray import C
from niwqg_tpu.parallel.mesh import make_mesh
from niwqg_tpu.parallel.pfft import PencilTransform

NDEV = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs >= 4 devices")
    return make_mesh(NDEV)


def test_pencil_fft_matches_fft2(mesh, rng):
    nx = 64
    z = rng.standard_normal((nx, nx)) + 1j * rng.standard_normal((nx, nx))
    tr = PencilTransform(nx, np.float64, mesh)
    got = tr.fft2(C.from_complex(z)).to_complex()
    want = np.fft.fft2(z)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13
    back = tr.ifft2(tr.fft2(C.from_complex(z))).to_complex()
    assert np.abs(back - z).max() < 1e-13


def test_pencil_rfft_matches_rfft2(mesh, rng):
    """Half-spectrum pencil path: padded columns beyond nk are zero."""
    nx = 64
    x = rng.standard_normal((nx, nx))
    tr = PencilTransform(nx, np.float64, mesh)
    nk = nx // 2 + 1
    assert tr.rfft_pad == (-nk) % NDEV
    got = tr.rfft2(x).to_complex()
    assert got.shape == (nx, nk + tr.rfft_pad)
    want = np.fft.rfft2(x)
    assert np.abs(got[:, :nk] - want).max() / np.abs(want).max() < 1e-13
    assert np.abs(got[:, nk:]).max() == 0.0
    back = np.asarray(tr.irfft2(tr.rfft2(x)))
    assert np.abs(back - x).max() < 1e-13


@pytest.mark.parametrize("chunks", [2, 4])
def test_pencil_overlap_chunks_exact_layout(mesh, rng, chunks):
    """The pipelined (chunked) transpose reproduces the monolithic
    all_to_all column layout bit-for-bit in structure (same global array,
    ~1e-13 in value) for both the full- and half-spectrum paths, with and
    without leading batch axes."""
    nx = 64
    tr0 = PencilTransform(nx, np.float64, mesh)
    trc = PencilTransform(nx, np.float64, mesh, overlap_chunks=chunks)
    assert trc.overlap_chunks == chunks
    for shape in ((nx, nx), (3, nx, nx)):
        z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        a = tr0.fft2(C.from_complex(z)).to_complex()
        b = trc.fft2(C.from_complex(z)).to_complex()
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-13, shape
        back = trc.ifft2(trc.fft2(C.from_complex(z))).to_complex()
        assert np.abs(back - z).max() < 1e-13, shape
        x = z.real
        ra = tr0.rfft2(x).to_complex()
        rb = trc.rfft2(x).to_complex()
        assert np.abs(ra - rb).max() / np.abs(ra).max() < 1e-13, shape
        rback = np.asarray(trc.irfft2(trc.rfft2(x)))
        assert np.abs(rback - x).max() < 1e-13, shape


def test_pencil_overlap_clamps_to_divisor(mesh):
    # per-device width W = 64/4 = 16; 5 does not divide it -> clamp to 4
    tr = PencilTransform(64, np.float64, mesh, overlap_chunks=5)
    assert tr.overlap_chunks == 4


def test_coupled_sharded_overlap_equals_single(mesh):
    """End-to-end: a coupled run on the overlapped pencil equals the
    unsharded run (the option is user-reachable via transform_opts)."""
    a = _coupled(mesh=None)
    b = _coupled(mesh=mesh, transform_opts={"overlap_chunks": 2})
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-13 * scale
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-13
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(a.Ke)


def _coupled(mesh=None, nsteps=5, **kw):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                           tmax=nsteps * 10000.0, mesh=mesh, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    m.set_q(q)
    m.set_phi(phi)
    m.run()
    return m


def test_coupled_sharded_pair_inverse_equals_single(mesh):
    """Pencil mesh + pair-packed inverse reads (halves the real-inverse
    group's all_to_all volume — see parallel/pfft.ifft2_real_pairs)."""
    a = _coupled(mesh=None, fast=True)
    b = _coupled(mesh=mesh, fast=True, pair_inverse=True)
    assert b.kernel.pair_inverse
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-12 * scale
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-12
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(a.Ke)


def test_coupled_sharded_equals_single(mesh):
    a = _coupled(mesh=None)
    b = _coupled(mesh=mesh)
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-13 * scale
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-13
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(a.Ke)
    for name in ("ke_qg", "gamma_r", "ep_psi"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        assert np.abs(va - vb).max() < 1e-10 * (np.abs(va).max() + 1e-300), name


def test_qg_sharded_equals_single(mesh):
    U0 = 0.05

    def build(mesh):
        m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                          passive_scalar=True, tmax=5 * 10000.0, mesh=mesh)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        c = np.real(ic.PlaneWave(m, k=k0, l=k0) * q.mean())
        m.set_q(q)
        m.set_c(c)
        m.run()
        return m

    a, b = build(None), build(mesh)
    # both run the reference's half-spectrum rfft layout (the pencil path
    # pads spectral columns); same arithmetic, reordered reductions
    assert b.kernel.grid.spectrum == "half" and b.kernel.grid.pad > 0
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-13 * scale
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(a.Ke)
    assert abs(a.cvar - b.cvar) < 1e-11 * (abs(a.cvar) + 1e-300)


@pytest.mark.parametrize("faithful", [True, False])
def test_uncoupled_sharded_equals_single(mesh, faithful):
    """UnCoupled on the pencil mesh, BOTH quirk modes: the faithful mode's
    carried stale-gradient state (refreshed only on the diagnostics
    cadence) must shard identically to the per-stage-fresh mode
    (VERDICT r4 missing 2)."""
    from niwqg_tpu import UnCoupledModel

    def build(mesh):
        U0 = 0.05
        m = UnCoupledModel.Model(use_filter=False, U=-U0, tdiags=3,
                                 tmax=7 * 10000.0, mesh=mesh,
                                 faithful_quirks=faithful)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi(np.asarray(ic.WavePacket(m, k=2 * k0, l=0,
                                           R=2 * np.pi / k0,
                                           x0=m.L / 2, y0=m.L / 2)))
        m.run()
        return m

    a, b = build(None), build(mesh)
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-13 * scale
    pscale = np.abs(np.asarray(a.phi)).max()
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-13 * pscale
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(a.Ke)
    for name in ("pe_niw", "gamma_r", "ep_phi"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        assert np.abs(va - vb).max() < 1e-10 * (np.abs(va).max() + 1e-300), name


@pytest.mark.parametrize("faithful", [True, False])
def test_uncoupled_mxu_mesh_equals_single(mesh, faithful):
    """UnCoupled under the GSPMD MXU mesh, both quirk modes."""
    from niwqg_tpu import UnCoupledModel

    def build(mesh):
        U0 = 0.05
        m = UnCoupledModel.Model(use_filter=False, U=-U0, tdiags=3,
                                 tmax=5 * 10000.0, mesh=mesh, backend="mxu",
                                 dtype=np.float64, fast=True,
                                 faithful_quirks=faithful)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi(np.asarray(ic.WavePacket(m, k=2 * k0, l=0,
                                           R=2 * np.pi / k0,
                                           x0=m.L / 2, y0=m.L / 2)))
        m.run()
        return m

    a, b = build(None), build(mesh)
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * scale
    pscale = np.abs(np.asarray(a.phi)).max()
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10 * pscale
    assert abs(a.Ke - b.Ke) < 1e-10 * abs(a.Ke)


@pytest.mark.parametrize("faithful", [True, False])
def test_ybj_sharded_equals_single(mesh, faithful):
    """YBJ (phi-only stepper, frozen flow) on the pencil mesh, both the
    end-of-step phi-refresh quirk mode and the in-stage mode."""
    from niwqg_tpu import YBJModel

    def build(mesh):
        U0 = 0.05
        m = YBJModel.Model(use_filter=False, tdiags=1, tmax=5 * 10000.0,
                           mesh=mesh, faithful_quirks=faithful)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi(np.asarray(ic.WavePacket(m, k=3 * k0, l=0,
                                           R=2 * np.pi / k0,
                                           x0=m.L / 2, y0=m.L / 2)))
        m.run()
        return m

    a, b = build(None), build(mesh)
    pscale = np.abs(np.asarray(a.phi)).max()
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-13 * pscale
    assert abs(a.Kw - b.Kw) < 1e-12 * abs(a.Kw)
    for name in ("pe_niw", "ke_niw"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        assert np.abs(va - vb).max() < 1e-10 * (np.abs(va).max() + 1e-300), name


@pytest.mark.parametrize("faithful", [True, False])
def test_ybj_mxu_mesh_equals_single(mesh, faithful):
    """YBJ under the GSPMD MXU mesh, both quirk modes."""
    from niwqg_tpu import YBJModel

    def build(mesh):
        U0 = 0.05
        m = YBJModel.Model(use_filter=False, tdiags=1, tmax=4 * 10000.0,
                           mesh=mesh, backend="mxu", dtype=np.float64,
                           faithful_quirks=faithful)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi(np.asarray(ic.WavePacket(m, k=3 * k0, l=0,
                                           R=2 * np.pi / k0,
                                           x0=m.L / 2, y0=m.L / 2)))
        m.run()
        return m

    a, b = build(None), build(mesh)
    pscale = np.abs(np.asarray(a.phi)).max()
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10 * pscale
    assert abs(a.Kw - b.Kw) < 1e-10 * abs(a.Kw)


def test_coupled_mxu_mesh_equals_single(mesh):
    """The TPU multi-chip story: MXUTransform matmul-DFTs partitioned by
    GSPMD from the mesh shardings (no shard_map). f64 on the virtual CPU
    mesh; must reproduce the single-device MXU run to rounding error."""
    def build(mesh):
        U0 = 0.05
        m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                               tmax=3 * 10000.0, mesh=mesh, backend="mxu",
                               dtype=np.float64, fast=True)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi((np.ones_like(q) + 1j) * 2 * U0 / np.sqrt(2))
        m.run()
        return m

    a, b = build(None), build(mesh)
    # the mesh keeps the half-spectrum q side (row-sharded, since
    # nx//2+1 never divides the mesh — see shard_wave_state)
    assert a.kernel.q_half and b.kernel.q_half
    assert b.state.qh.re.shape[-1] == b.nx // 2 + 1
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * scale
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10
    assert abs(a.Ke - b.Ke) < 1e-10 * abs(a.Ke)


def test_ql_mxu_mesh_equals_single(mesh):
    """Quasilinear model under the GSPMD mesh (q_half auto-disables: QL
    keeps ph unprojected, so the q side must stay full-spectrum)."""
    from niwqg_tpu import QLModel

    def build(mesh):
        U0 = 0.05
        m = QLModel.Model(use_filter=False, U=-U0, tdiags=1,
                          tmax=3 * 10000.0, mesh=mesh, backend="mxu",
                          dtype=np.float64, fast=True,
                          faithful_quirks=True)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi(np.asarray(ic.WavePacket(m, k=2 * k0, l=0,
                                           R=2 * np.pi / k0,
                                           x0=m.L / 2, y0=m.L / 2)))
        m.run()
        return m

    a, b = build(None), build(mesh)
    assert not a.kernel.q_half and not b.kernel.q_half
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * scale
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10
    assert abs(a.Ke - b.Ke) < 1e-10 * (abs(a.Ke) + 1e-300)


def test_qg_mxu_mesh_equals_single(mesh):
    """MXU provider under a mesh keeps the half-spectrum layout (rfft_pad
    is 0: GSPMD pads internally, no grid padding needed)."""
    def build(mesh):
        U0 = 0.05
        m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                          tmax=3 * 10000.0, mesh=mesh, backend="mxu",
                          dtype=np.float64)
        k0 = 10 * (2 * np.pi / m.L)
        m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
        m.run()
        return m

    a, b = build(None), build(mesh)
    assert b.kernel.grid.spectrum == "half" and b.kernel.grid.pad == 0
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * scale
    assert abs(a.Ke - b.Ke) < 1e-10 * abs(a.Ke)
