"""Pair-packed inverse real transforms (ROADMAP item 1 / VERDICT r3 #1).

Two Hermitian full-spectrum q-side transforms ride one complex inverse:
``ifft2(A + iB) = a + ib`` for real fields a, b. Pack/unpack is plane
algebra — zero strided layout ops. Correctness requires every packed
spectrum to be Hermitian (residue in A's imaginary inverse plane becomes
additive noise on b), which in this solver reduces to the O(ny) 2-column
self-mirror projection (``spectral.hermitian_project_half``) — validated
here against the full-projection default path over multiple steps.
"""

import numpy as np
import pytest

from niwqg_tpu import CoupledModel
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.carray import C
from niwqg_tpu.ops.fft import MXUTransform, NativeTransform


@pytest.mark.parametrize("provider", ["native", "mxu"])
@pytest.mark.parametrize("nf", [2, 3, 4])
def test_pairs_match_per_field_inverse(provider, nf, rng):
    nx = 64
    tr = (NativeTransform(nx, np.float64) if provider == "native"
          else MXUTransform(nx, np.float64))
    fields = rng.standard_normal((nf, nx, nx))
    zh = tr.fft2_real(fields)  # exactly Hermitian stack
    want = np.stack([np.asarray(tr.ifft2_real(C(zh.re[i], zh.im[i])))
                     for i in range(nf)])
    got = np.asarray(tr.ifft2_real_pairs(zh))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-13 * scale
    # and both reproduce the original fields
    assert np.abs(got - fields).max() < 1e-12 * scale


def _coupled(nsteps=6, **kw):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1, fast=True,
                           tmax=nsteps * 10000.0, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    m.set_q(q)
    m.set_phi(phi)
    m.run()
    return m


def test_pair_inverse_matches_default_trajectory():
    """Full-step equivalence in f64: the pair-packed kernel (full-spectrum
    q side + 2-column projection) must track the default (q_half) kernel
    to rounding error over multiple steps, including the nonzero mean-flow
    advection phase that stresses the self-mirror columns."""
    a = _coupled()                       # default: q_half layout
    b = _coupled(pair_inverse=True)      # full-width + packed inverses
    assert b.kernel.pair_inverse and not b.kernel.q_half
    qs = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-11 * qs
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-11
    assert abs(a.Ke - b.Ke) < 1e-11 * abs(a.Ke)
    assert abs(a.Kw - b.Kw) < 1e-11 * abs(a.Kw)
    for name in ("ke_qg", "gamma_r", "ep_psi", "pi"):
        va = a.diagnostics[name]["value"]
        vb = b.diagnostics[name]["value"]
        scale = np.abs(va).max()
        assert np.abs(va - vb).max() < 1e-9 * scale + 1e-18, name


def test_pair_inverse_matches_full_layout():
    """Against the full-spectrum default (q_half=False, full Hermitian
    projection on every read): isolates the pair packing + cheap
    projection from the layout change."""
    a = _coupled(q_half=False)
    b = _coupled(pair_inverse=True)
    qs = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-11 * qs
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-11
    assert abs(a.Ke - b.Ke) < 1e-11 * abs(a.Ke)


def test_pair_inverse_mxu_matches_native():
    """The TPU execution shape (matmul-DFT provider) under pair packing,
    f64, vs the native-FFT pair run."""
    a = _coupled(nsteps=4, pair_inverse=True)
    b = _coupled(nsteps=4, pair_inverse=True, backend="mxu")
    qs = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-10 * qs
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-10
    assert abs(a.Ke - b.Ke) < 1e-10 * abs(a.Ke)


def test_pair_inverse_rejects_q_half():
    with pytest.raises(ValueError):
        _coupled(nsteps=1, pair_inverse=True, q_half=True)


def test_pair_inverse_rejects_unprojected_ph_physics():
    """QL keeps ph unprojected; its anti-Hermitian content would land on
    the packed partner field (~3e-4 phi corruption in 4 f64 steps when
    this guard was missing)."""
    from niwqg_tpu import QLModel

    with pytest.raises(ValueError, match="unprojected"):
        QLModel.Model(nx=32, fast=True, faithful_quirks=True,
                      pair_inverse=True)
