"""ETDRK4 coefficient construction unit tests (no reference import)."""

import numpy as np

from niwqg_tpu.etdrk4 import _contour_phis, build_coefs, linear_operator_q
from niwqg_tpu.grid import Grid


def _direct_phis(ch, dt, M=32, rho=1.0):
    """Unchunked textbook evaluation (the reference's broadcast form)."""
    r = rho * np.exp(2j * np.pi * ((np.arange(1.0, M + 1)) / M))
    LR = ch[..., np.newaxis] + r[np.newaxis, np.newaxis, :]
    LR2, LR3 = LR * LR, LR * LR * LR
    Qh = dt * (((np.exp(LR / 2.0) - 1.0) / LR).mean(axis=-1))
    f0 = dt * ((((-4.0 - LR + (np.exp(LR) * (4.0 - 3.0 * LR + LR2))) / LR3)
                .mean(axis=-1)))
    fab = dt * (((2.0 + LR + np.exp(LR) * (-2.0 + LR)) / LR3).mean(axis=-1))
    fc = dt * (((-4.0 - 3.0 * LR - LR2 + np.exp(LR) * (4.0 - LR)) / LR3)
               .mean(axis=-1))
    return Qh, f0, fab, fc


def test_chunked_equals_direct():
    g = Grid(nx=96, L=5e5, dtype=np.dtype("float64"))
    c = linear_operator_q(g, U=-0.05, nu4=5e9, nu=20.0, mu=1e-8)
    dt = 1e4
    got = _contour_phis(c * dt, dt)
    want = _direct_phis(c * dt, dt)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_small_ch_limits():
    """As ch -> 0 the phi-functions approach their analytic limits:
    Qh -> dt/2, f0 -> dt/6, fab -> dt/6, fc -> dt/6."""
    ch = np.zeros((4, 4), np.complex128)
    dt = 2.0
    Qh, f0, fab, fc = _contour_phis(ch, dt)
    assert np.allclose(Qh, dt / 2, rtol=1e-12)
    assert np.allclose(f0, dt / 6, rtol=1e-10)
    assert np.allclose(fab, dt / 6, rtol=1e-10)
    assert np.allclose(fc, dt / 6, rtol=1e-10)


def test_threaded_chunks_bitwise_invariant(monkeypatch):
    """Worker count must not change a single bit (chunks are elementwise
    and disjoint; numpy ufuncs evaluated per chunk either way)."""
    g = Grid(nx=128, L=5e5, dtype=np.dtype("float64"))
    c = linear_operator_q(g, U=-0.05, nu4=5e9, nu=20.0, mu=1e-8)
    dt = 1e4
    monkeypatch.setenv("NIWQG_ETDRK4_WORKERS", "1")
    serial = _contour_phis(c * dt, dt)
    monkeypatch.setenv("NIWQG_ETDRK4_WORKERS", "4")
    threaded = _contour_phis(c * dt, dt)
    for a, b in zip(serial, threaded):
        assert np.array_equal(a, b)


def test_mirror_skipped_for_asymmetric_operator():
    """An operator without the l<->-l row symmetry (synthetic) must NOT
    take the mirror shortcut — full evaluation, equal to the textbook
    broadcast."""
    rng = np.random.default_rng(5)
    ch = (-np.abs(rng.standard_normal((32, 32))) * 1e-2
          - 1j * rng.standard_normal((32, 32)) * 1e-3)
    dt = 1e4
    got = _contour_phis(ch, dt)
    want = _direct_phis(ch, dt)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_table_disk_cache_roundtrip(monkeypatch, tmp_path):
    """The persistent contour-table cache returns bitwise-identical
    tables on the second build and ignores corrupt entries."""
    import os

    from niwqg_tpu import etdrk4

    monkeypatch.setenv("NIWQG_TABLE_CACHE", str(tmp_path))
    monkeypatch.setattr(etdrk4, "_TABLE_CACHE_MIN_ELEMS", 0)
    g = Grid(nx=64, L=5e5, dtype=np.dtype("float64"))
    c = linear_operator_q(g, U=-0.05, nu4=5e9, nu=20.0, mu=1e-8)
    dt = 1e4
    cold = etdrk4._contour_phis_cached(c * dt, dt)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].suffix == ".npz"
    warm = etdrk4._contour_phis_cached(c * dt, dt)
    for a, b in zip(cold, warm):
        assert np.array_equal(a, b)
    # a different operator gets its own entry, not a collision
    c2 = linear_operator_q(g, U=-0.04, nu4=5e9, nu=20.0, mu=1e-8)
    other = etdrk4._contour_phis_cached(c2 * dt, dt)
    assert len(list(tmp_path.iterdir())) == 2
    assert not np.array_equal(other[0], cold[0])
    # corrupt entry: rebuilt, not crashed
    files[0].write_bytes(b"garbage")
    again = etdrk4._contour_phis_cached(c * dt, dt)
    for a, b in zip(cold, again):
        assert np.array_equal(a, b)


def test_table_cache_disabled_by_default_for_small_grids(monkeypatch,
                                                         tmp_path):
    monkeypatch.setenv("NIWQG_TABLE_CACHE", str(tmp_path))
    g = Grid(nx=64, L=5e5, dtype=np.dtype("float64"))
    c = linear_operator_q(g, U=-0.05, nu4=5e9, nu=20.0, mu=1e-8)
    from niwqg_tpu import etdrk4

    etdrk4._contour_phis_cached(c * 1e4, 1e4)
    assert list(tmp_path.iterdir()) == []  # below the size threshold
