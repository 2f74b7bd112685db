"""Substrate tests: FFT round-trip and Parseval identity.

Port of the reference test family (``niwqg/tests/test_fft.py``), extended
with cross-checks of the MXU matmul-DFT provider against the native FFT.
"""

import numpy as np
import pytest

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu.carray import C
from niwqg_tpu.ops.fft import MXUTransform, NativeTransform


def relative_error(var1, var2):
    diffvar = np.abs(var1 - var2)
    return max(diffvar / var1, diffvar / var2).real


class TestQGNIWFFT:
    """Full complex-FFT layout (``tests/test_fft.py:12-41``)."""

    def setup_method(self):
        self.m = CoupledModel.Model(use_filter=False)
        rng = np.random.default_rng(42)
        self.qi = rng.standard_normal((self.m.ny, self.m.nx))
        self.phii = rng.standard_normal((self.m.ny, self.m.nx)) + 1j * rng.standard_normal((self.m.ny, self.m.nx))

    def test_forward_backward(self, rtol=1e-15):
        tr = self.m.kernel.tr
        qn = tr.ifft2_real(tr.fft2_real(np.asarray(self.qi)))
        phin = tr.ifft2(tr.fft2(C.from_complex(self.phii))).to_complex()
        assert np.allclose(np.asarray(qn), self.qi, rtol=rtol)
        assert np.allclose(phin, self.phii, rtol=rtol)

    def test_parseval(self, rtol=1e-15):
        self.m.set_q(self.qi)
        var_q_spec = float(np.asarray(self.m.kernel.spec_var(self.m.state.qh)))
        assert relative_error(var_q_spec, self.qi.var()) < rtol

        self.m.set_phi(self.phii)
        var_phi_spec = float(np.asarray(self.m.kernel.spec_var(self.m.state.phih)))
        assert relative_error(var_phi_spec, self.phii.var()) < rtol


class TestQGFFT:
    """Half-spectrum (rfft) layout (``tests/test_fft.py:43-62``)."""

    def setup_method(self):
        self.m = QGModel.Model(use_filter=False)
        rng = np.random.default_rng(43)
        self.qi = rng.standard_normal((self.m.ny, self.m.nx))

    def test_forward_backward(self, rtol=1e-15):
        tr = self.m.kernel.tr
        qn = tr.irfft2(tr.rfft2(np.asarray(self.qi)))
        assert np.allclose(np.asarray(qn), self.qi, rtol=rtol)

    def test_parseval(self, rtol=1e-15):
        self.m.set_q(self.qi)
        var_q_spec = float(np.asarray(self.m.kernel.spec_var(self.m.state.qh)))
        assert relative_error(var_q_spec, self.qi.var()) < rtol


class TestMXUTransform:
    """matmul-DFT provider vs native FFT (TPU-path correctness on CPU)."""

    def setup_method(self):
        self.nx = 64
        rng = np.random.default_rng(44)
        self.z = rng.standard_normal((self.nx, self.nx)) + 1j * rng.standard_normal((self.nx, self.nx))
        self.x = rng.standard_normal((self.nx, self.nx))

    def test_fft2_matches_native_f64(self):
        mxu = MXUTransform(self.nx, np.float64)
        got = mxu.fft2(C.from_complex(self.z)).to_complex()
        want = np.fft.fft2(self.z)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    def test_ifft2_roundtrip_f64(self):
        mxu = MXUTransform(self.nx, np.float64)
        got = mxu.ifft2(mxu.fft2(C.from_complex(self.z))).to_complex()
        assert np.abs(got - self.z).max() < 1e-12

    def test_rfft2_and_inverse_f64(self):
        mxu = MXUTransform(self.nx, np.float64)
        zh = mxu.rfft2(np.asarray(self.x))
        want = np.fft.rfft2(self.x)
        assert np.abs(zh.to_complex() - want).max() / np.abs(want).max() < 1e-12
        back = np.asarray(mxu.irfft2(zh))
        assert np.abs(back - self.x).max() < 1e-12

    def test_split_precision_f32(self):
        """bf16 hi/lo split recovers ~f32 accuracy (explicit fallback for
        backends where Precision.HIGH is unavailable)."""
        mxu = MXUTransform(self.nx, np.float32, precision="split")
        got = mxu.fft2(C.from_complex(self.z.astype(np.complex64))).to_complex()
        want = np.fft.fft2(self.z)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 5e-6, rel

    def test_batched_transform(self):
        mxu = MXUTransform(self.nx, np.float64)
        batch = np.stack([self.z, 2 * self.z, self.z.conj()])
        got = mxu.fft2(C.from_complex(batch)).to_complex()
        want = np.fft.fft2(batch, axes=(-2, -1))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    def test_max_batch_split_is_bitwise_identical(self):
        """max_batch (the f32 TPU default: per-field transform issue,
        PERFORMANCE.md round-3) must be a pure scheduling change: every
        public entry point's output is bitwise identical to the stacked
        batch, for batch sizes that do and don't divide the chunk."""
        a = MXUTransform(self.nx, np.float64, max_batch=0)
        b = MXUTransform(self.nx, np.float64, max_batch=2)
        batch = np.stack([self.z, 2 * self.z, self.z.conj()])
        zc = C.from_complex(batch)
        for fn in ("fft2", "ifft2"):
            ra, rb = getattr(a, fn)(zc), getattr(b, fn)(zc)
            assert np.array_equal(np.asarray(ra.re), np.asarray(rb.re)), fn
            assert np.array_equal(np.asarray(ra.im), np.asarray(rb.im)), fn
        xr = np.stack([self.x, 2 * self.x, self.x * self.x])
        ra, rb = a.rfft2(xr), b.rfft2(xr)
        assert np.array_equal(np.asarray(ra.re), np.asarray(rb.re))
        assert np.array_equal(np.asarray(a.irfft2(ra)),
                              np.asarray(b.irfft2(ra)))
        # unbatched (2-D) inputs bypass the splitter entirely
        one = C.from_complex(self.z)
        assert np.array_equal(np.asarray(a.fft2(one).re),
                              np.asarray(b.fft2(one).re))

    def test_fft2_real_matches_full(self):
        """fft2_real routes through rfft2 + Hermitian expansion; must equal
        the full transform of the real field."""
        mxu = MXUTransform(self.nx, np.float64)
        got = mxu.fft2_real(np.asarray(self.x)).to_complex()
        want = np.fft.fft2(self.x)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    def test_ifft2_real_projects_non_hermitian(self):
        """ifft2_real = real(ifft2(.)) even for spectra carrying
        non-Hermitian residue (evolved Nyquist modes)."""
        mxu = MXUTransform(self.nx, np.float64)
        zh = np.fft.fft2(self.z)  # generic non-Hermitian spectrum
        got = np.asarray(mxu.ifft2_real(C.from_complex(zh)))
        want = np.fft.ifft2(zh).real
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


@pytest.mark.parametrize("half_factors", [None, (8, 4)])
@pytest.mark.parametrize("factors", [None, (8, 8)])
class TestMXUEvenOdd:
    """The even/odd real-transform path (the >=2048 TPU configuration),
    forced on at nx=64 so it runs under CPU f64. ``half_factors=(8,4)``
    additionally exercises the four-step half-length DFT (nh=32)."""

    nx = 64

    def _mk(self, factors, half_factors, dtype=np.float64, **kw):
        return MXUTransform(self.nx, dtype, factors=factors,
                            half_factors=half_factors, evenodd=True, **kw)

    def setup_method(self):
        rng = np.random.default_rng(45)
        self.x = rng.standard_normal((self.nx, self.nx))
        self.z = (rng.standard_normal((self.nx, self.nx))
                  + 1j * rng.standard_normal((self.nx, self.nx)))

    def test_rfft2_matches_numpy(self, factors, half_factors):
        mxu = self._mk(factors, half_factors)
        got = mxu.rfft2(np.asarray(self.x)).to_complex()
        want = np.fft.rfft2(self.x)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    def test_irfft2_roundtrip(self, factors, half_factors):
        mxu = self._mk(factors, half_factors)
        back = np.asarray(mxu.irfft2(mxu.rfft2(np.asarray(self.x))))
        assert np.abs(back - self.x).max() < 1e-12

    def test_fft2_real_and_ifft2_real(self, factors, half_factors):
        mxu = self._mk(factors, half_factors)
        got = mxu.fft2_real(np.asarray(self.x)).to_complex()
        want = np.fft.fft2(self.x)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
        zh = np.fft.fft2(self.z)
        got_r = np.asarray(mxu.ifft2_real(C.from_complex(zh)))
        want_r = np.fft.ifft2(zh).real
        assert np.abs(got_r - want_r).max() / np.abs(want_r).max() < 1e-12

    def test_batched_real(self, factors, half_factors):
        mxu = self._mk(factors, half_factors)
        batch = np.stack([self.x, 2 * self.x, self.x[::-1]])
        got = mxu.rfft2(np.asarray(batch)).to_complex()
        want = np.fft.rfft2(batch, axes=(-2, -1))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
        back = np.asarray(mxu.irfft2(mxu.rfft2(np.asarray(batch))))
        assert np.abs(back - batch).max() < 1e-12

    def test_split_precision_f32(self, factors, half_factors):
        mxu = self._mk(factors, half_factors, dtype=np.float32,
                       precision="split")
        got = mxu.rfft2(np.asarray(self.x.astype(np.float32))).to_complex()
        want = np.fft.rfft2(self.x)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 5e-6, rel


@pytest.mark.parametrize("factors", [None, (8, 8)])
class TestMXUGaussAndHigh:
    """The Gauss 3-matmul complex product (``gauss=True``) and the
    ``precision='high'`` single-dot mode — the round-2 TPU fast paths —
    validated against numpy on CPU for both dense and four-step DFTs."""

    nx = 64

    def setup_method(self):
        rng = np.random.default_rng(46)
        self.x = rng.standard_normal((self.nx, self.nx))
        self.z = (rng.standard_normal((self.nx, self.nx))
                  + 1j * rng.standard_normal((self.nx, self.nx)))

    def test_gauss_f64(self, factors):
        mxu = MXUTransform(self.nx, np.float64, factors=factors,
                           half_factors=(8, 4), evenodd=True, gauss=True)
        got = mxu.fft2(C.from_complex(self.z)).to_complex()
        want = np.fft.fft2(self.z)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
        zh = mxu.rfft2(np.asarray(self.x))
        wantr = np.fft.rfft2(self.x)
        assert np.abs(zh.to_complex() - wantr).max() / np.abs(wantr).max() < 1e-12
        assert np.abs(np.asarray(mxu.irfft2(zh)) - self.x).max() < 1e-12

    def test_gauss_split_f32(self, factors):
        mxu = MXUTransform(self.nx, np.float32, precision="split",
                           factors=factors, gauss=True)
        got = mxu.fft2(C.from_complex(self.z.astype(np.complex64))).to_complex()
        want = np.fft.fft2(self.z)
        rel = np.abs(got - want).max() / np.abs(want).max()
        # Gauss's (a+b) operand combination costs ~1.5x in rounding noise
        assert rel < 1e-5, rel

    def test_high_precision_mode(self, factors):
        # on CPU, Precision.HIGH dots are exact f32; on the target TPU the
        # hardware lowers them to its internal multi-pass bf16 (~1.4e-5)
        mxu = MXUTransform(self.nx, np.float32, precision="high",
                           factors=factors)
        got = mxu.fft2(C.from_complex(self.z.astype(np.complex64))).to_complex()
        want = np.fft.fft2(self.z)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-5, rel


class TestFormulationParity:
    """The 'dotgen' formulation (interior-dim dot_general contractions,
    the TPU-measured 2x winner) and the legacy 'swap' formulation must
    produce the same transforms to rounding error, across the full
    public surface including batched inputs and the even/odd real path."""

    nx = 64

    def setup_method(self):
        rng = np.random.default_rng(99)
        self.x = rng.standard_normal((3, self.nx, self.nx))
        self.z = C.from_complex(
            rng.standard_normal((3, self.nx, self.nx))
            + 1j * rng.standard_normal((3, self.nx, self.nx)))

    def _pair(self, **kw):
        mk = lambda f: MXUTransform(self.nx, np.float64, factors=(8, 8),
                                    half_factors=(8, 4), evenodd=True,
                                    formulation=f, **kw)
        return mk("dotgen"), mk("swap")

    def test_all_entry_points(self):
        a, b = self._pair()
        for name, arg in [("fft2", self.z), ("ifft2", self.z),
                          ("fft2_real", self.x), ("ifft2_real", self.z),
                          ("rfft2", self.x)]:
            got = getattr(a, name)(arg)
            want = getattr(b, name)(arg)
            if isinstance(got, C):
                got, want = got.to_complex(), want.to_complex()
            else:
                got, want = np.asarray(got), np.asarray(want)
            scale = max(np.abs(want).max(), 1e-300)
            assert np.abs(got - want).max() / scale < 1e-13, name
        zh = a.rfft2(self.x)
        np.testing.assert_allclose(np.asarray(a.irfft2(zh)),
                                   np.asarray(b.irfft2(zh)), atol=1e-13)


@pytest.mark.parametrize("factors", [(8, 8), (16, 4)])
class TestMXUMirrorFree:
    """The mirror-free real-transform path (``realpath='mf'``, the >=4096
    TPU configuration): Hermitian mirrors folded into half-range four-step
    tables, zero strided layout ops. Forced on at nx=64 under CPU f64."""

    nx = 64

    def _mk(self, factors, dtype=np.float64, **kw):
        return MXUTransform(self.nx, dtype, factors=factors,
                            realpath="mf", **kw)

    def setup_method(self):
        rng = np.random.default_rng(47)
        self.x = rng.standard_normal((self.nx, self.nx))
        self.z = (rng.standard_normal((self.nx, self.nx))
                  + 1j * rng.standard_normal((self.nx, self.nx)))

    def test_rfft2_matches_numpy(self, factors):
        mxu = self._mk(factors)
        got = mxu.rfft2(np.asarray(self.x)).to_complex()
        want = np.fft.rfft2(self.x)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    def test_irfft2_roundtrip(self, factors):
        mxu = self._mk(factors)
        back = np.asarray(mxu.irfft2(mxu.rfft2(np.asarray(self.x))))
        assert np.abs(back - self.x).max() < 1e-12

    def test_batched_real(self, factors):
        mxu = self._mk(factors)
        batch = np.stack([self.x, 2 * self.x, self.x[::-1]])
        got = mxu.rfft2(np.asarray(batch)).to_complex()
        want = np.fft.rfft2(batch, axes=(-2, -1))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
        back = np.asarray(mxu.irfft2(mxu.rfft2(np.asarray(batch))))
        assert np.abs(back - batch).max() < 1e-12

    def test_matches_evenodd_path(self, factors):
        """mf and even/odd are different factorizations of the same
        transform; outputs must agree to rounding error."""
        mf = self._mk(factors)
        eo = MXUTransform(self.nx, np.float64, factors=factors,
                          half_factors=(8, 4), evenodd=True,
                          realpath="evenodd")
        a = mf.rfft2(np.asarray(self.x)).to_complex()
        b = eo.rfft2(np.asarray(self.x)).to_complex()
        assert np.abs(a - b).max() / np.abs(b).max() < 1e-13
        zh = eo.rfft2(np.asarray(self.x))
        np.testing.assert_allclose(np.asarray(mf.irfft2(zh)),
                                   np.asarray(eo.irfft2(zh)), atol=1e-13)

    def test_projects_self_mirror_antihermitian(self, factors):
        """Anti-Hermitian residue in the self-mirror columns k=0 and
        k=nx/2 must be annihilated (the ``2*Re`` step), matching what
        ``real(ifft2(.))`` computes for evolved Nyquist content."""
        mxu = self._mk(factors)
        zh_np = np.fft.rfft2(self.x)
        zr, zi = np.real(zh_np).copy(), np.imag(zh_np).copy()
        zi[:, 0] += 3.0    # k=0 column, all rows
        zi[:, -1] += 2.0   # Nyquist column
        got = np.asarray(mxu.irfft2(C(np.asarray(zr), np.asarray(zi))))
        # reference semantics: embed in the full spectrum, real(ifft2)
        want = np.fft.irfft2(zr + 1j * zi, s=(self.nx, self.nx))
        assert np.abs(got - want).max() < 1e-12

    def test_fft2_real_and_ifft2_real(self, factors):
        mxu = self._mk(factors)
        got = mxu.fft2_real(np.asarray(self.x)).to_complex()
        want = np.fft.fft2(self.x)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
        zh = np.fft.fft2(self.z)
        got_r = np.asarray(mxu.ifft2_real(C.from_complex(zh)))
        want_r = np.fft.ifft2(zh).real
        assert np.abs(got_r - want_r).max() / np.abs(want_r).max() < 1e-12

    def test_split_precision_f32(self, factors):
        mxu = self._mk(factors, dtype=np.float32, precision="split")
        got = mxu.rfft2(np.asarray(self.x.astype(np.float32))).to_complex()
        want = np.fft.rfft2(self.x)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 5e-6, rel

    def test_max_batch_split_bitwise(self, factors):
        a = self._mk(factors, max_batch=0)
        b = self._mk(factors, max_batch=2)
        xr = np.stack([self.x, 2 * self.x, self.x * self.x])
        ra, rb = a.rfft2(xr), b.rfft2(xr)
        assert np.array_equal(np.asarray(ra.re), np.asarray(rb.re))
        assert np.array_equal(np.asarray(a.irfft2(ra)),
                              np.asarray(b.irfft2(ra)))
