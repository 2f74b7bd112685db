"""2-D Fourier transform providers.

Two interchangeable backends, both operating on :class:`~niwqg_tpu.carray.C`
re/im pairs with arbitrary leading batch axes ``(..., ny, nx)``:

``NativeTransform``
    Thin wrapper over ``jnp.fft`` (pocketfft on CPU). Used for the float64
    CPU path: parity tests against the reference NumPy solver
    (``niwqg/Kernel.py:553-566`` binds ``np.fft.fft2/ifft2``;
    ``niwqg/QGModel.py:551-552`` binds ``rfft2/irfft2``).

``MXUTransform``
    TPU-native path. The target TPU backend exposes no complex dtype and no
    FFT op, so the DFT is evaluated as dense matrix products riding the MXU:
    ``Zh = F @ Z @ F`` with the symmetric DFT matrix ``F[a,b] =
    exp(-2*pi*i*a*b/n)``. Complex algebra is expanded into real matmuls.
    Because the MXU's native f32 matmul on this backend is bf16-grade, the
    default ``precision='split'`` mode splits each operand into
    bf16 hi/lo parts and recovers ~f32 accuracy with 3 matmuls
    (Ootomo-style error-free-ish transformation).

Both support the half-spectrum (real-input) layout used by the standalone
QG model via Hermitian expansion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..carray import C


# ----------------------------------------------------------------------
# native (jnp.fft) provider
# ----------------------------------------------------------------------
class NativeTransform:
    """jnp.fft-backed transforms (CPU/GPU; complex dtype required)."""

    def __init__(self, nx: int, dtype=np.float64):
        self.nx = nx
        self.dtype = np.dtype(dtype)
        self.nk_half = nx // 2 + 1

    def _c(self, z: C):
        return jax.lax.complex(z.re, z.im)

    def fft2(self, z: C) -> C:
        zh = jnp.fft.fft2(self._c(z))
        return C(jnp.real(zh), jnp.imag(zh))

    def ifft2(self, zh: C) -> C:
        z = jnp.fft.ifft2(self._c(zh))
        return C(jnp.real(z), jnp.imag(z))

    def fft2_real(self, x) -> C:
        """Full-spectrum transform of a real field."""
        zh = jnp.fft.fft2(x.astype(self._cplx()))
        return C(jnp.real(zh), jnp.imag(zh))

    def ifft2_real(self, zh: C):
        """Real part of the inverse transform."""
        return jnp.real(jnp.fft.ifft2(self._c(zh)))

    def rfft2(self, x) -> C:
        zh = jnp.fft.rfft2(x)
        return C(jnp.real(zh), jnp.imag(zh))

    def irfft2(self, zh: C):
        return jnp.fft.irfft2(self._c(zh), s=(zh.re.shape[-2], self.nx))

    def _cplx(self):
        return np.complex128 if self.dtype == np.float64 else np.complex64


# ----------------------------------------------------------------------
# MXU (matmul-DFT) provider
# ----------------------------------------------------------------------
def _mask_split(a):
    """Bit-masked hi/lo split of f32: hi keeps the top 16 bits (exactly
    bf16-representable), lo = a - hi.

    This MUST be done by masking the mantissa, not via ``astype(bfloat16)``:
    on the target TPU backend bf16 casts are no-ops (verified empirically —
    ``astype(bf16)`` returns the f32 values unchanged), while the MXU itself
    rounds f32 matmul operands to bf16 internally. Masking makes the hi part
    exact under that internal rounding so the 3-pass sum recovers ~16
    mantissa bits (~1e-5 relative), vs ~2.6e-3 for a native f32 matmul.
    """
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(ai & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi, a - hi


def _mask_split3(a):
    """3-way masked split (top 16 / next 16 / rest) for 6-pass matmuls."""
    hi, rest = _mask_split(a)
    mid, lo = _mask_split(rest)
    return hi, mid, lo


def _mm_split(a, b):
    """a @ b at ~16-mantissa-bit accuracy via 3 MXU passes.

    ``b`` is pre-split ``(b_hi, b_lo)``; the ``a @ b_lo`` term uses the full
    ``a`` so the (tiny) lo*lo cross term rides along for free.
    """
    b_hi, b_lo = b
    a_hi, a_lo = _mask_split(a)
    return a @ b_lo + a_lo @ b_hi + a_hi @ b_hi


def _mm_split3(a, b):
    """a @ b at ~f32 accuracy via 6 MXU passes (3-way splits)."""
    b_hi, b_mid, b_lo = b
    a_hi, a_mid, a_lo = _mask_split3(a)
    return (a_hi @ b_hi
            + (a_hi @ b_mid + a_mid @ b_hi)
            + (a @ b_lo + a_mid @ b_mid + a_lo @ b_hi))


def _mm_fast(a, b):
    """Single-pass matmul (device-native precision, bf16-grade on TPU)."""
    return jnp.dot(a, b[0], preferred_element_type=a.dtype)


def _mm_f32(a, b):
    """Plain dot — true f32/f64 on CPU, bf16-grade on this TPU backend."""
    return jnp.dot(a, b[0], preferred_element_type=a.dtype)


def _auto_factors(nx: int):
    """Pick (n1, n2) for the four-step factorization, or None for dense.

    Dense is O(n) matmul work per point; four-step is O(n1+n2) but with
    poorer MXU utilisation on the small-K stage. Measured on the target
    v5e (ms per 2048x2048 c64 slice, 'split' precision): dense 5.15,
    (128,16) 3.55, (64,32) 6.79; at 1024 dense 0.66 vs (128,8) 0.60 —
    so: dense below 2048, and n1=128 (one MXU-perfect stage) above.
    """
    if nx < 2048 or (nx & (nx - 1)) != 0:
        return None
    return (128, nx // 128)


class MXUTransform:
    """DFT-as-matmul transforms for complex-free TPU backends.

    1-D DFTs along an axis are evaluated either densely
    (``Zh = Z @ F`` with the symmetric DFT matrix, O(n) MACs/point) or by
    the four-step (Bailey) factorization ``n = n1*n2`` — DFT over x1,
    twiddle, DFT over x2, index transpose — at O(n1+n2) MACs/point, which
    is what keeps 1024²+ grids off the dense O(n³) cliff. 2-D transforms
    apply the 1-D pass along both axes. Leading batch axes are flattened
    into the matmul row dimension so a batched transform is one big matmul.
    Inverses fold 1/n into the conjugated tables.
    """

    def __init__(self, nx: int, dtype=np.float32, precision: str = "auto",
                 factors="auto", use_pallas: bool = False,
                 pallas_interpret: bool = False):
        self.nx = nx
        self.dtype = np.dtype(dtype)
        self.nk_half = nx // 2 + 1
        if precision == "auto":
            # f64/CPU: plain dot is exact enough; f32/TPU: recover via split
            precision = "split" if self.dtype == np.float32 else "f32"
        self.precision = precision
        self._mm = {"split": _mm_split, "split3": _mm_split3,
                    "fast": _mm_fast, "f32": _mm_f32}[precision]
        self.factors = _auto_factors(nx) if factors == "auto" else factors
        # fused Pallas complex-split matmul (TPU; 'split' precision only)
        self.use_pallas = bool(use_pallas) and precision == "split" \
            and self.dtype == np.float32
        self.pallas_interpret = pallas_interpret

        a = np.arange(nx)
        theta = -2.0 * np.pi * np.outer(a, a) / nx  # forward sign convention
        F = np.exp(1j * theta)
        G = np.conj(F) / nx  # inverse, 1/n folded per axis
        self._Fr = self._const(F.real)
        self._Fi = self._const(F.imag)
        self._Gr = self._const(G.real)
        self._Gi = self._const(G.imag)

        # dedicated half-spectrum (real-FFT) matrices: forward keeps only
        # nk = nx//2+1 columns; inverse reconstructs the real signal with
        # Hermitian weights w = [1, 2, ..., 2, 1] folded in — ~3x fewer
        # matmul units than full-spectrum + hermitian-expand.
        nk = self.nk_half
        Fh = F[:, :nk]
        self._Rf = (self._const(Fh.real), self._const(Fh.imag))
        m = np.arange(nk)
        j = np.arange(nx)
        w = np.full(nk, 2.0)
        w[0] = 1.0
        if nx % 2 == 0:
            w[-1] = 1.0
        ang = 2.0 * np.pi * np.outer(m, j) / nx
        A = (w[:, None] * np.cos(ang)) / nx
        B = (-w[:, None] * np.sin(ang)) / nx
        self._Ri = (self._const(A), self._const(B))

        if self.factors is not None:
            n1, n2 = self.factors
            assert n1 * n2 == nx, (n1, n2, nx)

            def dft_mat(n, inverse, scale=1.0):
                idx = np.arange(n)
                M = np.exp((1j if inverse else -1j) * 2.0 * np.pi
                           * np.outer(idx, idx) / n) * scale
                return M

            # twiddle T[k1, x2] = exp(∓2πi k1 x2 / n); transposed layout
            # (x2, k1) matches the (..., x2, k1) intermediate
            k1 = np.arange(n1)
            x2 = np.arange(n2)
            Tf = np.exp(-2j * np.pi * np.outer(x2, k1) / nx)
            Ti = np.conj(Tf)
            self._four_fwd = self._four_tables(dft_mat(n1, False),
                                               dft_mat(n2, False), Tf)
            # fold the full 1/n into the n2-stage of the inverse
            self._four_inv = self._four_tables(dft_mat(n1, True),
                                               dft_mat(n2, True, 1.0 / nx),
                                               Ti)

    def _four_tables(self, M1, M2, T):
        return {
            "M1": (self._const(M1.real), self._const(M1.imag)),
            "M2": (self._const(M2.real), self._const(M2.imag)),
            "T": C.from_complex(T, dtype=self.dtype),
        }

    def _const(self, m: np.ndarray):
        m = jnp.asarray(m.astype(self.dtype))
        if self.precision == "split":
            return _mask_split(m)
        if self.precision == "split3":
            return _mask_split3(m)
        return (m,)

    # -- core complex matmul on the last axis ------------------------------
    @staticmethod
    def _pick_tile(n: int, prefs):
        for t in prefs:
            if n % t == 0:
                return t
        return n

    def _right_mul(self, z: C, M) -> C:
        """(z @ M) for complex z pair and complex constant M=(Mr, Mi),
        where Mr/Mi are pre-split tuples."""
        Mr, Mi = M
        if self.use_pallas and z.re.ndim == 2:
            K = z.re.shape[1]
            N = Mr[0].shape[1]
            Mrows = z.re.shape[0]
            if K >= 256 and N >= 256 and Mrows % 8 == 0:
                from .pallas_mm import csplit_matmul

                tm = self._pick_tile(Mrows, (256, 128, 64, 32, 16, 8))
                tn = self._pick_tile(N, (512, 256, 128))
                tk = self._pick_tile(K, (512, 256, 128))
                re, im = csplit_matmul(z.re, z.im, Mr[0], Mr[1], Mi[0], Mi[1],
                                       tm=tm, tn=tn, tk=tk,
                                       interpret=self.pallas_interpret)
                return C(re, im)
        mm = self._mm
        re = mm(z.re, Mr) - mm(z.im, Mi)
        im = mm(z.re, Mi) + mm(z.im, Mr)
        return C(re, im)

    def _flatten_mm(self, z: C, M) -> C:
        """Right-multiply with leading axes flattened into rows."""
        shape = z.re.shape
        if len(shape) > 2:
            flat = C(z.re.reshape(-1, shape[-1]), z.im.reshape(-1, shape[-1]))
            out = self._right_mul(flat, M)
            n_out = out.re.shape[-1]
            return C(
                out.re.reshape(shape[:-1] + (n_out,)),
                out.im.reshape(shape[:-1] + (n_out,)),
            )
        return self._right_mul(z, M)

    # -- 1-D DFT along the last axis ---------------------------------------
    def _swap(self, z: C) -> C:
        return C(jnp.swapaxes(z.re, -1, -2), jnp.swapaxes(z.im, -1, -2))

    def _dft_last(self, z: C, inverse: bool) -> C:
        if self.factors is None:
            M = (self._Gr, self._Gi) if inverse else (self._Fr, self._Fi)
            return self._flatten_mm(z, M)
        tab = self._four_inv if inverse else self._four_fwd
        n1, n2 = self.factors
        lead = z.re.shape[:-1]
        zr = C(z.re.reshape(lead + (n1, n2)), z.im.reshape(lead + (n1, n2)))
        # DFT over x1: layout (..., x2, x1) @ M1 -> (..., x2, k1)
        a1 = self._flatten_mm(self._swap(zr), tab["M1"])
        a1 = a1 * tab["T"]  # twiddle, (x2, k1) layout
        # DFT over x2: layout (..., k1, x2) @ M2 -> (..., k1, k2)
        a2 = self._flatten_mm(self._swap(a1), tab["M2"])
        # output index k = k2*n1 + k1 -> (..., k2, k1) then flatten
        out = self._swap(a2)
        return C(out.re.reshape(lead + (self.nx,)),
                 out.im.reshape(lead + (self.nx,)))

    # -- public API --------------------------------------------------------
    def fft2(self, z: C) -> C:
        z = self._dft_last(z, inverse=False)          # along x
        z = self._swap(self._dft_last(self._swap(z), inverse=False))  # y
        return z

    def ifft2(self, zh: C) -> C:
        zh = self._dft_last(zh, inverse=True)
        zh = self._swap(self._dft_last(self._swap(zh), inverse=True))
        return zh

    def fft2_real(self, x) -> C:
        return self.fft2(C(x, jnp.zeros_like(x)))

    def ifft2_real(self, zh: C):
        return self.ifft2(zh).re

    def _real_mm_flat(self, x, M):
        """Real (…, K) @ (K, N) with leading axes flattened."""
        shape = x.shape
        flat = x.reshape(-1, shape[-1]) if x.ndim > 2 else x
        out = self._mm(flat, M)
        if x.ndim > 2:
            out = out.reshape(shape[:-1] + (out.shape[-1],))
        return out

    def rfft2(self, x) -> C:
        # pass 1: real DFT along x keeping nk columns (2 real matmuls)
        z = C(self._real_mm_flat(x, self._Rf[0]),
              self._real_mm_flat(x, self._Rf[1]))
        # pass 2: full complex DFT along y
        return self._swap(self._dft_last(self._swap(z), inverse=False))

    def irfft2(self, zh: C):
        # pass 1: inverse complex DFT along y
        z = self._swap(self._dft_last(self._swap(zh), inverse=True))
        # pass 2: Hermitian-weighted real reconstruction along x
        return (self._real_mm_flat(z.re, self._Ri[0])
                + self._real_mm_flat(z.im, self._Ri[1]))


def make_transform(nx: int, dtype, backend: str = "auto",
                   precision: str = "auto", **mxu_opts):
    """Pick a transform provider.

    ``backend='auto'`` selects MXU on TPU-like platforms (no complex
    support) and native FFT elsewhere. ``mxu_opts`` (``factors``,
    ``use_pallas``, ``pallas_interpret``) pass through to MXUTransform and
    are ignored for the native provider.
    """
    if backend == "auto":
        plat = jax.default_backend()
        backend = "mxu" if plat not in ("cpu", "gpu", "cuda", "rocm") else "native"
    if backend == "native":
        return NativeTransform(nx, dtype)
    if backend == "mxu":
        return MXUTransform(nx, dtype, precision=precision, **mxu_opts)
    raise ValueError(f"unknown transform backend {backend!r}")
