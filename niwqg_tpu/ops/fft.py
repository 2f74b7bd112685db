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
    Because the MXU's native f32 matmul on this backend is bf16-grade
    (~2.5e-3 relative), the default f32 ``precision='high'`` issues each
    dot at ``lax.Precision.HIGH`` — the hardware's internal multi-pass
    bf16 recovery (~1.4e-5). The explicit Ootomo-style modes remain:
    ``'split'`` (bit-masked bf16 hi/lo operands, 3 matmuls, ~1e-5 — same
    grade as 'high' but ~2x slower since the row operand is read three
    times) and ``'split3'`` (6 matmuls, ~f32).

Real-field transforms (``rfft2``/``irfft2`` and the full-spectrum
``fft2_real``/``ifft2_real``) exploit realness *within a single field*,
never by packing two different fields (at the split-precision noise floor
~1e-5, cross-field packing leaks ``eps*||big||`` into the small field's
spectrum, which the wavenumber factors (k², for the wave-PV term) amplify
into an f32-at-scale instability — the round-1 4096² NaN). Two same-field
schemes, selected by ``realpath``:

``'evenodd'``
    classic even/odd split — pack ``x[0::2] + i*x[1::2]`` into one
    half-length complex DFT and recombine with an exact butterfly.
    Halves the MACs, but its strided gather, reflect/roll butterfly and
    interleave are pure layout traffic that runs at the backend's
    degraded large-buffer bandwidth (2–4 GB/s on 4096²-sized buffers —
    PERFORMANCE.md roofline), inverting its advantage at 4096.

``'mf'`` (mirror-free)
    fold the Hermitian mirror into the four-step's constant tables
    instead of materialising it: the forward x-pass restricts the
    stage-2 DFT table to the ``k2 <= n2/2`` output columns (the rest are
    conjugate mirrors); the inverse x-pass contracts only the retained
    ``m < nx/2`` input columns against half-row tables and takes
    ``2*Re(.)`` at the end (the mirror half of the true sum is exactly
    the conjugate of the retained half), plus O(ny) endpoint-column
    corrections. Slightly more MACs than even/odd (the half-range tables
    don't halve both stages) but ZERO strided gathers/flips/interleaves
    — every permutation lands in a constant table. Same implicit
    Hermitian projection semantics: ``Re(.)`` annihilates anti-Hermitian
    residue in the self-mirror columns exactly as ``real(ifft(.))`` does.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..carray import C, jmul
from .spectral import expand_half_to_full, project_full_to_half


def _cmap(f, z: C) -> C:
    """Apply a shape/layout function to both planes of a C pair."""
    return C(f(z.re), f(z.im))


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

    def ifft2_real_pairs(self, zh: C):
        """Pair-packed real inverses of a STACK of full-spectrum Hermitian
        transforms ``(nf, ny, nx)`` -> ``(nf, ny, nx)`` real fields: two
        spectra ride one complex inverse (see MXUTransform for the
        contract)."""
        return _pairs_via_ifft2(self, zh)

    def _cplx(self):
        return np.complex128 if self.dtype == np.float64 else np.complex64


def _pairs_via_ifft2(tr, zh: C):
    """Shared pair-packing driver: ``ifft2(A + iB) = a + i b`` for real
    fields a, b whose full spectra A, B are Hermitian. Pack/unpack is pure
    plane algebra (adds and leading-axis restacking — no strided gathers).

    CONTRACT: the caller must have projected anti-Hermitian residue out of
    each spectrum first (the reference's ``real(ifft(.))`` read does this
    implicitly; here the imaginary plane of each packed inverse IS the
    partner field, so any residual ``Im(ifft2(A))`` becomes additive noise
    on ``b`` instead of being discarded). In this solver all q-side
    spectra are bitwise Hermitian except the two self-mirror columns
    ``k=0, nx/2`` (mean-flow advection phase), which
    ``spectral.hermitian_project_half`` fixes in O(ny) per field.

    All pairs are packed into ONE ``(nf//2, ny, nx)`` stack and inverted
    by a single batched ``tr.ifft2`` call (leading-axis slicing only), so
    on the pencil provider the whole group rides one batched all_to_all
    transpose instead of one collective per pair.
    """
    nf = zh.re.shape[0]
    npairs = nf // 2
    outs = []
    if npairs:
        # pack: ifft2(A + iB) for A=plane 2j, B=plane 2j+1
        ev = slice(0, 2 * npairs, 2)
        od = slice(1, 2 * npairs, 2)
        z = tr.ifft2(C(zh.re[ev] - zh.im[od], zh.im[ev] + zh.re[od]))
        # unpack: interleave (a_j, b_j) = (re_j, im_j) back to field order
        shp = z.re.shape
        outs.append(jnp.stack([z.re, z.im], axis=1).reshape(
            (2 * npairs,) + shp[1:]))
    if nf % 2:
        outs.append(tr.ifft2_real(C(zh.re[-1:], zh.im[-1:])))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


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


def _dot(a, b, dn, precision=None):
    """``dot_general`` contracting one dim of ``a`` with dim 0 of ``b``;
    the result dim is appended minor-most. Contracting interior dims
    directly (instead of transposing them last and flattening to a 2-D
    matmul) measured ~2x faster on the target TPU for the four-step's
    4-/5-D intermediates — XLA does NOT fuse explicit swapaxes into the
    matmul there (scripts/exp_dft_variants.py: 20.1 -> 10.2 ms/slice
    per 2048 roundtrip)."""
    return jax.lax.dot_general(a, b, dn, precision=precision,
                               preferred_element_type=a.dtype)


def _mm_split(a, b, dn):
    """Contraction at ~16-mantissa-bit accuracy via 3 MXU passes.

    ``b`` is pre-split ``(b_hi, b_lo)``; the ``a . b_lo`` term uses the
    full ``a`` so the (tiny) lo*lo cross term rides along for free.
    """
    b_hi, b_lo = b
    a_hi, a_lo = _mask_split(a)
    return _dot(a, b_lo, dn) + _dot(a_lo, b_hi, dn) + _dot(a_hi, b_hi, dn)


def _mm_split3(a, b, dn):
    """Contraction at ~f32 accuracy via 6 MXU passes (3-way splits)."""
    b_hi, b_mid, b_lo = b
    a_hi, a_mid, a_lo = _mask_split3(a)
    return (_dot(a_hi, b_hi, dn)
            + (_dot(a_hi, b_mid, dn) + _dot(a_mid, b_hi, dn))
            + (_dot(a, b_lo, dn) + _dot(a_mid, b_mid, dn)
               + _dot(a_lo, b_hi, dn)))


def _mm_plain(a, b, dn):
    """Single-pass matmul — true f32/f64 on CPU, bf16-grade on this TPU."""
    return _dot(a, b[0], dn)


def _mm_high(a, b, dn):
    """One matmul op at ``lax.Precision.HIGH``.

    On the target TPU backend HIGH lowers to the hardware's internal
    multi-pass bf16 scheme (~1.4e-5 relative — same grade as the explicit
    3-matmul mask-split) but reads each operand once and keeps the pass
    accumulation on-chip instead of materialising hi/lo operand copies.
    """
    return _dot(a, b[0], dn, precision=jax.lax.Precision.HIGH)


def _auto_factors(nx: int, min_n: int = 1024):
    """Pick (n1, n2) for the four-step factorization, or None for dense.

    Dense is O(n) matmul work per point; four-step is O(n1+n2) but with
    poorer MXU utilisation on the small-K stage. Measured on the target
    v5e under the dotgen formulation (same-process A/Bs): at 1024 the
    four-step (128,8) wins 1.7x on roundtrips (2.24 vs 3.72 ms/slice) and
    +50% on the full coupled step (91.9 vs 61.5 steps/s); at 512 it is a
    wash (0.38 vs 0.37) so dense stays below 1024; at 2048 (128,16) beats
    (64,32) 2.3x; at 4096 (128,32) ~= (64,64). n1=128 keeps one
    MXU-perfect stage everywhere.
    """
    if nx < min_n or (nx & (nx - 1)) != 0:
        return None
    return (128, nx // 128)


class _CDFT:
    """1-D complex DFT along the last axis for one length ``n``.

    Evaluated either densely (``Zh = Z @ F``, O(n) MACs/point) or by the
    four-step (Bailey) factorization ``n = n1*n2`` — DFT over x1, twiddle,
    DFT over x2, index transpose — at O(n1+n2) MACs/point, which is what
    keeps 1024²+ grids off the dense O(n³) cliff. ``owner`` supplies the
    precision-split tables and the (possibly Pallas-fused) complex matmul.
    """

    def __init__(self, owner: "MXUTransform", n: int, factors):
        self.owner = owner
        self.n = n
        self.factors = factors
        a = np.arange(n)
        if factors is None:
            F = np.exp(-2j * np.pi * np.outer(a, a) / n)
            G = np.conj(F) / n  # inverse, 1/n folded
            self._F = owner._cconst(F.real, F.imag)
            self._G = owner._cconst(G.real, G.imag)
        else:
            n1, n2 = factors
            assert n1 * n2 == n, (n1, n2, n)

            def dft_mat(m, inverse, scale=1.0):
                idx = np.arange(m)
                return np.exp((1j if inverse else -1j) * 2.0 * np.pi
                              * np.outer(idx, idx) / m) * scale

            # twiddle T[x2, k1] = exp(∓2πi k1 x2 / n); transposed layout
            # matches the (..., x2, k1) intermediate
            k1 = np.arange(n1)
            x2 = np.arange(n2)
            Tf = np.exp(-2j * np.pi * np.outer(x2, k1) / n)
            self._fwd = owner._four_tables(dft_mat(n1, False),
                                           dft_mat(n2, False), Tf)
            # fold the full 1/n into the n2-stage of the inverse
            self._inv = owner._four_tables(dft_mat(n1, True),
                                           dft_mat(n2, True, 1.0 / n),
                                           np.conj(Tf))

    def __call__(self, z: C, inverse: bool) -> C:
        return self.along(z, inverse, axis=-1)

    def along(self, z: C, inverse: bool, axis: int) -> C:
        """DFT along ``axis`` (-1 or -2) with canonical index order in and
        out. Four-step stages contract interior dims directly with
        ``dot_general`` (result appended minor-most): one index transpose
        per pass instead of the legacy formulation's three ``swapaxes``
        (kept as ``formulation='swap'`` for A/B)."""
        assert axis in (-1, -2), axis
        ow = self.owner
        if ow.formulation == "swap":
            if axis == -1:
                return self._along_last_swap(z, inverse)
            return ow._swap(self._along_last_swap(ow._swap(z), inverse))

        if self.factors is None:
            out = ow._cdot(z, self._G if inverse else self._F, axis)
            # result dim appended minor-most; an interior axis needs one
            # transpose back into place
            return out if axis == -1 else ow._swap(out)

        tab = self._inv if inverse else self._fwd
        n1, n2 = self.factors
        if axis == -1:
            lead = z.re.shape[:-1]
            zr = _cmap(lambda x: x.reshape(lead + (n1, n2)), z)
            a = ow._cdot(zr, tab["M1"], -2)       # (..., x2, k1)
            a = a * tab["T"]                      # twiddle, (x2, k1)
            a = ow._cdot(a, tab["M2"], -2)        # (..., k1, k2)
            # canonical k = k2*n1 + k1: one transpose + flatten
            return _cmap(lambda x: jnp.swapaxes(x, -1, -2)
                         .reshape(lead + (self.n,)), a)
        # axis == -2: operate on dim -2 of (..., n, ncols) in place
        lead = z.re.shape[:-2]
        ncols = z.re.shape[-1]
        zr = _cmap(lambda x: x.reshape(lead + (n1, n2, ncols)), z)
        a = ow._cdot(zr, tab["M1"], -3)           # (..., y2, ncols, k1)
        a = a * _cmap(lambda t: t[:, None, :], tab["T"])
        a = ow._cdot(a, tab["M2"], -3)            # (..., ncols, k1, k2)
        # canonical k = k2*n1 + k1 back at dim -2: (ncols,k1,k2)->(k2,k1,ncols)
        nd = a.re.ndim
        perm = tuple(range(nd - 3)) + (nd - 1, nd - 2, nd - 3)
        return _cmap(lambda x: x.transpose(perm)
                     .reshape(lead + (self.n, ncols)), a)

    def _along_last_swap(self, z: C, inverse: bool) -> C:
        """Legacy swap-based formulation (measured 2x slower on TPU)."""
        ow = self.owner
        if self.factors is None:
            return ow._cdot(z, self._G if inverse else self._F, -1)
        tab = self._inv if inverse else self._fwd
        n1, n2 = self.factors
        lead = z.re.shape[:-1]
        zr = C(z.re.reshape(lead + (n1, n2)), z.im.reshape(lead + (n1, n2)))
        # DFT over x1: layout (..., x2, x1) @ M1 -> (..., x2, k1)
        a1 = ow._cdot(ow._swap(zr), tab["M1"], -1)
        a1 = a1 * tab["T"]  # twiddle, (x2, k1) layout
        # DFT over x2: layout (..., k1, x2) @ M2 -> (..., k1, k2)
        a2 = ow._cdot(ow._swap(a1), tab["M2"], -1)
        # output index k = k2*n1 + k1 -> (..., k2, k1) then flatten
        out = ow._swap(a2)
        return C(out.re.reshape(lead + (self.n,)),
                 out.im.reshape(lead + (self.n,)))


class MXUTransform:
    """DFT-as-matmul transforms for complex-free TPU backends.

    2-D transforms apply a 1-D pass (:class:`_CDFT`) along both axes.
    Leading batch axes are flattened into the matmul row dimension so a
    batched transform is one big matmul. Real-field transforms use the
    even/odd split (module docstring): ``rfft2``/``irfft2`` cost ~3 dense
    matmul units instead of 8, with four-step applying to both the
    half-length x-pass and the (half-width) y-pass at large grids.
    """

    def __init__(self, nx: int, dtype=np.float32, precision: str = "auto",
                 factors="auto", half_factors="auto", evenodd="auto",
                 gauss="auto", formulation: str = "dotgen",
                 max_batch="auto", realpath: str = "auto",
                 use_pallas: bool = False, pallas_interpret: bool = False):
        self.nx = nx
        self.dtype = np.dtype(dtype)
        self.nk_half = nx // 2 + 1
        # 'dotgen': four-step stages contract interior dims directly with
        # dot_general (one index transpose per pass) — measured ~2x faster
        # per 2048 roundtrip than 'swap' (three swapaxes per pass) on the
        # target TPU; 'swap' retained for same-process A/Bs.
        assert formulation in ("dotgen", "swap"), formulation
        self.formulation = formulation
        if precision == "auto":
            # f64/CPU: plain dot is exact enough. f32/TPU: Precision.HIGH —
            # the hardware's internal multi-pass bf16 (~1.4e-5 relative,
            # same grade as the explicit 3-matmul mask-split) at ~1/2 the
            # wall time of 'split' because each operand is read once and
            # pass accumulation stays on-chip (measured: 2048 c64-equiv
            # roundtrip 1.85 vs 3.88 ms/slice; full coupled step 9.20 vs
            # 5.24 steps/s at 2048²; 100-step 4096² budget closure holds)
            precision = "high" if self.dtype == np.float32 else "f32"
        if precision == "fast" and self.dtype == np.float32:
            # measured: single-pass bf16-grade transforms (~2.6e-3 rel err)
            # NaN the coupled physics within tens of steps (PERFORMANCE.md)
            warnings.warn(
                "MXUTransform precision='fast' runs single-pass bf16-grade "
                "matmuls (~2.6e-3 relative error); f32 simulations are known "
                "to go NaN with it. Use the default 'high' (~1.4e-5), "
                "'split' (3 explicit passes, ~1e-5) or 'split3' (6 passes, "
                "~f32) unless you have validated your configuration.",
                stacklevel=3,
            )
        self.precision = precision
        self._mm = {"split": _mm_split, "split3": _mm_split3,
                    "fast": _mm_plain, "f32": _mm_plain,
                    "high": _mm_high}[precision]
        self.factors = _auto_factors(nx) if factors == "auto" else factors
        # fused Pallas complex-split matmul (TPU; 'split' precision only)
        self.use_pallas = bool(use_pallas) and precision == "split" \
            and self.dtype == np.float32
        if gauss == "auto":
            # measured: ~19% faster real-transform roundtrips at 2048 under
            # 'high', a wash on pure-complex ones; exact same arithmetic
            # grade (tests hold at 1e-12 in f64)
            gauss = self.dtype == np.float32
        self.gauss = bool(gauss) and not self.use_pallas
        self.pallas_interpret = pallas_interpret
        # split leading-batch transforms into chunks of <= max_batch slices
        # (0 = off). On the target backend the effective bandwidth decays
        # superlinearly with an op's working-set size (PERFORMANCE.md
        # roofline section), so per-field transforms beat the stacked
        # batch at EVERY size at the full-step level (same-process A/Bs,
        # sweep_r3a/b: coupled 2048² 22.5->29.1 steps/s, 4096² 3.30->4.26,
        # QG 2048² 43.6->56.3; identical Ke) — the round-2 "batch the
        # stages" lesson holds for grouping the ELEMENTWISE prep, but the
        # transform matmuls themselves pipeline better one field at a
        # time. 'auto' = 1 on the f32 (TPU) path, off for f64 parity runs.
        if max_batch == "auto":
            max_batch = 1 if self.dtype == np.float32 else 0
        self.max_batch = int(max_batch)

        self._cdft = _CDFT(self, nx, self.factors)

        # -- real-transform machinery -----------------------------------
        if half_factors == "auto":
            half_factors = (_auto_factors(nx // 2, min_n=1024)
                            if nx % 2 == 0 else None)
        if evenodd == "auto":
            # the even/odd path pays off when the half-length DFT can
            # four-step; below that the dedicated dense rfft matrices have
            # the same FLOPs with fewer elementwise ops
            evenodd = nx % 2 == 0 and half_factors is not None
        mf_ok = (nx % 2 == 0 and self.factors is not None
                 and self.factors[0] % 2 == 0 and self.factors[1] % 2 == 0)
        if realpath == "auto":
            # mirror-free wins where the even/odd path's layout ops run at
            # the degraded large-buffer bandwidth (PERFORMANCE.md); the
            # crossover measured at 4096 on the target backend
            if mf_ok and self.dtype == np.float32 and nx >= 4096:
                realpath = "mf"
            else:
                realpath = "evenodd" if (bool(evenodd) and nx % 2 == 0) \
                    else "dense"
        if realpath == "mf" and not mf_ok:
            raise ValueError(
                f"realpath='mf' needs an even-factor four-step at nx={nx} "
                f"(factors={self.factors})")
        assert realpath in ("mf", "evenodd", "dense"), realpath
        if realpath == "evenodd" and nx % 2:
            realpath = "dense"
        self.realpath = realpath
        if realpath == "mf":
            self._init_mf_tables()
        self.evenodd = realpath == "evenodd"
        if self.evenodd:
            nh = nx // 2
            self._cdft_half = _CDFT(self, nh, half_factors)
            # butterfly twiddle W[k] = exp(-2*pi*i*k/nx), k in [0, nh)
            self._w_f = C.from_complex(
                np.exp(-2j * np.pi * np.arange(nh) / nx), dtype=self.dtype)
        else:
            self._cdft_half = None

        # dedicated dense half-spectrum (real-FFT) matrices: forward keeps
        # only nk = nx//2+1 columns; inverse reconstructs the real signal
        # with Hermitian weights w = [1, 2, ..., 2, 1] folded in. Used when
        # the even/odd path is off (small or odd nx).
        if self.realpath == "dense":
            a = np.arange(nx)
            F = np.exp(-2j * np.pi * np.outer(a, a) / nx)
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

    def _four_tables(self, M1, M2, T):
        return {
            "M1": self._cconst(M1.real, M1.imag),
            "M2": self._cconst(M2.real, M2.imag),
            "T": C.from_complex(T, dtype=self.dtype),
        }

    def _init_mf_tables(self):
        """Half-range four-step tables for the mirror-free real path.

        Forward (real x -> nk columns): stage 1 is a full (n1 x n1) DFT of
        a REAL input (2 plain matmuls — no Gauss form needed), stage 2
        keeps only the ``k2 <= n2/2`` output columns; the flattened
        ``k = k2*n1 + k1`` output is then sliced to ``nk = nx/2+1``
        (~``(n1-1)/nx`` wasted MACs, no gather).

        Inverse (nk columns -> real x): only the retained ``m < nx/2``
        input columns are contracted — stage 1 uses the first n1/2 rows of
        the inverse DFT table — and the final stage computes the REAL
        plane only, with the mirror half's contribution folded as a 2x
        scale (the mirror sum is exactly the conjugate of the retained
        sum). Endpoint columns m=0 and m=nx/2 are rank-1 corrections.
        """
        nx = self.nx
        n1, n2 = self.factors
        i1 = np.arange(n1)
        i2 = np.arange(n2)
        M1f = np.exp(-2j * np.pi * np.outer(i1, i1) / n1)
        Tf = np.exp(-2j * np.pi * np.outer(i2, i1) / nx)      # (x2, k1)
        M2f = np.exp(-2j * np.pi * np.outer(i2, i2) / n2)[:, :n2 // 2 + 1]
        self._mf_fwd = {
            "M1": (self._const(M1f.real), self._const(M1f.imag)),
            "T": C.from_complex(Tf, dtype=self.dtype),
            "M2": self._cconst(M2f.real, M2f.imag),
        }
        M1i = np.exp(2j * np.pi * np.outer(i1[: n1 // 2], i1) / n1)
        Ti = np.exp(2j * np.pi * np.outer(i2, i1) / nx)       # (m_b, x_a)
        M2i = np.exp(2j * np.pi * np.outer(i2, i2) / n2) * (2.0 / nx)
        self._mf_inv = {
            "M1": self._cconst(M1i.real, M1i.imag),
            "T": C.from_complex(Ti, dtype=self.dtype),
            "M2": (self._const(M2i.real), self._const(M2i.imag)),
        }
        alt = np.where(np.arange(nx) % 2 == 0, 1.0, -1.0) / nx
        self._mf_alt = jnp.asarray(alt.astype(self.dtype))

    # -- mirror-free real 1-D passes ----------------------------------------
    def _rdft_last_mf(self, x) -> C:
        """Real DFT along the last axis keeping nk = nx//2+1 columns via
        half-output-range four-step tables (zero strided layout ops)."""
        n1, n2 = self.factors
        lead = x.shape[:-1]
        xr = x.reshape(lead + (n1, n2))
        dn = (((xr.ndim - 2,), (0,)), ((), ()))
        M1r, M1i = self._mf_fwd["M1"]
        s = C(self._mm(xr, M1r, dn), self._mm(xr, M1i, dn))  # (..., x2, k1)
        s = s * self._mf_fwd["T"]
        a = self._cdot(s, self._mf_fwd["M2"], -2)            # (..., k1, k2h)
        nd = a.re.ndim
        perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
        nkk = (n2 // 2 + 1) * n1
        return _cmap(lambda t: t.transpose(perm).reshape(lead + (nkk,))
                     [..., :self.nk_half], a)

    def _irdft_last_mf(self, z: C):
        """Inverse of :meth:`_rdft_last_mf`: half-spectrum rows (..., nk)
        -> real (..., nx), as ``2*Re(four-step over the m < nx/2 columns)``
        plus endpoint corrections. Anti-Hermitian residue in the
        self-mirror columns m=0 and m=nx/2 is annihilated by the ``Re``,
        matching ``real(ifft(.))`` semantics."""
        n1, n2 = self.factors
        nh = self.nx // 2
        lead = z.re.shape[:-1]
        body = _cmap(lambda t: t[..., :nh].reshape(lead + (n1 // 2, n2)), z)
        a = self._cdot(body, self._mf_inv["M1"], -2)         # (..., m_b, x_a)
        a = a * self._mf_inv["T"]
        M2r, M2i = self._mf_inv["M2"]
        dn = (((a.re.ndim - 2,), (0,)), ((), ()))
        out = self._mm(a.re, M2r, dn) - self._mm(a.im, M2i, dn)
        nd = out.ndim
        perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
        out = out.transpose(perm).reshape(lead + (self.nx,))
        # (1/nx)*[-Re(V0) + (-1)^x * Re(V_nyq)]; 1/nx is baked into _mf_alt
        c0 = z.re[..., 0:1]
        cn = z.re[..., nh:nh + 1]
        return out + cn * self._mf_alt - c0 * self._mf_alt[0]

    def _cconst(self, Mre: np.ndarray, Mim: np.ndarray):
        """Pre-split representation of a complex constant matrix.

        Standard form is the pair ``(const(Re), const(Im))`` consumed by the
        4-real-matmul product in :meth:`_right_mul`. With ``gauss=True`` it
        is a dict of the three Gauss-trick combinations ``Re``, ``Im - Re``,
        ``Im + Re`` so a complex product costs 3 real matmuls instead of 4
        (constants folded at trace time; exact same result up to rounding).
        """
        if self.gauss:
            return {"c": self._const(Mre), "s2": self._const(Mim - Mre),
                    "s3": self._const(Mim + Mre)}
        return (self._const(Mre), self._const(Mim))

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

    def _cdot(self, z: C, M, dim: int) -> C:
        """Contract ``dim`` of the complex pair ``z`` with dim 0 of the
        complex constant ``M`` (in either :meth:`_cconst` form — pair of
        pre-split tuples, or Gauss dict). The result dim is appended
        minor-most (for ``dim=-1`` that is in-place)."""
        nd = z.re.ndim
        dn = (((dim % nd,), (0,)), ((), ()))
        mm = self._mm
        if isinstance(M, dict):
            # Gauss 3-multiplication product: for (a+bi)(c+di) with the
            # constant combinations c, d-c, c+d precomputed,
            #   t1 = (a+b)c, t2 = a(d-c), t3 = b(c+d)
            #   re = t1 - t3, im = t1 + t2
            t1 = mm(z.re + z.im, M["c"], dn)
            t2 = mm(z.re, M["s2"], dn)
            t3 = mm(z.im, M["s3"], dn)
            return C(t1 - t3, t1 + t2)
        Mr, Mi = M
        if self.use_pallas and dim in (-1, nd - 1):
            flat = (_cmap(lambda x: x.reshape(-1, x.shape[-1]), z)
                    if nd > 2 else z)
            out = self._pallas_or_none(flat, Mr, Mi)
            if out is not None:
                if nd > 2:
                    out = _cmap(lambda x: x.reshape(
                        z.re.shape[:-1] + (x.shape[-1],)), out)
                return out
        re = mm(z.re, Mr, dn) - mm(z.im, Mi, dn)
        im = mm(z.re, Mi, dn) + mm(z.im, Mr, dn)
        return C(re, im)

    def _pallas_or_none(self, z: C, Mr, Mi):
        """Fused Pallas complex-split matmul for eligible 2-D shapes
        (opt-in experimental; measured slower than the XLA path)."""
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
        return None

    # -- 1-D DFT passes ----------------------------------------------------
    def _swap(self, z: C) -> C:
        return C(jnp.swapaxes(z.re, -1, -2), jnp.swapaxes(z.im, -1, -2))

    def _dft_last(self, z: C, inverse: bool) -> C:
        return self._cdft.along(z, inverse, axis=-1)

    # -- batch splitting (see max_batch in __init__) -------------------------
    def _split_c(self, fn, z: C) -> C:
        mb = self.max_batch
        if not mb or z.re.ndim < 3 or z.re.shape[0] <= mb:
            return fn(z)
        outs = [fn(C(z.re[i:i + mb], z.im[i:i + mb]))
                for i in range(0, z.re.shape[0], mb)]
        return C(jnp.concatenate([o.re for o in outs]),
                 jnp.concatenate([o.im for o in outs]))

    def _split_in_r(self, fn, x):
        """Real input -> C output."""
        mb = self.max_batch
        if not mb or x.ndim < 3 or x.shape[0] <= mb:
            return fn(x)
        outs = [fn(x[i:i + mb]) for i in range(0, x.shape[0], mb)]
        return C(jnp.concatenate([o.re for o in outs]),
                 jnp.concatenate([o.im for o in outs]))

    def _split_out_r(self, fn, zh: C):
        """C input -> real output."""
        mb = self.max_batch
        if not mb or zh.re.ndim < 3 or zh.re.shape[0] <= mb:
            return fn(zh)
        return jnp.concatenate(
            [fn(C(zh.re[i:i + mb], zh.im[i:i + mb]))
             for i in range(0, zh.re.shape[0], mb)])

    # -- public API --------------------------------------------------------
    def fft2(self, z: C) -> C:
        return self._split_c(self._fft2_one, z)

    def _fft2_one(self, z: C) -> C:
        z = self._cdft.along(z, inverse=False, axis=-1)   # along x
        return self._cdft.along(z, inverse=False, axis=-2)  # along y

    def ifft2(self, zh: C) -> C:
        return self._split_c(self._ifft2_one, zh)

    def _ifft2_one(self, zh: C) -> C:
        zh = self._cdft.along(zh, inverse=True, axis=-1)
        return self._cdft.along(zh, inverse=True, axis=-2)

    def fft2_real(self, x) -> C:
        """Full-spectrum transform of a real field.

        Routed through ``rfft2`` + exact Hermitian expansion: ~3 dense
        matmul units instead of 8 for a complex transform with a zero
        imaginary plane. Odd ``nx`` falls back to the complex path.
        """
        if self.nx % 2:
            return self.fft2(C(x, jnp.zeros_like(x)))
        return expand_half_to_full(self.rfft2(x))

    def ifft2_real(self, zh: C):
        """``real(ifft2(zh))`` via Hermitian projection + ``irfft2``.

        The projection is exactly what taking ``.real`` of the full inverse
        computes (``spectral.hermitian_project``), so this matches the
        reference's ``ifft(...).real`` semantics while doing ~3 matmul
        units instead of 8.
        """
        if self.nx % 2:
            return self.ifft2(zh).re
        return self.irfft2(project_full_to_half(zh))

    def ifft2_real_pairs(self, zh: C):
        """Pair-packed real inverses (two Hermitian spectra per complex
        inverse; ROADMAP item 1 / VERDICT r3 item 1). Each pair is issued
        as one full complex ``ifft2`` — same per-field MACs as a
        dedicated real path's would-be 2-for-1, but with zero strided
        gathers/flips/interleaves anywhere: pack = plane adds, unpack =
        the re/im planes themselves. See ``_pairs_via_ifft2`` for the
        Hermitian-input contract."""
        return _pairs_via_ifft2(self, zh)

    def _real_mm_flat(self, x, M):
        """Real (…, K) @ (K, N) contraction along the last axis."""
        dn = (((x.ndim - 1,), (0,)), ((), ()))
        return self._mm(x, M, dn)

    # -- even/odd real 1-D passes ------------------------------------------
    @staticmethod
    def _reflect_conj_1d(z: C) -> C:
        """conj(Z[(n-k) % n]) along the last axis."""
        re = jnp.roll(jnp.flip(z.re, axis=-1), 1, axis=-1)
        im = -jnp.roll(jnp.flip(z.im, axis=-1), 1, axis=-1)
        return C(re, im)

    def _rdft_last_evenodd(self, x) -> C:
        """Real DFT along the last axis keeping nk = nx//2+1 columns, via
        one half-length complex DFT of ``x[0::2] + i*x[1::2]`` and the
        exact (same-field) butterfly."""
        u = C(x[..., 0::2], x[..., 1::2])
        U = self._cdft_half(u, inverse=False)
        Ur = self._reflect_conj_1d(U)
        E = (U + Ur) * 0.5                 # DFT of the even samples
        O = jmul(U - Ur, -0.5)             # DFT of the odd samples
        Xm = E + O * self._w_f             # X[k], k in [0, nh)
        # Nyquist column X[nh] = E[0] - O[0] = Re(U[0]) - Im(U[0]), real
        ny_re = U.re[..., :1] - U.im[..., :1]
        return C(jnp.concatenate([Xm.re, ny_re], axis=-1),
                 jnp.concatenate([Xm.im, jnp.zeros_like(ny_re)], axis=-1))

    def _irdft_last_evenodd(self, z: C):
        """Inverse of :meth:`_rdft_last_evenodd`: half-spectrum rows
        (..., nk) -> real (..., nx). Non-Hermitian residue in the input is
        implicitly projected out, matching ``real(ifft(...))``."""
        nh = self.nx // 2
        Xm = C(z.re[..., :nh], z.im[..., :nh])
        # conj(X[nh-k]), k in [0, nh): flip of columns 1..nh
        Xr = C(jnp.flip(z.re[..., 1:nh + 1], axis=-1),
               -jnp.flip(z.im[..., 1:nh + 1], axis=-1))
        E = (Xm + Xr) * 0.5
        O = ((Xm - Xr) * 0.5) * self._w_f.conj()   # W^{-k} * (...)
        U = C(E.re - O.im, E.im + O.re)            # E + i*O
        u = self._cdft_half(U, inverse=True)
        # interleave: out[0::2] = Re(u), out[1::2] = Im(u)
        lead = u.re.shape[:-1]
        out = jnp.stack([u.re, u.im], axis=-1).reshape(lead + (self.nx,))
        return out

    # -- half-spectrum 2-D API ---------------------------------------------
    def rfft2(self, x) -> C:
        return self._split_in_r(self._rfft2_one, x)

    def _rfft2_one(self, x) -> C:
        # pass 1: real DFT along x keeping nk columns
        if self.realpath == "mf":
            z = self._rdft_last_mf(x)
        elif self.evenodd:
            z = self._rdft_last_evenodd(x)
        else:
            z = C(self._real_mm_flat(x, self._Rf[0]),
                  self._real_mm_flat(x, self._Rf[1]))
        # pass 2: full complex DFT along y (on nk columns)
        return self._cdft.along(z, inverse=False, axis=-2)

    def irfft2(self, zh: C):
        return self._split_out_r(self._irfft2_one, zh)

    def _irfft2_one(self, zh: C):
        # pass 1: inverse complex DFT along y
        z = self._cdft.along(zh, inverse=True, axis=-2)
        # pass 2: real reconstruction along x
        if self.realpath == "mf":
            return self._irdft_last_mf(z)
        if self.evenodd:
            return self._irdft_last_evenodd(z)
        return (self._real_mm_flat(z.re, self._Ri[0])
                + self._real_mm_flat(z.im, self._Ri[1]))


def make_transform(nx: int, dtype, backend: str = "auto",
                   precision: str = "auto", **mxu_opts):
    """Pick a transform provider.

    ``backend='auto'`` selects MXU on TPU-like platforms (no complex
    support) and native FFT elsewhere. ``mxu_opts`` (``factors``,
    ``half_factors``, ``evenodd``, ``gauss``, ``formulation``,
    ``use_pallas``, ``pallas_interpret``) pass through to MXUTransform
    and are ignored for the native provider.
    """
    if backend == "auto":
        plat = jax.default_backend()
        backend = "mxu" if plat not in ("cpu", "gpu", "cuda", "rocm") else "native"
    if backend == "native":
        return NativeTransform(nx, dtype)
    if backend == "mxu":
        return MXUTransform(nx, dtype, precision=precision, **mxu_opts)
    raise ValueError(f"unknown transform backend {backend!r}")
