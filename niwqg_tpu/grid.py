"""Grid, wavenumber arrays, and spectral filter.

A frozen, host-precomputed description of the doubly periodic domain. All
arrays are built in numpy float64 and cast to the model dtype once, so grid
setup is exact regardless of the on-device precision.

Reference semantics (cesar-rocha/niwqg):
  - cell-centred physical grid ``x = (arange(0.5, nx))/nx * L``
    (``niwqg/Kernel.py:232-234``)
  - full-spectrum wavenumber ordering ``[0..nx/2-1, -nx/2..-1]``
    (``niwqg/Kernel.py:242-244``); half-spectrum ``k = dk*arange(nx//2+1)``
    for the real-FFT QG model (``niwqg/QGModel.py:247-249``)
  - ``ny`` is accepted but ignored: ``ny = nx`` (``niwqg/Kernel.py:101``)
  - ``wv2i`` is zero at the mean mode (``niwqg/Kernel.py:263-265``)
  - exponential filter ``exp(-23.6 (wvx-0.65*pi)^4)`` above the cutoff, 1
    below (``niwqg/Kernel.py:271-275``); 2/3-rule mask alternative
    (``niwqg/Kernel.py:277-281``)
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """Doubly periodic square grid with full- or half-spectrum layout.

    ``spectrum='full'`` matches the complex-FFT NIW kernel; ``'half'``
    matches the real-FFT standalone QG model (``nk = nx//2+1``).
    """

    nx: int
    L: float
    dtype: np.dtype = np.dtype("float64")
    spectrum: str = "full"  # 'full' | 'half'
    use_filter: bool = True
    dealias: bool = False
    # extra zero columns appended to the half-spectrum layout so the
    # distributed pencil transform's all_to_all gets an evenly divisible
    # column count (``parallel/pfft.py``); padded columns carry k = 0 and
    # always-zero data
    pad: int = 0

    # ---- host-side (numpy, float64) -------------------------------------
    @property
    def ny(self) -> int:
        return self.nx

    @property
    def W(self) -> float:
        return self.L

    @property
    def dx(self) -> float:
        return self.L / self.nx

    @property
    def dy(self) -> float:
        return self.W / self.ny

    @property
    def M(self) -> int:
        """Spectral normalisation constant nx*ny (``niwqg/Kernel.py:255``)."""
        return self.nx * self.ny

    @property
    def nl(self) -> int:
        return self.ny

    @property
    def nk(self) -> int:
        if self.spectrum == "full":
            return self.nx
        return self.nx // 2 + 1 + self.pad

    @cached_property
    def x_np(self) -> np.ndarray:
        x, _ = np.meshgrid(
            np.arange(0.5, self.nx, 1.0) / self.nx * self.L,
            np.arange(0.5, self.ny, 1.0) / self.ny * self.W,
        )
        return x

    @cached_property
    def y_np(self) -> np.ndarray:
        _, y = np.meshgrid(
            np.arange(0.5, self.nx, 1.0) / self.nx * self.L,
            np.arange(0.5, self.ny, 1.0) / self.ny * self.W,
        )
        return y

    @property
    def dk(self) -> float:
        return 2.0 * np.pi / self.L

    @property
    def dl(self) -> float:
        return 2.0 * np.pi / self.L

    @cached_property
    def ll_np(self) -> np.ndarray:
        """1-D meridional wavenumbers, full-spectrum ordering."""
        return self.dl * np.append(
            np.arange(0.0, self.nx / 2), np.arange(-self.nx / 2, 0.0)
        )

    @cached_property
    def kk_np(self) -> np.ndarray:
        """1-D zonal wavenumbers (layout-dependent)."""
        if self.spectrum == "full":
            return self.ll_np.copy()
        kk = self.dk * np.arange(0.0, self.nx // 2 + 1)
        if self.pad:
            kk = np.append(kk, np.zeros(self.pad))
        return kk

    @cached_property
    def k_np(self) -> np.ndarray:
        k, _ = np.meshgrid(self.kk_np, self.ll_np)
        return k

    @cached_property
    def l_np(self) -> np.ndarray:
        _, l = np.meshgrid(self.kk_np, self.ll_np)
        return l

    @cached_property
    def wv2_np(self) -> np.ndarray:
        return self.k_np**2 + self.l_np**2

    @cached_property
    def wv_np(self) -> np.ndarray:
        return np.sqrt(self.wv2_np)

    @cached_property
    def wv4_np(self) -> np.ndarray:
        return self.wv2_np**2

    @cached_property
    def wv2i_np(self) -> np.ndarray:
        iwv2 = self.wv2_np != 0.0
        out = np.zeros_like(self.wv2_np)
        out[iwv2] = self.wv2_np[iwv2] ** -1
        return out

    @cached_property
    def filtr_np(self) -> np.ndarray:
        if self.use_filter:
            cphi = 0.65 * np.pi
            wvx = np.sqrt((self.k_np * self.dx) ** 2 + (self.l_np * self.dy) ** 2)
            filtr = np.exp(-23.6 * (wvx - cphi) ** 4)
            filtr[wvx <= cphi] = 1.0
            return filtr
        if self.dealias:
            filtr = np.ones_like(self.wv2_np)
            filtr[self.nx // 3 : 2 * self.nx // 3, :] = 0.0
            if self.spectrum == "full":
                filtr[:, self.ny // 3 : 2 * self.ny // 3] = 0.0
            else:
                filtr[:, self.nx // 3 :] = 0.0
            return filtr
        return np.ones_like(self.wv2_np)

    # ---- device-side (jnp, model dtype) ----------------------------------
    def _dev(self, a: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(a.astype(self.dtype))

    @cached_property
    def x(self):
        return self._dev(self.x_np)

    @cached_property
    def y(self):
        return self._dev(self.y_np)

    @cached_property
    def k(self):
        return self._dev(self.k_np)

    @cached_property
    def l(self):
        return self._dev(self.l_np)

    @cached_property
    def wv(self):
        return self._dev(self.wv_np)

    @cached_property
    def wv2(self):
        return self._dev(self.wv2_np)

    @cached_property
    def wv4(self):
        return self._dev(self.wv4_np)

    @cached_property
    def wv2i(self):
        return self._dev(self.wv2i_np)

    @cached_property
    def filtr(self):
        return self._dev(self.filtr_np)

    def materialize(self) -> "Grid":
        """Force-create all device constants eagerly.

        The cached device arrays must not be first-touched inside a jit
        trace (the cache would capture tracers); kernels call this once at
        construction time.
        """
        _ = (self.x, self.y, self.k, self.l, self.wv, self.wv2, self.wv4,
             self.wv2i, self.filtr)
        return self

    # ---- spec_var --------------------------------------------------------
    def spec_var(self, zh) -> jnp.ndarray:
        """Variance of a field from its transform.

        Full-spectrum variant (``niwqg/Kernel.py:654-658``) sums
        ``|zh|^2/M^2`` with the mean mode removed. Half-spectrum variant
        (``niwqg/QGModel.py:611-619``) doubles the non-Hermitian-degenerate
        columns.
        """
        var_dens = zh.abs2() / float(self.M) ** 2
        if self.spectrum == "half":
            var_dens = 2.0 * var_dens
            var_dens = var_dens.at[:, 0].mul(0.5)
            # Nyquist column by explicit index (it is NOT the last column
            # when the layout carries pencil padding)
            var_dens = var_dens.at[:, self.nx // 2].mul(0.5)
        var_dens = var_dens.at[0, 0].set(0.0)
        return var_dens.sum()

    # ---- spec_cross ------------------------------------------------------
    def spec_cross(self, fh, gh):
        """Physical-grid mean of ``f * g`` from their transforms (Parseval):
        ``mean(f*g) = Σ w Re(conj(fh) gh) / M²`` with the same
        Hermitian-degeneracy weights as :meth:`spec_var`. Unlike
        ``spec_var`` this is a *mean of a product*, so the (0,0) mode is
        kept. Exact (to rounding) for half-spectrum transforms; for the
        full spectrum it matches ``mean(real(ifft(fh)) * real(ifft(gh)))``
        exactly when at least one operand is Hermitian."""
        d = (fh.re * gh.re + fh.im * gh.im) / float(self.M) ** 2
        if self.spectrum == "half":
            d = 2.0 * d
            d = d.at[:, 0].mul(0.5)
            d = d.at[:, self.nx // 2].mul(0.5)
        return d.sum()
