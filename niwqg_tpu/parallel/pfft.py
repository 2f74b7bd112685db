"""Pencil-decomposed distributed 2-D FFT via shard_map + all_to_all.

The distributed-FFT analog of sequence parallelism (SURVEY.md §5): the
``(ny, nx)`` grid is sharded over mesh axis ``'x'``. Forward transform:

  1. local 1-D FFT along x (rows are whole on each device),
  2. ``lax.all_to_all`` transpose over ICI — local block goes from
     ``(ny/P, nx)`` to ``(ny, nx/P)``,
  3. local 1-D FFT along y.

The result is *left* column-sharded (``P(None, 'x')``): all spectral
elementwise algebra runs in that layout and the inverse transform undoes it,
so exactly two all-to-alls ride the interconnect per fft/ifft pair — the
minimum for a pencil decomposition.

The half-spectrum pair ``rfft2``/``irfft2`` (the reference QGModel's native
layout, ``niwqg/QGModel.py:551-552``) works the same way with the local
x-pass as an rfft; because ``nk = nx//2+1`` is never divisible by the mesh
size, the spectral layout pads with ``rfft_pad`` zero columns up to the
next multiple (mirrored by ``Grid.pad`` so wavenumber arrays line up).

Provider API matches ``NativeTransform``/``MXUTransform`` so the model
kernels are oblivious to distribution. This provider requires a complex-
capable backend (CPU/GPU meshes); on TPU meshes use ``MXUTransform`` whose
dense-DFT einsums are partitioned by GSPMD directly (tensor-parallel
matmuls), no shard_map needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..carray import C
from .mesh import AXIS


class PencilTransform:
    """Distributed transforms on a 1-D device mesh (complex backend)."""

    def __init__(self, nx: int, dtype, mesh: Mesh, axis: str = AXIS):
        self.nx = nx
        self.dtype = np.dtype(dtype)
        self.nk_half = nx // 2 + 1
        self.mesh = mesh
        self.axis = axis
        self.nP = mesh.shape[axis]
        assert nx % self.nP == 0, (
            f"nx={nx} must be divisible by mesh size {self.nP}"
        )
        self._cplx = np.complex128 if self.dtype == np.float64 else np.complex64

        phys = P(axis, None)
        spec = P(None, axis)

        ax = axis

        def fwd_local(zre, zim):
            z = lax.complex(zre, zim)
            z = jnp.fft.fft(z, axis=-1)
            z = lax.all_to_all(z, ax, split_axis=z.ndim - 1,
                               concat_axis=z.ndim - 2, tiled=True)
            z = jnp.fft.fft(z, axis=-2)
            return jnp.real(z), jnp.imag(z)

        def inv_local(zre, zim):
            z = lax.complex(zre, zim)
            z = jnp.fft.ifft(z, axis=-2)
            z = lax.all_to_all(z, ax, split_axis=z.ndim - 2,
                               concat_axis=z.ndim - 1, tiled=True)
            z = jnp.fft.ifft(z, axis=-1)
            return jnp.real(z), jnp.imag(z)

        # leading batch axes are unsharded
        def specs(base):
            return base

        self._fwd = jax.shard_map(
            fwd_local, mesh=mesh, in_specs=(phys, phys), out_specs=(spec, spec)
        )
        self._inv = jax.shard_map(
            inv_local, mesh=mesh, in_specs=(spec, spec), out_specs=(phys, phys)
        )

        # -- half-spectrum (rfft) pencil -------------------------------
        # nk = nx//2+1 is never divisible by the mesh size, so the spectral
        # layout pads with zero columns up to the next multiple of P before
        # the all_to_all; the padded columns carry k = 0 and zero data (the
        # model grid is built with the same ``pad``, see Grid.pad).
        nk = self.nk_half
        self.rfft_pad = (-nk) % self.nP
        nk_pad = nk + self.rfft_pad

        def rfwd_local(x):
            z = jnp.fft.rfft(x.astype(self.dtype), axis=-1)
            padw = [(0, 0)] * (z.ndim - 1) + [(0, nk_pad - nk)]
            z = jnp.pad(z, padw)
            z = lax.all_to_all(z, ax, split_axis=z.ndim - 1,
                               concat_axis=z.ndim - 2, tiled=True)
            z = jnp.fft.fft(z, axis=-2)
            return jnp.real(z), jnp.imag(z)

        def rinv_local(zre, zim):
            z = lax.complex(zre, zim)
            z = jnp.fft.ifft(z, axis=-2)
            z = lax.all_to_all(z, ax, split_axis=z.ndim - 2,
                               concat_axis=z.ndim - 1, tiled=True)
            return jnp.fft.irfft(z[..., :nk], n=nx, axis=-1)

        self._rfwd = jax.shard_map(
            rfwd_local, mesh=mesh, in_specs=(phys,), out_specs=(spec, spec)
        )
        self._rinv = jax.shard_map(
            rinv_local, mesh=mesh, in_specs=(spec, spec), out_specs=phys
        )

    # -- provider API ------------------------------------------------------
    def fft2(self, z: C) -> C:
        re, im = self._fwd(z.re, z.im)
        return C(re, im)

    def ifft2(self, zh: C) -> C:
        re, im = self._inv(zh.re, zh.im)
        return C(re, im)

    def fft2_real(self, x) -> C:
        return self.fft2(C(x, jnp.zeros_like(x)))

    def ifft2_real(self, zh: C):
        return self.ifft2(zh).re

    def rfft2(self, x) -> C:
        """Half-spectrum forward, output ``(ny, nk + rfft_pad)``
        column-sharded (the reference QGModel's native rfft layout,
        ``niwqg/QGModel.py:551-552``, pencil-distributed)."""
        re, im = self._rfwd(x)
        return C(re, im)

    def irfft2(self, zh: C):
        return self._rinv(zh.re, zh.im)
