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

Transpose/compute overlap (``overlap_chunks > 1``): the all_to_all is the
serial ICI bottleneck of the pencil scheme — unchunked, every device idles
while the full ``(ny/P, nx)`` block crosses the interconnect. Chunking
splits each device's *output* column block into ``c`` independent
column-pencil chunks, so the chain per chunk is
``select columns -> all_to_all -> y-FFT`` with no cross-chunk data
dependency; XLA's latency-hiding scheduler can then run chunk ``i``'s
collective concurrently with chunk ``i-1``'s FFT compute (the standard
pipelined-transpose FFT, cf. the overlap recipe in the scaling book's
collective chapter). The chunked path reproduces the EXACT unchunked
column layout — chunk ``i`` carries columns ``[i*W/c, (i+1)*W/c)`` of every
device's final ``W = nx/P``-column block — so wavenumber tables and
spectral algebra are oblivious to it. Correctness is asserted on the
virtual mesh (``tests/test_sharding.py``); the overlap win itself needs
real ICI hardware to measure.
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


def _clamp_chunks(width: int, c: int) -> int:
    """Largest divisor of ``width`` that is <= the requested chunk count."""
    c = max(1, min(int(c), width))
    while width % c:
        c -= 1
    return c


class PencilTransform:
    """Distributed transforms on a 1-D device mesh (complex backend).

    ``overlap_chunks``: split the transpose into this many independent
    column-pencil chunks so the all_to_all of one chunk can overlap the
    1-D FFT compute of another (see module docstring). 1 = monolithic
    transpose; clamped to a divisor of the per-device column width.
    """

    def __init__(self, nx: int, dtype, mesh: Mesh, axis: str = AXIS,
                 overlap_chunks: int = 1, pallas_a2a: bool = False,
                 pallas_interpret: bool = False):
        self.pallas_a2a = bool(pallas_a2a)
        self.pallas_interpret = bool(pallas_interpret)
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

        ax = axis
        nP = self.nP
        W = nx // nP  # final per-device spectral column width
        c = self.overlap_chunks = _clamp_chunks(W, overlap_chunks)

        def _fwd_transpose_yfft(z, width, chunks):
            """(rows/P, P*width) row-block -> (rows, width) column pencil:
            chunked all_to_all + y-FFT with the exact monolithic layout.

            Chunk i sends columns ``s*width + [i*w, (i+1)*w)`` of every
            destination block s, so after the split/concat each device
            holds columns ``[i*w, (i+1)*w)`` of its own final block and a
            plain concatenate restores column order."""
            if self.pallas_a2a:
                # hand-written direct-exchange RDMA kernel (all peer
                # transfers concurrently in flight; see parallel/pallas_a2a)
                from .pallas_a2a import all_to_all_fwd

                z = all_to_all_fwd(z, nP, chunks=chunks, axis=ax,
                                   interpret=self.pallas_interpret)
                return jnp.fft.fft(z, axis=-2)
            if chunks == 1:
                z = lax.all_to_all(z, ax, split_axis=z.ndim - 1,
                                   concat_axis=z.ndim - 2, tiled=True)
                return jnp.fft.fft(z, axis=-2)
            lead = z.shape[:-1]
            w = width // chunks
            zr = z.reshape(lead + (nP, width))
            outs = []
            for i in range(chunks):
                piece = zr[..., :, i * w:(i + 1) * w]
                piece = piece.reshape(lead + (nP * w,))
                piece = lax.all_to_all(piece, ax, split_axis=piece.ndim - 1,
                                       concat_axis=piece.ndim - 2, tiled=True)
                outs.append(jnp.fft.fft(piece, axis=-2))
            return jnp.concatenate(outs, axis=-1)

        def _iffty_transpose(z, width, chunks):
            """Inverse of :func:`_fwd_transpose_yfft` up to the final
            x-pass: (rows, width) column pencil -> y-iFFT -> chunked
            all_to_all -> (rows/P, P*width) row block, monolithic layout."""
            if self.pallas_a2a:
                from .pallas_a2a import all_to_all_inv

                z = jnp.fft.ifft(z, axis=-2)
                return all_to_all_inv(z, nP, chunks=chunks, axis=ax,
                                      interpret=self.pallas_interpret)
            if chunks == 1:
                z = jnp.fft.ifft(z, axis=-2)
                return lax.all_to_all(z, ax, split_axis=z.ndim - 2,
                                      concat_axis=z.ndim - 1, tiled=True)
            lead = z.shape[:-2]
            rows = z.shape[-2]
            w = width // chunks
            outs = []
            for i in range(chunks):
                piece = jnp.fft.ifft(z[..., :, i * w:(i + 1) * w], axis=-2)
                piece = lax.all_to_all(piece, ax, split_axis=piece.ndim - 2,
                                       concat_axis=piece.ndim - 1, tiled=True)
                outs.append(piece.reshape(lead + (rows // nP, nP, w)))
            out = jnp.concatenate(outs, axis=-1)
            return out.reshape(lead + (rows // nP, nP * width))

        self._fwd_transpose_yfft = _fwd_transpose_yfft
        self._iffty_transpose = _iffty_transpose

        def fwd_local(zre, zim):
            z = lax.complex(zre, zim)
            z = jnp.fft.fft(z, axis=-1)
            z = _fwd_transpose_yfft(z, W, c)
            return jnp.real(z), jnp.imag(z)

        def inv_local(zre, zim):
            z = lax.complex(zre, zim)
            z = _iffty_transpose(z, W, c)
            z = jnp.fft.ifft(z, axis=-1)
            return jnp.real(z), jnp.imag(z)

        # shard_maps are built per input rank (leading batch axes are
        # unsharded: a rank-r spec pins the mesh axis to dim -2 ('phys',
        # rows) or -1 ('spec', columns) and fills the rest with None)
        self._local = {}
        self._smap_cache = {}
        self._local["fwd"] = (fwd_local, ("phys", "phys"), ("spec", "spec"))
        self._local["inv"] = (inv_local, ("spec", "spec"), ("phys", "phys"))

        # -- half-spectrum (rfft) pencil -------------------------------
        # nk = nx//2+1 is never divisible by the mesh size, so the spectral
        # layout pads with zero columns up to the next multiple of P before
        # the all_to_all; the padded columns carry k = 0 and zero data (the
        # model grid is built with the same ``pad``, see Grid.pad).
        nk = self.nk_half
        self.rfft_pad = (-nk) % self.nP
        nk_pad = nk + self.rfft_pad
        Wr = nk_pad // nP
        cr = _clamp_chunks(Wr, overlap_chunks)

        def rfwd_local(x):
            z = jnp.fft.rfft(x.astype(self.dtype), axis=-1)
            padw = [(0, 0)] * (z.ndim - 1) + [(0, nk_pad - nk)]
            z = jnp.pad(z, padw)
            z = _fwd_transpose_yfft(z, Wr, cr)
            return jnp.real(z), jnp.imag(z)

        def rinv_local(zre, zim):
            z = lax.complex(zre, zim)
            z = _iffty_transpose(z, Wr, cr)
            return (jnp.fft.irfft(z[..., :nk], n=nx, axis=-1),)

        self._local["rfwd"] = (rfwd_local, ("phys",), ("spec", "spec"))
        self._local["rinv"] = (rinv_local, ("spec", "spec"), ("phys",))

    def _smap(self, name: str, rank: int):
        """shard_map of local fn ``name`` specialized to input rank."""
        key = (name, rank)
        fn = self._smap_cache.get(key)
        if fn is None:
            local, in_kinds, out_kinds = self._local[name]

            def spec(kind):
                at = rank - 2 if kind == "phys" else rank - 1
                dims = [None] * rank
                dims[at] = self.axis
                return P(*dims)

            fn = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=tuple(spec(k) for k in in_kinds),
                out_specs=tuple(spec(k) for k in out_kinds),
                # the interpret-mode Pallas RDMA kernel's internals mix
                # varying/invariant values the vma checker can't follow.
                # check_vma is a per-shard_map flag, so it cannot be
                # scoped to just the pallas branch within this transform;
                # it is only disabled when pallas_a2a is requested, and
                # the default lax.all_to_all path keeps full vma checking.
                # On-hardware bring-up protocol (ADVICE r4): validate the
                # default path's parity asserts compiled on real ICI
                # FIRST, then A/B pallas_a2a=True against it.
                check_vma=not self.pallas_a2a,
            )
            self._smap_cache[key] = fn
        return fn

    # -- provider API ------------------------------------------------------
    def fft2(self, z: C) -> C:
        re, im = self._smap("fwd", z.re.ndim)(z.re, z.im)
        return C(re, im)

    def ifft2(self, zh: C) -> C:
        re, im = self._smap("inv", zh.re.ndim)(zh.re, zh.im)
        return C(re, im)

    def fft2_real(self, x) -> C:
        return self.fft2(C(x, jnp.zeros_like(x)))

    def ifft2_real(self, zh: C):
        return self.ifft2(zh).re

    def rfft2(self, x) -> C:
        """Half-spectrum forward, output ``(ny, nk + rfft_pad)``
        column-sharded (the reference QGModel's native rfft layout,
        ``niwqg/QGModel.py:551-552``, pencil-distributed)."""
        re, im = self._smap("rfwd", x.ndim)(x)
        return C(re, im)

    def irfft2(self, zh: C):
        (out,) = self._smap("rinv", zh.re.ndim)(zh.re, zh.im)
        return out

    def ifft2_real_pairs(self, zh: C):
        """Pair-packed real inverses (``ifft2(A + iB) = a + ib``; see
        ``ops.fft._pairs_via_ifft2`` for the Hermitian-input contract).

        On the pencil path this is a first-class *communication* lever,
        not just a matmul one: ``ifft2_real`` here is a full complex
        inverse (one full-width all_to_all per field), so packing two
        real fields per inverse halves the transpose volume of the
        real-inverse group — the largest per-stage group (4 fields) of
        the fast wave kernel.
        """
        from ..ops.fft import _pairs_via_ifft2

        return _pairs_via_ifft2(self, zh)
