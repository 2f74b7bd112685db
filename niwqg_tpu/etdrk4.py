"""ETDRK4 (exponential time differencing RK4) coefficient tables.

Cox & Matthews (2002) scheme with coefficients evaluated by the
Kassam & Trefethen (2005) circular contour mean (M=32 points, radius 1),
matching the reference construction (``niwqg/Kernel.py:400-454``,
``niwqg/QGModel.py:410-466``) bit-for-bit: everything is computed on the
host in numpy complex128 and only cast to the model dtype at the end.

The per-equation linear operator ``c`` bundles mean-flow advection, the
three dissipation operators, and (for the wave equation) the NIW dispersion
term ``-i/2 * f * wv2/kappa^2`` (``niwqg/Kernel.py:440-442``); the QG model
adds ``beta * ik / wv2`` (``niwqg/QGModel.py:427-428``).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from .carray import C
from .grid import Grid


class ETDRK4Coefs(NamedTuple):
    """Device-resident coefficient tables for one prognostic equation.

    All entries are complex pairs over the spectral grid. The update
    formulas (``niwqg/Kernel.py:325-388``) are:
      stage1: uh = (expch_h*uh0 + F0*Qh) * filtr
      stage2: uh = (expch_h*uh0 + Fa*Qh) * filtr
      stage3: uh = (expch_h*uh1 + (2Fb - F0)*Qh) * filtr
      final : uh = (expch*uh0 + F0*f0 + 2(Fa+Fb)*fab + Fc*fc) * filtr
    """

    expch: C
    expch_h: C
    Qh: C
    f0: C
    fab: C
    fc: C


def _contour_phis(ch: np.ndarray, dt: float, M: int = 32, rho: float = 1.0):
    """Kassam–Trefethen contour means of the four phi-functions.

    Evaluated in row chunks: the naive ``ch[..., None] + r`` broadcast
    (``niwqg/Kernel.py:427-433``) materialises several ``(nl, nk, M)``
    complex128 temporaries — ~13 GB of peak host RAM at 2048², OOM at
    4096². Chunking bounds the peak at ~0.5-1 GB total (the per-chunk
    element budget is divided by the worker count) with identical results.

    Chunks are evaluated by a thread pool: the work is numpy
    transcendental ufuncs, which release the GIL, and the single-thread
    version dominated model construction (~140 s at 2048², ~10 min at
    4096², ~40 min at 8192² on a 4-core host). Per-element arithmetic is
    unchanged, so results are bit-for-bit identical to the serial loop
    (and to the reference construction) regardless of worker count.
    """
    from concurrent.futures import ThreadPoolExecutor

    r = rho * np.exp(2j * np.pi * ((np.arange(1.0, M + 1)) / M))
    Qh = np.empty_like(ch)
    f0 = np.empty_like(ch)
    fab = np.empty_like(ch)
    fc = np.empty_like(ch)
    nl = ch.shape[0]
    try:
        nworkers_env = int(os.environ.get("NIWQG_ETDRK4_WORKERS", "0"))
    except ValueError:
        nworkers_env = 0  # malformed env var -> auto (cpu_count)
    nworkers = min(nworkers_env or (os.cpu_count() or 1), 16)
    # per-chunk element budget divided by the worker count: nworkers
    # chunks hold their (rows, nk, M) temporaries concurrently, so the
    # TOTAL peak stays at the single-threaded bound (~0.5-1 GB)
    rows = max(1, min(nl, (8 << 20) // max(1, ch.shape[1] * M)
                      // max(1, nworkers)))

    # row symmetry (see below): only rows [0, nl_eval) are evaluated
    nl_eval = nl
    if nl % 2 == 0 and nl > 2 and np.array_equal(ch[1:nl // 2],
                                                 ch[:nl // 2:-1]):
        nl_eval = nl // 2 + 1

    def do_chunk(j0):
        sl = slice(j0, min(j0 + rows, nl_eval))
        LR = ch[sl, :, np.newaxis] + r[np.newaxis, np.newaxis, :]
        LR2 = LR * LR
        LR3 = LR2 * LR
        eLR = np.exp(LR)
        Qh[sl] = dt * (((np.exp(LR / 2.0) - 1.0) / LR).mean(axis=-1))
        f0[sl] = dt * (
            (((-4.0 - LR + (eLR * (4.0 - 3.0 * LR + LR2))) / LR3).mean(axis=-1))
        )
        fab[sl] = dt * (((2.0 + LR + eLR * (-2.0 + LR)) / LR3).mean(axis=-1))
        fc[sl] = dt * (((-4.0 - 3.0 * LR - LR2 + eLR * (4.0 - LR)) / LR3).mean(axis=-1))

    # row symmetry: every linear operator here depends on l only through
    # wv2 = k^2 + l^2, so rows l and nl-l carry IDENTICAL ch values
    # (l_np is exactly negated, squares bitwise-equal). Compute the lower
    # half and copy the mirror rows — exact, 2x fewer transcendentals.
    mirror = nl_eval != nl

    starts = list(range(0, nl_eval, rows))
    if nworkers > 1 and len(starts) > 1:
        with ThreadPoolExecutor(max_workers=nworkers) as ex:
            list(ex.map(do_chunk, starts))
    else:
        for j0 in starts:
            do_chunk(j0)
    if mirror:
        for out in (Qh, f0, fab, fc):
            out[nl // 2 + 1:] = out[1:nl // 2][::-1]
    return Qh, f0, fab, fc


def fold_filter_into(coefs: ETDRK4Coefs, filtr) -> ETDRK4Coefs:
    """Pre-multiply the stage filter into every coefficient table so the
    stepper can skip its explicit ``* filtr`` pass (pure reassociation;
    see FastWaveKernel ``fold_filter``)."""
    return ETDRK4Coefs(*[t * filtr for t in coefs])


def _table_cache_dir() -> str:
    """Directory for the persistent contour-table cache.

    The Kassam–Trefethen contour means are the dominant cold-build cost
    at production sizes (~20 s at 2048², ~1.5 min at 4096² on a 4-core
    host even after the threaded/mirrored build); they depend only on
    ``(ch, dt)``, so they are cached to disk keyed by a content hash.
    ``NIWQG_TABLE_CACHE=0`` disables; any other value overrides the
    default ``~/.cache/niwqg_tpu/etdrk4``. Only tables with >= 2^20
    elements are cached (small builds are faster than the IO)."""
    d = os.environ.get("NIWQG_TABLE_CACHE", "")
    if d == "0":
        return ""
    return d or os.path.join(os.path.expanduser("~"), ".cache",
                             "niwqg_tpu", "etdrk4")


_TABLE_CACHE_MIN_ELEMS = 1 << 20  # 1024² — below this the build is ~instant


def _contour_phis_cached(ch: np.ndarray, dt: float):
    cache_dir = _table_cache_dir()
    if not cache_dir or ch.size < _TABLE_CACHE_MIN_ELEMS:
        return _contour_phis(ch, dt)
    import hashlib

    h = hashlib.sha256()
    h.update(np.float64(dt).tobytes())
    h.update(str(ch.shape).encode())
    h.update(b"M=32,rho=1,v1")
    h.update(np.ascontiguousarray(ch).tobytes())
    fno = os.path.join(cache_dir, h.hexdigest() + ".npz")
    if os.path.exists(fno):
        try:
            with np.load(fno) as z:
                return z["Qh"], z["f0"], z["fab"], z["fc"]
        except Exception:
            pass  # corrupt/partial file: rebuild and overwrite
    Qh, f0, fab, fc = _contour_phis(ch, dt)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = fno + f".tmp{os.getpid()}.npz"  # np.savez appends .npz itself
        np.savez(tmp[:-4], Qh=Qh, f0=f0, fab=fab, fc=fc)
        os.replace(tmp, fno)
    except OSError:
        pass  # cache is best-effort (read-only FS, disk full, ...)
    return Qh, f0, fab, fc


def build_coefs(grid: Grid, c: np.ndarray, dt: float) -> ETDRK4Coefs:
    """Build ETDRK4 tables for a linear operator ``c`` (complex128, host)."""
    ch = c * dt
    expch = np.exp(ch)
    expch_h = np.exp(ch / 2.0)
    Qh, f0, fab, fc = _contour_phis_cached(ch, dt)
    to = lambda z: C.from_complex(z, dtype=grid.dtype)
    return ETDRK4Coefs(to(expch), to(expch_h), to(Qh), to(f0), to(fab), to(fc))


def linear_operator_q(grid: Grid, U: float, nu4: float, nu: float, mu: float,
                      beta: float = 0.0) -> np.ndarray:
    """Linear operator of the vorticity equation (``niwqg/Kernel.py:417-418``)."""
    c = np.zeros((grid.nl, grid.nk), np.complex128) - 1j * grid.k_np * U
    c += -nu4 * grid.wv4_np - nu * grid.wv2_np - mu
    if beta:
        c += beta * (1j * grid.k_np) * grid.wv2i_np
    return c


def linear_operator_phi(grid: Grid, U: float, f: float, kappa2: float,
                        nu4w: float, nuw: float, muw: float) -> np.ndarray:
    """Linear operator of the wave equation (``niwqg/Kernel.py:440-442``)."""
    c = np.zeros((grid.nl, grid.nk), np.complex128) - 1j * grid.k_np * U
    c += (
        -nu4w * grid.wv4_np
        - 0.5j * f * (grid.wv2_np / kappa2)
        - nuw * grid.wv2_np
        - muw
    )
    return c


def linear_operator_c(grid: Grid, nu4c: float, nuc: float, muc: float) -> np.ndarray:
    """Linear operator of the passive-scalar equation (``niwqg/QGModel.py:452-453``)."""
    c = np.zeros((grid.nl, grid.nk), np.complex128)
    c += -nu4c * grid.wv4_np - nuc * grid.wv2_np - muc
    return c
