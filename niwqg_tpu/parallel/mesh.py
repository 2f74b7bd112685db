"""Device-mesh utilities and state sharding for the pencil decomposition.

The scaling dimension of this framework is grid resolution (SURVEY.md §5):
the ``(ny, nx)`` grid is sharded over a 1-D mesh axis ``'x'``. Physical
fields live row-sharded ``P('x', None)``; spectral fields live
column-sharded ``P(None, 'x')`` — the layout produced by the distributed
transform's all-to-all transpose, so no extra transposes are needed between
steps. Elementwise spectral algebra, the ETDRK4 updates, and all domain-mean
reductions (which XLA lowers to ``psum`` over the mesh) partition
automatically under ``jit`` from these input shardings.

The reference has no distributed execution of any kind (SURVEY.md §2); this
layer is the TPU-native scale-out design it lacks.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..carray import C

AXIS = "x"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def phys_sharding(mesh: Mesh) -> NamedSharding:
    """Physical-space fields: rows (y) sharded."""
    return NamedSharding(mesh, P(AXIS, None))


def spec_sharding(mesh: Mesh) -> NamedSharding:
    """Spectral-space fields: columns (k) sharded (post-transpose layout)."""
    return NamedSharding(mesh, P(None, AXIS))


def scalar_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(leaf, sh):
    return jax.device_put(leaf, sh)


def shard_wave_state(state, mesh: Mesh):
    """Place a WaveState on the mesh with pencil-consistent shardings.

    Spectral arrays are column-sharded when their width divides the mesh
    (the pencil layout); the fast kernel's ``q_half`` arrays are
    ``(ny, nx//2+1)`` — never mesh-divisible — and get row-sharded instead
    (rows are the full ``ny``), from which the GSPMD matmul-DFT partitions
    fine (same trick as :func:`shard_qg_state`)."""
    ps, rs = phys_sharding(mesh), scalar_sharding(mesh)
    nP = mesh.shape[AXIS]

    def spec(z: C):
        return spec_sharding(mesh) if z.re.shape[-1] % nP == 0 else ps

    def put_c(z: C, sh=None):
        sh = sh or spec(z)
        return C(_put(z.re, sh), _put(z.im, sh))

    d = state.d._replace(
        ph=put_c(state.d.ph), qwh=put_c(state.d.qwh),
        phi=put_c(state.d.phi, ps), phix=put_c(state.d.phix, ps),
        phiy=put_c(state.d.phiy, ps),
        p=None if state.d.p is None else _put(state.d.p, ps),
        q=_put(state.d.q, ps),
        q_psi=_put(state.d.q_psi, ps), u=_put(state.d.u, ps),
        v=_put(state.d.v, ps),
    )
    return state._replace(
        t=_put(state.t, rs), tc=_put(state.tc, rs),
        qh=put_c(state.qh), phih=put_c(state.phih), d=d,
        Ke=_put(state.Ke, rs), Pw=_put(state.Pw, rs), Kw=_put(state.Kw, rs),
    )


def shard_qg_state(state, mesh: Mesh):
    """Place a QGState on the mesh (full- or half-spectrum layout).

    Spectral arrays are column-sharded when the column count divides the
    mesh (the pencil layout; padded by ``PencilTransform.rfft_pad``), and
    row-sharded otherwise (the un-padded half-spectrum MXU/GSPMD path,
    where ``device_put`` cannot split nk = nx//2+1 columns evenly but the
    matmul-DFT partitions fine from row shardings)."""
    ps, ss, rs = phys_sharding(mesh), spec_sharding(mesh), scalar_sharding(mesh)
    nP = mesh.shape[AXIS]
    if state.qh.re.shape[-1] % nP != 0:
        ss = ps

    def put_c(z: C, sh):
        return C(_put(z.re, sh), _put(z.im, sh))

    return state._replace(
        t=_put(state.t, rs), tc=_put(state.tc, rs),
        qh=put_c(state.qh, ss), ch=put_c(state.ch, ss),
        ph=put_c(state.ph, ss),
        p=_put(state.p, ps), q=_put(state.q, ps), c=_put(state.c, ps),
        u=_put(state.u, ps), v=_put(state.v, ps),
        Ke=_put(state.Ke, rs), cvar=_put(state.cvar, rs),
    )
