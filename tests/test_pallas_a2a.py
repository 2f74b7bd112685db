"""Pallas direct-exchange RDMA transpose (interpret mode, virtual mesh).

Correctness bar for the `make_async_remote_copy` kernel that replaces
``lax.all_to_all`` in the pencil FFT (``parallel/pallas_a2a.py``): exact
layout equality with the XLA collective, both directions, chunked and
monolithic, plus an end-to-end coupled run through the public
``transform_opts`` gate. Compiled-mode performance needs real multi-chip
ICI (not available here); this pins the semantics so the kernel is ready
to A/B on hardware.
"""

import numpy as np
import pytest

import jax
from jax import lax
from jax.sharding import PartitionSpec as P

from niwqg_tpu import CoupledModel
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.parallel.mesh import AXIS, make_mesh
from niwqg_tpu.parallel.pallas_a2a import all_to_all_fwd, all_to_all_inv

NDEV = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs >= 4 devices")
    return make_mesh(NDEV)


@pytest.mark.parametrize("chunks", [1, 2])
@pytest.mark.parametrize("lead", [(), (3,)])
def test_fwd_matches_lax_all_to_all(mesh, rng, chunks, lead):
    ny, nx = 32, 64
    z = (rng.standard_normal(lead + (ny, nx))
         + 1j * rng.standard_normal(lead + (ny, nx)))

    def pallas_local(x):
        return all_to_all_fwd(x, NDEV, chunks=chunks, interpret=True)

    def lax_local(x):
        return lax.all_to_all(x, AXIS, split_axis=x.ndim - 1,
                              concat_axis=x.ndim - 2, tiled=True)

    r = len(lead)
    spec_in = P(*([None] * r + [AXIS, None]))
    spec_out = P(*([None] * r + [None, AXIS]))
    got = jax.jit(jax.shard_map(pallas_local, mesh=mesh, in_specs=spec_in,
                                out_specs=spec_out, check_vma=False))(z)
    want = jax.jit(jax.shard_map(lax_local, mesh=mesh, in_specs=spec_in,
                                 out_specs=spec_out))(z)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("chunks", [1, 2])
def test_inv_matches_lax_all_to_all(mesh, rng, chunks):
    ny, nx = 64, 32
    z = (rng.standard_normal((ny, nx))
         + 1j * rng.standard_normal((ny, nx)))

    def pallas_local(x):
        return all_to_all_inv(x, NDEV, chunks=chunks, interpret=True)

    def lax_local(x):
        return lax.all_to_all(x, AXIS, split_axis=x.ndim - 2,
                              concat_axis=x.ndim - 1, tiled=True)

    got = jax.jit(jax.shard_map(pallas_local, mesh=mesh,
                                in_specs=P(None, AXIS),
                                out_specs=P(AXIS, None),
                                check_vma=False))(z)
    want = jax.jit(jax.shard_map(lax_local, mesh=mesh,
                                 in_specs=P(None, AXIS),
                                 out_specs=P(AXIS, None)))(z)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_coupled_pallas_a2a_equals_single(mesh):
    """End-to-end: a sharded coupled run with the RDMA transpose
    (user-reachable via transform_opts) equals the unsharded run."""
    def build(mesh, topts=None):
        U0 = 0.05
        m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                               tmax=3 * 10000.0, mesh=mesh,
                               transform_opts=topts)
        k0 = 10 * (2 * np.pi / m.L)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
        m.run()
        return m

    a = build(None)
    b = build(mesh, {"pallas_a2a": True, "pallas_interpret": True,
                     "overlap_chunks": 2})
    assert b.kernel.tr.pallas_a2a
    scale = np.abs(a.q).max()
    assert np.abs(a.q - b.q).max() < 1e-13 * scale
    assert np.abs(np.asarray(a.phi) - np.asarray(b.phi)).max() < 1e-13
    assert abs(a.Ke - b.Ke) < 1e-12 * abs(a.Ke)
