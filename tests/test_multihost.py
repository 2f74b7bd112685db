"""Multi-host bootstrap helpers, exercised in the single-process regime.

``parallel/multihost.py`` wraps process bootstrap + host-sharded data
loading for pod-slice runs. On a single process with a virtual device mesh
the helpers must reduce to the trivial decomposition and produce globally
correct arrays — the property that makes the same driver script work on a
real slice (SURVEY.md §5; BASELINE weak-scaling readiness).
"""

import numpy as np
import pytest

import jax

from niwqg_tpu.parallel import multihost
from niwqg_tpu.parallel.mesh import AXIS, make_mesh

NDEV = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs >= 4 devices")
    return make_mesh(NDEV)


def test_initialize_single_process_noop():
    multihost.initialize()  # must not raise in the single-process regime
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.shape[AXIS] == len(jax.devices())


def test_host_local_rows_single_process():
    nx = 64
    sl = multihost.host_local_rows(nx)
    assert (sl.start, sl.stop) == (0, 64)


def test_make_global_field(mesh, rng):
    nx = 64
    full = rng.standard_normal((nx, nx))
    local = full[multihost.host_local_rows(nx)]
    arr = multihost.make_global_field(mesh, local, nx)
    assert arr.shape == (nx, nx)
    # row-sharded over the mesh axis
    assert arr.sharding.spec == jax.sharding.PartitionSpec(AXIS, None)
    assert np.array_equal(np.asarray(arr), full)
    # addressable shards tile the rows contiguously
    rows = nx // mesh.shape[AXIS]
    for s in arr.addressable_shards:
        r0 = s.index[0].start or 0
        assert np.array_equal(np.asarray(s.data), full[r0:r0 + rows])
