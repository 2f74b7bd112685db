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


def test_host_local_rows_rejects_indivisible(monkeypatch):
    # the check only binds for >1 process; simulate a 2-process job
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="not divisible"):
        multihost.host_local_rows(63)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert multihost.host_local_rows(64) == slice(32, 64)


def test_make_global_field_rejects_bad_block(mesh):
    # wrong local row count must fail loudly, not silently mis-tile
    with pytest.raises(ValueError, match="rows"):
        multihost.make_global_field(mesh, np.zeros((3, 64)), 64)


def test_two_process_distributed_smoke(tmp_path):
    """Real jax.distributed over localhost: 2 processes x 2 virtual CPU
    devices = one global 4-device mesh; initialize + host-row IC assembly
    + 5 coupled pencil steps, compared against a single-process run
    (VERDICT r4 item 7). Skips with the runtime's message if this
    environment cannot host the coordinator."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = str(__import__("pathlib").Path(__file__).parent /
                 "_multihost_worker.py")
    out = str(tmp_path / "mh.npz")
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(i),
                               out], stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    try:
        outs = [p.communicate(timeout=300)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed localhost smoke timed out in this "
                    "environment")
    if any(p.returncode for p in procs):
        msg = "\n".join(outs)
        if "UNAVAILABLE" in msg or "service" in msg.lower():
            pytest.skip(f"distributed runtime unavailable here:\n{msg[-800:]}")
        raise AssertionError(f"worker failed:\n{msg[-2000:]}")

    got = np.load(out)

    # single-process control on this process's own devices (same pencil
    # provider, 4-device mesh): must agree to rounding error
    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic

    U0 = 0.05
    m = CoupledModel.Model(nx=64, use_filter=False, U=-U0, tdiags=1,
                           tmax=5 * 10000.0, mesh=make_mesh(4))
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
    m.run_steps(5)
    scale = np.abs(m.q).max()
    assert np.abs(got["q"] - m.q).max() < 1e-12 * scale
    assert abs(float(got["Ke"]) - m.Ke) < 1e-12 * abs(m.Ke)


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
