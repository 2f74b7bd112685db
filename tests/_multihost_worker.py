"""Worker for the 2-process localhost jax.distributed smoke test.

Launched by ``tests/test_multihost.py`` as two subprocesses, each with 2
virtual CPU devices: initialize the distributed runtime, build ONE global
4-device mesh across both processes, assemble the IC from host-local row
blocks, run one full coupled step, and (process 0) write the gathered
result for the parent to compare against a single-process run.

Usage: python _multihost_worker.py <port> <process_id> <out.npz>
"""

import os
import sys

port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the documented pod-slice bootstrap path: multihost.initialize BEFORE
# anything touches the XLA backend (the import itself must stay clean)
from niwqg_tpu.parallel import multihost

multihost.initialize(f"127.0.0.1:{port}", 2, pid)
multihost.initialize()  # repeated call must be a benign no-op
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

from jax.experimental import multihost_utils

from niwqg_tpu import CoupledModel
from niwqg_tpu import InitialConditions as ic

mesh = multihost.global_mesh()
nx = 64
U0 = 0.05
m = CoupledModel.Model(nx=nx, use_filter=False, U=-U0, tdiags=1,
                       tmax=5 * 10000.0, mesh=mesh)
k0 = 10 * (2 * np.pi / m.L)
q_full = np.asarray(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
phi_full = (np.ones_like(q_full) + 1j) * 5 * U0 / np.sqrt(2)

# host-sharded IC assembly: each process contributes its row block
rows = multihost.host_local_rows(nx)
q_global = multihost.make_global_field(mesh, q_full[rows], nx)
# the model's set_* path accepts replicated host arrays; the global
# row-sharded array proves the documented pod-slice data-loading path
np.testing.assert_array_equal(
    multihost_utils.process_allgather(q_global, tiled=True), q_full)

m.set_q(q_full)
m.set_phi(phi_full)
m.run_steps(5)

q_out = multihost_utils.process_allgather(m.state.d.q, tiled=True)
ke_out = float(np.asarray(m.state.Ke))
assert np.isfinite(q_out).all()
if pid == 0:
    np.savez(out, q=q_out, Ke=ke_out)
    print("WORKER0 OK", flush=True)
else:
    print("WORKER1 OK", flush=True)
