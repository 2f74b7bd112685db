"""Coupled Lamb-dipole run sharded across all available devices.

Demonstrates the mesh-parallel execution path (no counterpart in the
reference, which is single-process NumPy). On a CPU host, force a virtual
mesh first:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python examples/LambDipole_sharded.py
"""

import os

import numpy as np

import jax

# device-count config must be set before backends initialize, so decide
# from the environment rather than jax.default_backend()
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

from niwqg_tpu import CoupledModel as Model
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.parallel.mesh import make_mesh

ndev = len(jax.devices())
mesh = make_mesh(ndev)
print(f"running on a {ndev}-device mesh ({jax.default_backend()})")

nx = 256
f0 = 1.0e-4
L = 2 * np.pi * 200e3
k0 = 10 * (2 * np.pi / L)
U = 1.0e-1
Te = (U * k0) ** -1

m = Model.Model(
    L=L, nx=nx, tmax=2 * Te, dt=0.025 * Te,
    m=2 * np.pi / 280, N=0.01, f=f0, twrite=20,
    nu4=5e11, nuw=50.0, use_filter=False, U=-U, tdiags=10, mesh=mesh,
)

q = ic.LambDipole(m, U=U, R=2 * np.pi / k0)
m.set_q(q)
m.set_phi((np.ones_like(q) + 1j) * 2 * U / np.sqrt(2))
print("qh sharding:", m.state.qh.re.sharding)
m.run()
print(f"done: {m.tc} steps, Ke={m.Ke:.4e}, Kw={m.Kw:.4e}")
