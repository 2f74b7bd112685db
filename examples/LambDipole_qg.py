"""Lamb dipole in the standalone barotropic QG model with a passive scalar.

TPU-native analog of ``/root/reference/examples/LambDipole_qg.py``.
"""

import timeit

start = timeit.default_timer()

import numpy as np

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from niwqg_tpu import QGModel as Model
from niwqg_tpu import InitialConditions as ic

# parameters
nx = 128
L = 2 * np.pi * 200e3
k0 = 10 * (2 * np.pi / L)

U = 1.0e-1
Te = (U * k0) ** -1

dt = 0.05 * Te
tmax = 300 * Te

m = Model.Model(
    L=L, nx=nx, tmax=tmax, dt=dt, twrite=500,
    nu4=5e11, use_filter=True, U=-U, tdiags=10,
    passive_scalar=True, save_to_disk=False,
)

q = ic.LambDipole(m, U=U, R=2 * np.pi / k0)
c = np.real(ic.PlaneWave(m, k=k0, l=k0)) * np.abs(q).max()

m.set_q(q)
m.set_c(c)
m.run()

time = m.diagnostics["time"]["value"]
KE = m.diagnostics["ke_qg"]["value"]
C2 = m.diagnostics["C2"]["value"]
cvar = m.diagnostics["cvar"]["value"]

stop = timeit.default_timer()
print("Time elapsed: %3.2f seconds" % (stop - start))
print("KE: %.3e -> %.3e" % (KE[0], KE[-1]))
print("tracer variance closure max rel err:",
      np.abs(C2 - cvar).max() / np.abs(C2).max())
