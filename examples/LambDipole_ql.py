"""Quasilinear NIW-QG: a wave packet on a Lamb dipole, QLModel.

The reference ships ``niwqg/QLModel.py`` unconstructible (it never sets
``self.model`` and calls CoupledModel's ``jacobian_phic_phi``), so it has
no example. This runs niwqg_tpu's working QLModel in BOTH modes:

  - default: the *intended* quasilinear physics (waves advected by the
    vortex flow only; the reference's ``1j`` wave-PV transcription bug at
    ``QLModel.py:83`` corrected);
  - ``faithful_quirks=True``: the repaired reference reproduced
    bug-for-bug (golden-tested at 1e-12 in
    ``tests/test_golden_reference.py::test_ql_model_parity``).

Run (CPU float64):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/LambDipole_ql.py
Run (TPU float32): plain ``python examples/LambDipole_ql.py``.
"""

import numpy as np

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from niwqg_tpu import InitialConditions as ic
from niwqg_tpu import QLModel

U0 = 0.05
dt = 1000.0   # CFL-safe for the O(1 m/s) wave packet (dx ~ 3.9 km)
nsteps = 50

runs = {}
for faithful in (False, True):
    m = QLModel.Model(use_filter=False, U=-U0, tdiags=5, tmax=nsteps * dt,
                      dt=dt, twrite=25, faithful_quirks=faithful,
                      save_to_disk=False)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    # scale the unit-amplitude packet to wave speeds comparable with the
    # dipole flow so neither component dominates the dynamics
    phi = 2 * U0 * np.asarray(ic.WavePacket(m, k=2 * k0, l=0,
                                            R=2 * np.pi / k0,
                                            x0=m.L / 2, y0=m.L / 2))
    m.set_q(q)
    m.set_phi(phi)
    m.run()
    runs[faithful] = m
    label = "faithful (repaired reference)" if faithful else "intended"
    print(f"QL [{label}]: Ke={m.Ke:.6e}  Kw={m.Kw:.6e}  Pw={m.Pw:.3e}")

a, b = runs[False], runs[True]
d = np.abs(np.asarray(a.phih) - np.asarray(b.phih)).max()
print(f"max |phih_intended - phih_faithful| = {d:.3e} "
      f"(the quirks are dynamically significant)")
ke = a.diagnostics["ke_qg"]["value"]
print(f"intended-mode ke_qg series ({len(ke)} samples): "
      f"{ke[0]:.4e} -> {ke[-1]:.4e}, finite={np.all(np.isfinite(ke))}")
