"""Generate the stored-fixture trajectories for tests/test_fixture_trajectory.py.

Runs short CoupledModel and QGModel simulations on the CPU/f64 path and
stores the prognostic fields + integrated budgets. The committed fixture
gives CI a trajectory regression oracle that works without the mounted
reference repo (tests/test_golden_reference.py skips there).

Regenerate ONLY when a deliberate numerics change is made (and say so in
the commit message):

    JAX_PLATFORMS=cpu python scripts/make_fixture.py
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "trajectory.npz")


def coupled():
    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic

    m = CoupledModel.Model(L=2 * np.pi * 200e3, nx=64, dt=10000.0,
                           tmax=10000.0 * 20, m=1.0 / 325, N=0.005, f=1e-4,
                           use_filter=True, nu4=5e10, nu4w=5e10,
                           save_to_disk=False)
    q = ic.McWilliams1984(m, k0=6, E=2.5e-4, seed=11)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 0.05 / np.sqrt(2))
    m.run_steps(20)
    return dict(
        coupled_q=np.asarray(m.q), coupled_phi=np.asarray(m.phi),
        coupled_Ke=float(m.state.Ke), coupled_Pw=float(m.state.Pw),
        coupled_Kw=float(m.state.Kw),
    )


def qg():
    from niwqg_tpu import QGModel
    from niwqg_tpu import InitialConditions as ic

    m = QGModel.Model(L=2 * np.pi * 200e3, nx=64, dt=10000.0,
                      tmax=10000.0 * 20, beta=1e-11, nu4=5e10,
                      use_filter=True, passive_scalar=True,
                      save_to_disk=False)
    q = ic.McWilliams1984(m, k0=6, E=2.5e-4, seed=13)
    m.set_q(q)
    m.set_c(np.asarray(q, dtype=float).copy())
    m.run_steps(20)
    return dict(qg_q=np.asarray(m.q), qg_c=np.asarray(m.c),
                qg_Ke=float(m.state.Ke), qg_cvar=float(m.state.cvar))


def main():
    data = {}
    data.update(coupled())
    data.update(qg())
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}")
    for k, v in data.items():
        if np.ndim(v) == 0:
            print(f"  {k} = {v:.12e}")
        else:
            print(f"  {k}: shape {np.shape(v)}, |max| {np.abs(v).max():.6e}")


if __name__ == "__main__":
    main()
