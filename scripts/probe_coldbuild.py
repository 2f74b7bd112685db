"""Cold-build UX probe: model-construction-to-first-step wall time.

Measures the three phases a real user pays once per process at the
flagship size (VERDICT r4 item 5 / ROADMAP item 3):
  build_s   Model() construction incl. ETDRK4 contour tables
  init_s    set_q + set_phi materialization (lazy: one jitted module;
            eager: per-op dispatch through the remote backend)
  step1_s   first full jitted step (chunk compile; persistent cache)

Usage:  NIWQG_LAZY_INIT=0|1 NIWQG_CB_NX=2048 python scripts/probe_coldbuild.py
"""

import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import niwqg_tpu

    cache = os.environ.get("NIWQG_COMPILE_CACHE", "1") != "0"
    if cache:
        niwqg_tpu.enable_compile_cache(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))

    import jax

    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic

    nx = int(os.environ.get("NIWQG_CB_NX", "2048"))
    lazy = os.environ.get("NIWQG_LAZY_INIT", "1")
    U0 = 0.05

    t0 = time.time()
    m = CoupledModel.Model(
        L=2 * np.pi * 200e3, nx=nx, dt=157.0, tmax=157.0 * 100,
        m=1.0 / 325, N=0.005, f=1e-4, use_filter=True,
        nu4=7.5e9, nu4w=7.5e9)
    build_s = time.time() - t0

    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    phi = (np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2)
    t0 = time.time()
    m.set_q(q)
    m.set_phi(phi)
    ke0 = float(np.asarray(m.state.Ke))  # forces the lazy flush
    init_s = time.time() - t0
    assert np.isfinite(ke0), ke0

    t0 = time.time()
    st = m._step_jit(m.state)
    ke1 = float(np.asarray(st.Ke))
    step1_s = time.time() - t0
    assert np.isfinite(ke1), ke1

    total = build_s + init_s + step1_s
    print(f"RESULT lazy={lazy} nx={nx} backend={jax.default_backend()} "
          f"cache={int(cache)} build_s={build_s:.1f} init_s={init_s:.1f} "
          f"step1_s={step1_s:.1f} total_s={total:.1f} Ke0={ke0:.6e} "
          f"Ke1={ke1:.6e}", flush=True)


if __name__ == "__main__":
    main()
