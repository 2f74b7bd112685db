"""Weak/strong-scaling harness: step throughput vs device count.

Emits one JSON line per (n_devices, nx) point with steps/s and parallel
efficiency, ready for real multi-chip hardware (BASELINE demands >=85%
weak scaling across >=2 hosts). On this image it runs on the virtual CPU
mesh (set XLA_FLAGS=--xla_force_host_platform_device_count=N) — numbers
are then about correctness/overhead structure, not ICI bandwidth.

Weak scaling holds the per-device grid area fixed: nx doubles every 4x
devices (the grid is square). Strong scaling holds nx fixed.

Usage:
  NIWQG_SCALING_MODE=weak NIWQG_SCALING_BASE_NX=256 \
  NIWQG_SCALING_DEVICES=1,4,16 python scripts/weak_scaling.py
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _build_coupled
    from niwqg_tpu.parallel.mesh import make_mesh

    mode = os.environ.get("NIWQG_SCALING_MODE", "weak")
    base_nx = int(os.environ.get("NIWQG_SCALING_BASE_NX", "256"))
    nsteps = int(os.environ.get("NIWQG_SCALING_STEPS", "10"))
    backend = os.environ.get("NIWQG_SCALING_BACKEND", "auto")
    devs_env = os.environ.get("NIWQG_SCALING_DEVICES")
    if devs_env:
        dev_counts = [int(d) for d in devs_env.split(",")]
    else:
        n = len(jax.devices())
        dev_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n]

    results = []
    for P in dev_counts:
        if mode == "weak":
            # constant grid area per device: nx ~ base * sqrt(P)
            nx = int(base_nx * round(np.sqrt(P)))
        else:
            nx = base_nx
        mesh = make_mesh(P) if P > 1 else None
        if os.environ.get("NIWQG_SCALING_FAST", "1") != "0":
            # production (batched fast-kernel) step shape regardless of
            # host backend, so scaling structure matches the TPU path
            import numpy as _np

            from niwqg_tpu import CoupledModel
            from niwqg_tpu import InitialConditions as ic
            U0 = 0.05
            m = CoupledModel.Model(
                L=2 * _np.pi * 200e3, nx=nx, dt=157.0, tmax=157.0 * 100,
                m=1.0 / 325, N=0.005, f=1e-4, use_filter=True,
                nu4=7.5e9, nu4w=7.5e9, mesh=mesh, backend=backend,
                fast=True)
            k0 = 10 * (2 * _np.pi / m.L)
            q = ic.LambDipole(m, U=U0, R=2 * _np.pi / k0)
            m.set_q(q)
            m.set_phi((_np.ones_like(q) + 1j) * 5 * U0 / _np.sqrt(2))
        else:
            m = _build_coupled(nx=nx, mesh=mesh, dtype=None,
                               backend=backend)
        run = m._chunk(nsteps)
        state = run(m.state)  # compile + warm
        ke = float(np.asarray(state.Ke))
        assert np.isfinite(ke), ke
        t0 = time.time()
        state = run(state)
        ke = float(np.asarray(state.Ke))  # fetch-closed timing
        dt_s = time.time() - t0
        assert np.isfinite(ke), ke
        steps_per_s = nsteps / dt_s
        pts_per_s = steps_per_s * nx * nx
        rec = {"devices": P, "nx": nx, "steps_per_s": round(steps_per_s, 3),
               "grid_pt_steps_per_s": round(pts_per_s, 1), "mode": mode}
        if results:
            base = results[0]
            if mode == "weak":
                # ideal: per-device throughput constant
                eff = (pts_per_s / P) / base["grid_pt_steps_per_s"]
            else:
                eff = (pts_per_s / base["grid_pt_steps_per_s"]) / P
            rec["efficiency"] = round(float(eff), 3)
        else:
            rec["efficiency"] = 1.0
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
