"""Large-grid coupled Lamb-dipole run with energy-budget closure check.

The BASELINE.json north-star configuration: a coupled NIW-QG Lamb-dipole
simulation at large resolution (default 4096²) whose RK4-integrated
Ke/Kw/Pw budgets must track the instantaneous energies — the reference's
strongest correctness oracle (tests/test_diagnostics.py), exercised here at
a scale the reference NumPy solver cannot reach in reasonable time.

Runs in fused scan chunks with diagnostics sampled between chunks.

Usage:
  NIWQG_SCALE_NX=4096 NIWQG_SCALE_STEPS=100 python scripts/scale_run.py
"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    if jax.default_backend() in ("cpu",) and \
            os.environ.get("NIWQG_SCALE_F32", "0") == "0":
        # the CPU path is the f64 control; without this flag jax silently
        # truncates every requested f64 to f32 (which is its own useful
        # mode: NIWQG_SCALE_F32=1 = native-FFT f32 control)
        jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic

    nx = int(os.environ.get("NIWQG_SCALE_NX", "4096"))
    nsteps = int(os.environ.get("NIWQG_SCALE_STEPS", "100"))
    chunk = int(os.environ.get("NIWQG_SCALE_CHUNK", "10"))
    precision = os.environ.get("NIWQG_SCALE_PRECISION", "auto")
    extra = {}
    if os.environ.get("NIWQG_SCALE_GAUSS"):
        extra["transform_opts"] = {
            "gauss": os.environ["NIWQG_SCALE_GAUSS"] != "0"}
    # NIWQG_SCALE_FILTER=1 runs the production configuration (exponential
    # filter ON). The budget is then NOT closed — filter dissipation is
    # untracked, in the reference too — so this mode only checks
    # long-horizon stability (finiteness + sane energies), not closure.
    use_filter = os.environ.get("NIWQG_SCALE_FILTER", "0") != "0"
    if os.environ.get("NIWQG_SCALE_FAST"):
        extra["fast"] = os.environ["NIWQG_SCALE_FAST"] != "0"

    U0 = 0.1
    L = 2 * np.pi * 200e3
    k0 = 10 * (2 * np.pi / L)
    Te = (U0 * k0) ** -1
    dt = 0.025 * Te
    # the fixed dt above violates the advective CFL at large nx (the
    # dominant speed is the NIW amplitude |phi| ~ 2*sqrt(2)*U0/sqrt(2) =
    # 0.28 m/s; at 4096² dx = 307 m so CFL = 4.6 — guaranteed blow-up
    # with or without the filter). NIWQG_SCALE_CFL rescales dt to the
    # requested advective CFL for production-configuration runs.
    cfl_target = float(os.environ.get("NIWQG_SCALE_CFL", "0"))
    if cfl_target > 0:
        vmax = 2 * np.sqrt(2) * U0 / np.sqrt(2)  # |phi| of the IC below
        dx = L / nx
        dt = cfl_target * dx / vmax
        print(f"CFL-scaled dt = {dt:.1f}s (target CFL {cfl_target})",
              flush=True)
    # resolution-appropriate dissipation, scaled from the stable flagship
    # 128² example (examples/LambDipole.py: nu4=5e11, nu=20, nuw=50):
    # hyperviscosity ~ dx^3, Laplacian viscosities ~ dx^2. The previous
    # nu4w-only scaling left the wave field essentially undamped and the
    # configuration blew up at 512² even in float64 with native FFTs —
    # a parameter instability, not a solver property.
    s = 128.0 / nx
    nu4 = 5e11 * s**3
    # production (filter-ON) runs add the flagship example's wave
    # hyperviscosity, resolution-scaled (examples/LambDipole.py runs
    # nu4=nu4w=5e11 at 128² and is long-horizon stable). The closure
    # (filter-OFF) config keeps nu4w=0: with an energetic uniform NIW
    # field the wave cascade then sharpens until blow-up at ANY
    # precision — measured NaN at step ~150 in f64 at 512² and 1024²,
    # the control for the round-2 4096² f32 NaN; even filter-ON cannot
    # arrest it without interior wave damping (f64 512² CFL-safe run
    # went non-finite at step ~350).
    nu4w = 5e11 * s**3 if use_filter else 0.0
    # dissipation margin for long-horizon production runs
    # (NIWQG_SCALE_NU4W_MULT=4 etc.)
    nu4w *= float(os.environ.get("NIWQG_SCALE_NU4W_MULT", "1"))

    # filter OFF so the budget is exactly closed (the exponential filter's
    # dissipation is untracked by the budget, in the reference too); the
    # nu/nuw Laplacian dissipation is tracked by ep_psi/chi_phi/ep_phi so
    # closure remains exact
    m = CoupledModel.Model(
        L=L, nx=nx, tmax=nsteps * dt, dt=dt, m=2 * np.pi / 280, N=0.01,
        f=1e-4, nu4=nu4, nu4w=nu4w, nu=20.0 * s**2, nuw=50.0 * s**2,
        use_filter=use_filter, U=-U0, tdiags=nsteps + 1,
        precision=precision, **extra,
    )
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 2 * U0 / np.sqrt(2))

    K = m.kernel
    t0 = time.time()
    run = m._chunk(chunk)
    closures = []
    state = m.state
    t_first = None
    for i in range(nsteps // chunk):
        state = run(state)
        if t_first is None:
            t_first = time.time()  # end of the compile-bearing first chunk
        ke_inst = float(np.asarray(K.ke_qg(state.d.ph)))
        kw_inst = float(np.asarray(K.ke_niw(state.d.phi)))
        pw_inst = float(np.asarray(K.pe_niw(state.phih)))
        Ke, Kw, Pw = (float(np.asarray(state.Ke)), float(np.asarray(state.Kw)),
                      float(np.asarray(state.Pw)))
        # normalise all three budget errors by the dominant energy scale
        # (Pw starts at ~0, so a per-term relative error is ill-posed)
        scale = max(abs(ke_inst), abs(kw_inst), abs(pw_inst))
        rel = max(abs(Ke - ke_inst), abs(Kw - kw_inst),
                  abs(Pw - pw_inst)) / scale
        closures.append(rel)
        print(f"step {(i+1)*chunk:4d}: Ke={Ke:.5e} (inst {ke_inst:.5e}) "
              f"Kw={Kw:.5e} Pw={Pw:.3e} worst_closure={rel:.2e} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        if not np.isfinite(rel):
            print(f"NON-FINITE at step <= {(i+1)*chunk}", flush=True)
            break
    wall = time.time() - t0
    pts = nx * nx * nsteps / wall
    print(f"\n{nx}^2 x {nsteps} steps in {wall:.0f}s "
          f"({nsteps/wall:.2f} steps/s, {pts/1e6:.1f}M grid-pt-steps/s, "
          f"{pts/ (20.0*128*128):.0f}x baseline)")
    nsteady = len(closures) * chunk - chunk
    if t_first is not None and nsteady > 0:
        sw = time.time() - t_first
        spts = nx * nx * nsteady / sw
        print(f"steady-state (excl. first compile-bearing chunk): "
              f"{nsteady/sw:.2f} steps/s, {spts/1e6:.1f}M grid-pt-steps/s, "
              f"{spts/(20.0*128*128):.0f}x baseline")
    # NaN-proof: max() would silently drop NaNs (they compare False)
    worst = float(np.max(closures)) if np.all(np.isfinite(closures)) \
        else float("nan")
    if use_filter:
        # filter dissipation is untracked by the budget (reference
        # behaviour too): stability-only criterion
        ok = bool(np.isfinite(worst))
        print(f"filter ON: stability check only (closure {worst:.2e} "
              "not asserted)")
    else:
        # closure is RK4-accurate, not exact: truncation ~1e-6 relative at
        # this dt in f64; f32 adds transform/rounding noise
        tol = 5e-3 if m.kernel.dtype == np.float32 else 1e-5
        print(f"worst budget closure: {worst:.2e} (tol {tol:.0e})")
        ok = bool(np.isfinite(worst)) and worst < tol
    print("SCALE RUN:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
