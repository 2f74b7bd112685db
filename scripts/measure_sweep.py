"""Same-process A/B throughput sweep on the live backend.

Measures the fused-scan coupled step for a sequence of configs in ONE
fresh process (the trustworthy protocol per PERFORMANCE.md: clean pool,
control first, every timed region closed by a scalar fetch).

Usage:
    python scripts/measure_sweep.py "2048" "2048:budgets=0" "512"

Each spec is "<nx>[:budgets=0][:steps=N][:pre=0]". ``pre=0`` disabled the
(since-reverted) precomputed budget laplacians; the alternating A/B it
ran measured that change ~12% slower at 2048² (PERFORMANCE.md), so the
flag is now a no-op kept for the record. Results stream to stdout as one
line per config.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_PTS = 20.0 * 128 * 128


def _build(nx: int, budgets: bool, pre: bool, form: str = "dotgen",
           n1: int = 0, model: str = "coupled", sb: bool = True,
           mb: int = 0, rp: str = "", pair: bool = False,
           ff: bool = False):
    from niwqg_tpu import CoupledModel, QGModel, YBJModel
    from niwqg_tpu import InitialConditions as ic

    topts = {"formulation": form}
    if n1:
        topts["factors"] = (n1, nx // n1)
    if mb:
        topts["max_batch"] = mb
    if rp:
        topts["realpath"] = rp
    U0 = 0.05
    L = 2 * np.pi * 200e3
    k0 = 10 * (2 * np.pi / L)
    if model == "qg":
        m = QGModel.Model(L=L, nx=nx, dt=157.0, tmax=157.0 * 100,
                          beta=1e-11, nu4=7.5e9, use_filter=True,
                          passive_scalar=True, transform_opts=topts,
                          spectral_budgets=sb, fold_filter=ff)
        q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
        m.set_q(q)
        m.set_c(np.asarray(q, dtype=np.float32).copy())
        return m
    if model == "ybj":
        m = YBJModel.Model(L=L, nx=nx, dt=157.0, tmax=157.0 * 100,
                           m=1.0 / 325, N=0.005, f=1e-4, use_filter=True,
                           nu4w=7.5e9, transform_opts=topts,
                           fold_filter=ff)
    else:
        kkw = {"pair_inverse": True} if pair else {}
        if ff:
            kkw["fold_filter"] = True
        m = CoupledModel.Model(
            L=L, nx=nx, dt=157.0, tmax=157.0 * 100,
            m=1.0 / 325, N=0.005, f=1e-4, use_filter=True,
            nu4=7.5e9, nu4w=7.5e9, compute_budgets=budgets,
            transform_opts=topts, spectral_budgets=sb, **kkw,
        )
    if not pre:
        # must flip before set_q so the state pytree is built without the
        # optional lap fields (stage_sources then uses its fallback batch)
        m.kernel._precompute_budgets = False
        m.state = m.kernel.zero_state()
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
    return m


def measure(nx: int, budgets: bool, nsteps: int, pre: bool = True,
            form: str = "dotgen", n1: int = 0, model: str = "coupled",
            sb: bool = True, mb: int = 0, rp: str = "", pair: bool = False,
            ff: bool = False):
    t_b = time.time()
    m = _build(nx, budgets, pre, form, n1, model, sb, mb, rp, pair, ff)
    print(f"STAGE built nx={nx} pair={int(pair)} "
          f"build_s={time.time() - t_b:.0f}", flush=True)
    run = m._chunk(nsteps)

    def ke_of(state):
        return float(np.asarray(state.Ke))

    t0 = time.time()
    state = run(m.state)
    ke = ke_of(state)
    compile_s = time.time() - t0
    assert np.isfinite(ke), f"non-finite Ke after warmup: {ke}"

    t0 = time.time()
    state = run(state)
    ke = ke_of(state)
    dt = time.time() - t0
    assert np.isfinite(ke), f"non-finite Ke after bench: {ke}"

    sps = nsteps / dt
    pts = sps * nx * nx
    print(f"RESULT model={model} nx={nx} budgets={int(budgets)} "
          f"sb={int(sb)} form={form} n1={n1} mb={mb} rp={rp or 'auto'} "
          f"pair={int(pair)} ff={int(ff)} steps/s={sps:.2f} "
          f"pts/s={pts:.3e} vs_baseline={pts / BASELINE_PTS:.1f} "
          f"compile_s={compile_s:.0f} Ke={ke:.6e}", flush=True)


def main():
    specs = sys.argv[1:] or ["2048", "2048:budgets=0", "512"]
    for spec in specs:
        parts = spec.split(":")
        nx = int(parts[0])
        budgets = True
        nsteps = 10
        pre = True
        sb = True
        form = "dotgen"
        n1 = 0
        mb = 0
        model = "coupled"
        rp = ""
        pair = False
        ff = False
        for p in parts[1:]:
            k, v = p.split("=")
            if k == "budgets":
                budgets = v != "0"
            elif k == "steps":
                nsteps = int(v)
            elif k == "pre":
                pre = v != "0"
            elif k == "sb":
                sb = v != "0"
            elif k == "form":
                form = v
            elif k == "n1":
                n1 = int(v)
            elif k == "mb":
                mb = int(v)
            elif k == "model":
                model = v
            elif k == "rp":
                rp = v
            elif k == "pair":
                pair = v != "0"
            elif k == "ff":
                ff = v != "0"
        t0 = time.time()
        try:
            measure(nx, budgets, nsteps, pre, form, n1, model, sb, mb, rp,
                    pair, ff)
        except Exception as e:  # keep the sweep going
            print(f"RESULT nx={nx} budgets={int(budgets)} FAILED after "
                  f"{time.time() - t0:.0f}s: {e!r}", flush=True)


if __name__ == "__main__":
    main()
