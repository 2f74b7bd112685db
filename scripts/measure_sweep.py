"""Same-process A/B throughput sweep on the live backend.

Measures the fused-scan coupled step for a sequence of configs in ONE
fresh process (the trustworthy protocol per PERFORMANCE.md: clean pool,
control first, every timed region closed by a scalar fetch).

Usage:
    python scripts/measure_sweep.py "2048" "2048:budgets=0" "512"

Each spec is "<nx>[:budgets=0][:steps=N]". Results stream to stdout as
one line per config.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_PTS = 20.0 * 128 * 128


def measure(nx: int, budgets: bool, nsteps: int):
    from __graft_entry__ import _build_coupled

    m = _build_coupled(nx=nx, compute_budgets=budgets)
    run = m._chunk(nsteps)

    t0 = time.time()
    state = run(m.state)
    ke = float(np.asarray(state.Ke))
    compile_s = time.time() - t0
    assert np.isfinite(ke), f"non-finite Ke after warmup: {ke}"

    t0 = time.time()
    state = run(state)
    ke = float(np.asarray(state.Ke))
    dt = time.time() - t0
    assert np.isfinite(ke), f"non-finite Ke after bench: {ke}"

    sps = nsteps / dt
    pts = sps * nx * nx
    print(f"RESULT nx={nx} budgets={int(budgets)} steps/s={sps:.2f} "
          f"pts/s={pts:.3e} vs_baseline={pts / BASELINE_PTS:.1f} "
          f"compile_s={compile_s:.0f} Ke={ke:.6e}", flush=True)


def main():
    specs = sys.argv[1:] or ["2048", "2048:budgets=0", "512"]
    for spec in specs:
        parts = spec.split(":")
        nx = int(parts[0])
        budgets = True
        nsteps = 10
        for p in parts[1:]:
            k, v = p.split("=")
            if k == "budgets":
                budgets = v != "0"
            elif k == "steps":
                nsteps = int(v)
        t0 = time.time()
        try:
            measure(nx, budgets, nsteps)
        except Exception as e:  # keep the sweep going
            print(f"RESULT nx={nx} budgets={int(budgets)} FAILED after "
                  f"{time.time() - t0:.0f}s: {e!r}", flush=True)


if __name__ == "__main__":
    main()
