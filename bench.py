"""Benchmark: coupled NIW-QG step throughput on the current backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference NumPy solver's only stated figure — ~20 coupled
steps/s at 128^2 on a 2.2 GHz i7 (``examples/LambDipole.py:5-6``), i.e.
~0.33M grid-point-steps/s. ``vs_baseline`` is the speedup of this
framework's grid-points/s over that figure.

Environment knobs:
  NIWQG_BENCH_NX     grid size (default 512)
  NIWQG_BENCH_STEPS  timed steps (default 20)
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    nx = int(os.environ.get("NIWQG_BENCH_NX", "512"))
    nsteps = int(os.environ.get("NIWQG_BENCH_STEPS", "20"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_coupled

    m = _build_coupled(nx=nx)

    # compile + warm up one scan chunk
    chunk = m._chunk(nsteps)
    t0 = time.time()
    state = chunk(m.state)
    jax.block_until_ready(state)
    compile_s = time.time() - t0

    # timed steady-state run; the Ke fetch inside the timed region forces a
    # real device round-trip (block_until_ready alone has been observed to
    # return before results are actually materializable on this backend)
    t0 = time.time()
    state = chunk(state)
    ke = float(np.asarray(state.Ke))
    dt_s = time.time() - t0
    assert np.isfinite(ke), f"non-finite Ke after {2*nsteps} steps: {ke}"

    steps_per_s = nsteps / dt_s
    pts_per_s = steps_per_s * nx * nx
    baseline_pts_per_s = 20.0 * 128 * 128  # reference: ~20 steps/s @ 128^2

    print(json.dumps({
        "metric": f"coupled-step grid-points/s @ {nx}^2 ({jax.default_backend()})",
        "value": round(pts_per_s, 1),
        "unit": "grid-point-steps/s",
        "vs_baseline": round(pts_per_s / baseline_pts_per_s, 2),
    }))
    print(f"# steps/s={steps_per_s:.2f} compile_s={compile_s:.1f} "
          f"nsteps={nsteps} nx={nx}", file=sys.stderr)


if __name__ == "__main__":
    main()
