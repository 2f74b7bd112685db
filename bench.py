"""Benchmark: coupled NIW-QG step throughput on the current backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference NumPy solver's only stated figure — ~20 coupled
steps/s at 128^2 on a 2.2 GHz i7 (``examples/LambDipole.py:5-6``), i.e.
~0.33M grid-point-steps/s. ``vs_baseline`` is the speedup of this
framework's grid-points/s over that figure.

Methodology notes for the target TPU backend:
  - ``block_until_ready`` has been observed to return before results are
    actually materializable, so the timed region ends with a scalar fetch
    (forces a real device round-trip) and asserts finiteness;
  - timing uses a fused lax.scan chunk: one execution request per chunk
    amortizes the relay's per-dispatch overhead (measured: scan 9 ms/step
    vs per-step dispatch 8.5 s/step at 512²); NIWQG_BENCH_MODE=step
    selects per-step dispatch for debugging.

Environment knobs:
  NIWQG_BENCH_NX       grid size (default 2048 — the BASELINE.md
                       north-star size; 512 is latency- not
                       compute-bound on this backend)
  NIWQG_BENCH_STEPS    timed steps (default 10)
  NIWQG_BENCH_MODE     'scan' (default) | 'step'
  NIWQG_BENCH_TIMEOUT  overall seconds before emitting a failure line
                       (default 3000)
"""

import json
import os
import signal
import sys
import time

import numpy as np


def _emit(metric, value, vs):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 1),
        "unit": "grid-point-steps/s",
        "vs_baseline": round(float(vs), 2),
    }))


def main():
    import jax

    # persistent compilation cache: measured on this backend (fresh
    # processes, scripts/probe_cache_r4.log) the cached second run
    # compiles the 10-step chunk in 6.7 s vs 37.7 s cold — the remote
    # backend's executables ARE client-cacheable. The cache dir persists
    # across driver rounds, so steady-state bench compile cost is the
    # cached figure. Disable with NIWQG_COMPILE_CACHE=0.
    cache_dir = os.environ.get(
        "NIWQG_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    if cache_dir and cache_dir != "0":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import niwqg_tpu

        niwqg_tpu.enable_compile_cache(cache_dir)

    nx = int(os.environ.get("NIWQG_BENCH_NX", "2048"))
    nsteps = int(os.environ.get("NIWQG_BENCH_STEPS", "10"))
    mode = os.environ.get("NIWQG_BENCH_MODE", "scan")
    budgets = os.environ.get("NIWQG_BENCH_BUDGETS", "1") != "0"
    timeout = int(os.environ.get("NIWQG_BENCH_TIMEOUT", "3000"))
    baseline_pts_per_s = 20.0 * 128 * 128  # reference: ~20 steps/s @ 128^2
    metric = f"coupled-step grid-points/s @ {nx}^2 ({jax.default_backend()})"

    def on_timeout(sig, frame):
        _emit(metric + " [TIMEOUT]", 0.0, 0.0)
        sys.stdout.flush()
        os._exit(2)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(timeout)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_coupled

    m = _build_coupled(nx=nx, compute_budgets=budgets)

    t0 = time.time()
    if mode == "scan":
        run = m._chunk(nsteps)
        state = run(m.state)
    else:
        _, g, consts = m._step_fns()
        jf = jax.jit(g)
        state = jf(consts, m.state)
    ke = float(np.asarray(state.Ke))
    assert np.isfinite(ke), f"non-finite Ke after warmup: {ke}"
    compile_s = time.time() - t0

    # timed steady-state run, closed by a scalar fetch
    t0 = time.time()
    if mode == "scan":
        state = run(state)
    else:
        for _ in range(nsteps):
            state = jf(consts, state)
    ke = float(np.asarray(state.Ke))
    dt_s = time.time() - t0
    assert np.isfinite(ke), f"non-finite Ke after bench: {ke}"

    steps_per_s = nsteps / dt_s
    pts_per_s = steps_per_s * nx * nx
    _emit(metric, pts_per_s, pts_per_s / baseline_pts_per_s)
    print(f"# steps/s={steps_per_s:.2f} compile_s={compile_s:.1f} "
          f"nsteps={nsteps} nx={nx} mode={mode} Ke={ke:.4e}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
