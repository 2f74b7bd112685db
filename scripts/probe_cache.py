"""Persistent-compilation-cache probe for the remote TPU backend
(VERDICT r3 item 2).

Protocol: run this script twice in FRESH processes with the same args.
Pass 1 populates ``.jax_cache/`` (if the backend's compile path is
cacheable client-side); pass 2 measures the warm-start compile time.
Prints one RESULT line per pass; compare compile_s across passes and the
cache-dir entry count to decide whether ``bench.py``/``run()`` should
enable the cache by default.

  python scripts/probe_cache.py            # pass 1 (cold or cache-hit)
  python scripts/probe_cache.py            # pass 2 (cache-hit if usable)

Env: NIWQG_CACHE_NX (default 1024), NIWQG_CACHE_DIR, NIWQG_CACHE_OFF=1
to disable the cache config (control runs).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.environ.get("NIWQG_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))


def main():
    import jax

    use_cache = os.environ.get("NIWQG_CACHE_OFF", "0") == "0"
    if use_cache:
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    nx = int(os.environ.get("NIWQG_CACHE_NX", "1024"))
    from __graft_entry__ import _build_coupled

    n_before = len(os.listdir(CACHE_DIR)) if (use_cache and
                                              os.path.isdir(CACHE_DIR)) else 0
    t0 = time.time()
    m = _build_coupled(nx=nx)
    build_s = time.time() - t0

    t0 = time.time()
    run = m._chunk(10)
    state = run(m.state)
    ke = float(np.asarray(state.Ke))
    compile_s = time.time() - t0
    assert np.isfinite(ke), ke

    t0 = time.time()
    state = run(state)
    ke = float(np.asarray(state.Ke))
    steady_s = time.time() - t0

    n_after = len(os.listdir(CACHE_DIR)) if (use_cache and
                                             os.path.isdir(CACHE_DIR)) else 0
    print(f"RESULT nx={nx} cache={int(use_cache)} build_s={build_s:.1f} "
          f"compile_s={compile_s:.1f} steady10_s={steady_s:.2f} "
          f"cache_entries {n_before}->{n_after} Ke={ke:.6e}", flush=True)


if __name__ == "__main__":
    main()
