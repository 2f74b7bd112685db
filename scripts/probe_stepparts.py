"""Per-group cost decomposition of the fast coupled step at 4096^2 f32.

Times, in one process, chained invocations of:
  - derive(qh, phih): inversion + derived physical fields (the group run
    4x per step + once per chunk boundary);
  - stage_terms(...): the RHS nonlinear transforms + spectral budget
    sources (4x per step);
  - the full step (control).

Chains carry the model state; each region is closed by a scalar fetch.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX = int(os.environ.get("SP_NX", "4096"))
REPS = int(os.environ.get("SP_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _build_coupled
    from niwqg_tpu.utils.hoist import hoist

    m = _build_coupled(nx=NX)
    K = m.kernel
    s = m.state

    def timed(label, fn, state, chain):
        t0 = time.time()
        out = fn(state)
        s0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        compile_s = time.time() - t0
        assert np.isfinite(s0), label
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            out = fn(out)
            s0 = float(np.asarray(
                jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            best = min(best, time.time() - t0)
        print(f"RESULT {label}: {best/chain*1e3:.1f} ms/iter "
              f"(compile {compile_s:.0f}s)", flush=True)

    # hoist the kernel's closed-over tables out of every probed function
    # (left inline they overflow the remote-compile transport, HTTP 413)
    def run_hoisted(label, fn, example):
        g, consts = hoist(fn, example)
        jg = jax.jit(g)
        timed(label, lambda st: jg(consts, st), example, 10)

    # A. derive chain: feed D's phi back through a forward transform to
    #    keep a data dependence without changing shapes
    def derive_chain(state):
        def body(c, _):
            qh_, phih_, D_ = c
            D2 = K.derive(qh_, phih_, D_)
            phih2 = phih_ * 0.9999 + K.tr.fft2(D2.phi) * 1e-6
            return (qh_, phih2, D2), None
        return lax.scan(body, state, None, length=10)[0]

    run_hoisted("derive+fft2", derive_chain, (s.qh, s.phih, s.d))

    # B. stage_terms chain (nonlinear + spectral budget sources)
    def stage_chain(state):
        def body(c, _):
            qh_, phih_, D_ = c
            Fn, Fnw, src = K.stage_terms(qh_, phih_, D_, True)
            qh2 = qh_ * 0.9999 + Fn * 1e-6
            phih2 = phih_ * 0.9999 + Fnw * 1e-6
            return (qh2, phih2, D_), None
        return lax.scan(body, state, None, length=10)[0]

    run_hoisted("stage_terms", stage_chain, (s.qh, s.phih, s.d))

    # C. full step control
    def step_chain(state):
        def body(c, _):
            return K.step(c), None
        return lax.scan(body, state, None, length=10)[0]

    run_hoisted("full-step", step_chain, s)


if __name__ == "__main__":
    main()
