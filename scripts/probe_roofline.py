"""Roofline probe for the 4096^2 throughput cliff (VERDICT r2 tasks 1+4).

Measures, in ONE warm process on the live backend (compile-cost anatomy,
PERFORMANCE.md):

  0. null dispatch+fetch overhead of the relay (subtracted from rates);
  1. effective HBM bandwidth: chained saxpy over (B, n, n) f32;
  2. materialized (n,n) transpose bandwidth;
  3. achieved matmul rate at the EXACT dot shapes the 4096 four-step
     issues (stage-1 K=128, stage-2 K=32), plain vs Precision.HIGH;
  4. complex fft2+ifft2 roundtrips (batch 3, the step's batch) at
     2048/4096 under factor variants;
  5. rfft2/irfft2 roundtrips (batch 3);
  6. the full coupled step at 2048/4096 (control, current default).

Relay gotchas honored: no multi-MB closure constants (they ship inside the
remote-compile request body — HTTP 413 past ~100 MB), every timed region is
a lax.scan chain closed by a scalar fetch, chains long enough that the
~1 s dispatch+fetch latency is <10% of the region.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PR_REPS", "3"))
ONLY = os.environ.get("PR_ONLY", "")  # comma-separated label prefixes


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from niwqg_tpu.carray import C
    from niwqg_tpu.ops.fft import MXUTransform

    f32 = jnp.float32
    rng = np.random.default_rng(0)
    results = {}
    overhead = [0.0]

    def wanted(label):
        if not ONLY:
            return True
        return any(label.startswith(p) for p in ONLY.split(","))

    def timed(label, fn, state, chain, work_per_iter, unit):
        if not wanted(label):
            return
        t0 = time.time()
        out = fn(state)
        s0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        compile_s = time.time() - t0
        assert np.isfinite(s0), label
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            out = fn(out)
            s0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            dt = time.time() - t0
            assert np.isfinite(s0), label
            best = min(best, dt)
        per_iter = max(best - overhead[0], 1e-9) / chain
        rate = work_per_iter / per_iter / 1e9
        results[label] = (per_iter * 1e3, rate)
        print(f"RESULT {label}: {per_iter*1e3:.3f} ms/iter "
              f"{rate:.1f} G{unit}/s (chain {chain}, region {best:.2f}s, "
              f"compile {compile_s:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # 0. null dispatch+fetch overhead
    # ------------------------------------------------------------------
    @jax.jit
    def null_fn(x):
        return x + 1.0

    x0 = jnp.zeros(())
    x0 = null_fn(x0)
    float(np.asarray(x0))
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        x0 = null_fn(x0)
        float(np.asarray(x0))
        best = min(best, time.time() - t0)
    overhead[0] = best
    print(f"RESULT null-overhead: {best*1e3:.1f} ms/dispatch+fetch",
          flush=True)

    # ------------------------------------------------------------------
    # 1. elementwise saxpy: effective HBM bandwidth (b passed via carry)
    # ------------------------------------------------------------------
    for n, chain in ((2048, 400), (4096, 100)):
        B = 4
        x = jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32))

        def saxpy_chain(state, chain=chain):
            def body(c, _):
                x, b = c
                return (0.999 * x + 0.001 * b, b), None
            return lax.scan(body, state, None, length=chain)[0]

        nbytes = 3 * B * n * n * 4  # read x, read b, write out
        timed(f"saxpy-{n}", jax.jit(saxpy_chain), (x, b), chain, nbytes, "B")

    # ------------------------------------------------------------------
    # 2. materialized transpose
    # ------------------------------------------------------------------
    for n, chain in ((2048, 400), (4096, 100)):
        B = 4
        x = jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32))

        def tr_chain(state, chain=chain):
            def body(c, _):
                return jnp.swapaxes(c, -1, -2) * 0.9999 + 1e-7, None
            return lax.scan(body, state, None, length=chain)[0]

        nbytes = 2 * B * n * n * 4
        timed(f"transpose-{n}", jax.jit(tr_chain), x, chain, nbytes, "B")

    # ------------------------------------------------------------------
    # 3. dot shapes of the 4096 four-step (x-pass):
    #    stage1: (B,n,n1,n2) contract dim -2 (K=n1) with (n1,n1)
    #    stage2: (B,n,n2,n1) contract dim -2 (K=n2) with (n2,n2)
    # ------------------------------------------------------------------
    HIGH = lax.Precision.HIGH
    B = 3

    def stage_dot(shape, cdim, K, prec, label, chain):
        if not wanted(label):
            return
        # orthogonal table: chained applications stay O(1) in norm
        Mq, _ = np.linalg.qr(rng.standard_normal((K, K)))
        M = jnp.asarray(Mq.astype(np.float32))
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        dn = (((cdim % len(shape),), (0,)), ((), ()))

        def chain_fn(state, chain=chain):
            def body(c, _):
                o = lax.dot_general(c, M, dn, precision=prec,
                                    preferred_element_type=f32)
                return jnp.moveaxis(o, -1, cdim), None
            return lax.scan(body, state, None, length=chain)[0]

        flops = 2 * int(np.prod(shape)) * K
        timed(label, jax.jit(chain_fn), x, chain, flops, "FLOP")

    for n, n1 in ((2048, 128), (4096, 128)):
        n2 = n // n1
        ch = 200 if n == 2048 else 60
        stage_dot((B, n, n1, n2), -2, n1, None, f"dot-s1-{n}-K{n1}-plain", ch)
        stage_dot((B, n, n1, n2), -2, n1, HIGH, f"dot-s1-{n}-K{n1}-high", ch)
        stage_dot((B, n, n2, n1), -2, n2, None, f"dot-s2-{n}-K{n2}-plain", ch)
        stage_dot((B, n, n2, n1), -2, n2, HIGH, f"dot-s2-{n}-K{n2}-high", ch)
    stage_dot((B, 4096, 64, 64), -2, 64, HIGH, "dot-s-4096-K64-high", 60)
    stage_dot((B * 4096 * 32, 128), -1, 128, HIGH, "dot-flat-K128-high", 60)

    # ------------------------------------------------------------------
    # 4+5. transform roundtrips under factor variants
    # ------------------------------------------------------------------
    def rt_complex(tr, label, n, chain):
        if not wanted(label):
            return
        x = C(jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32)),
              jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32)))

        def chain_fn(state, chain=chain):
            def body(c, _):
                zh = tr.fft2(c)
                z = tr.ifft2(zh)
                return z * 0.9999, None
            return lax.scan(body, state, None, length=chain)[0]

        if tr.factors:
            n1, n2 = tr.factors
            flops = 4 * 3 * 2 * B * n * n * (n1 + n2)
        else:
            flops = 4 * 3 * 2 * B * n * n * n
        timed(label, jax.jit(chain_fn), x, chain, flops, "FLOP")

    def rt_real(tr, label, n, chain):
        if not wanted(label):
            return
        x = jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32))

        def chain_fn(state, chain=chain):
            def body(c, _):
                zh = tr.rfft2(c)
                z = tr.irfft2(zh)
                return z * 0.9999, None
            return lax.scan(body, state, None, length=chain)[0]

        timed(label, jax.jit(chain_fn), x, chain, 1, "FLOP")

    for n, ch in ((2048, 60), (4096, 15)):
        tr = MXUTransform(n, np.float32)
        rt_complex(tr, f"rt-c-{n}-default{tr.factors}", n, ch)
        rt_real(tr, f"rt-r-{n}-default", n, ch)
    for facs in ((64, 64), (256, 16), (512, 8), (32, 128)):
        tr = MXUTransform(4096, np.float32, factors=facs)
        rt_complex(tr, f"rt-c-4096-f{facs}", 4096, 15)

    # ------------------------------------------------------------------
    # 6. full coupled step control
    # ------------------------------------------------------------------
    from __graft_entry__ import _build_coupled
    for n, chain in ((2048, 40), (4096, 15)):
        if not wanted(f"step-{n}"):
            continue
        m = _build_coupled(nx=n)
        run = m._chunk(chain)
        t0 = time.time()
        st = run(m.state)
        ke = float(np.asarray(st.Ke))
        print(f"# step-{n} compile {time.time()-t0:.0f}s Ke={ke:.3e}",
              flush=True)
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            st = run(st)
            ke = float(np.asarray(st.Ke))
            assert np.isfinite(ke)
            best = min(best, time.time() - t0)
        sps = chain / max(best - overhead[0], 1e-9)
        print(f"RESULT step-{n}: {1e3/sps:.1f} ms/step "
              f"{sps:.2f} steps/s {sps*n*n/1e6:.1f} Mpts/s", flush=True)

    print("SUMMARY", {k: (round(v[0], 3), round(v[1], 1))
                      for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
