"""Working-set probe: what drives the large-buffer bandwidth collapse?

cliff_r3 facts (chained saxpy, 3 planes of traffic/iter):
    50 MB -> 49 GB/s, 201 MB -> 22.5, 403 MB -> 16.4, 805 MB -> 8.3 GB/s
    (shape-independent at equal bytes).

Three discriminating experiments:
  A. resident-footprint: saxpy on (1,4096,4096) with a 0 / 1 / 2 GB dummy
     buffer held resident. If BW drops with the dummy, the device pages by
     TOTAL resident set -> shrink the scan carry.
  B. op-chunking: the same 805 MB saxpy done monolithically vs as 4
     sequential 201 MB chunks (fori_loop over slices, and unrolled). If
     chunking recovers BW, the cost is per-op traffic -> chunk big
     transforms instead of batching them.
  C. transform batching: batch-3 complex 4096 roundtrip vs 3 sequential
     batch-1 roundtrips (the step's actual choice at 4096).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PM_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from niwqg_tpu.carray import C
    from niwqg_tpu.ops.fft import MXUTransform

    rng = np.random.default_rng(0)
    n = 4096

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
            s0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            dt = time.time() - t0
            assert np.isfinite(s0), label
            best = min(best, dt)
        print(f"RESULT {label}: {best/chain*1e3:.3f} ms/iter "
              f"(region {best:.2f}s, compile {compile_s:.0f}s)", flush=True)
        return best / chain

    # ------------------------------------------------------------------
    # A. resident-footprint sensitivity
    # ------------------------------------------------------------------
    x1 = jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))

    def sx(state):
        def body(c, _):
            x, b = c
            return (0.999 * x + 0.001 * b, b), None
        return lax.scan(body, state, None, length=200)[0]

    sxj = jax.jit(sx)
    for gb in (0.0, 1.0, 2.0):
        dummies = []
        if gb:
            nbuf = int(gb * 1e9 / (n * n * 4))
            for i in range(nbuf):
                dummies.append(jax.device_put(
                    np.full((n, n), float(i), np.float32)))
                dummies[-1].block_until_ready()
        t = timed(f"A-saxpy-201MB-resident{gb:.0f}GB", sxj, (x1, b1), 200)
        # keep dummies alive through the measurement, then free
        del dummies

    # ------------------------------------------------------------------
    # B. monolithic vs chunked 805 MB saxpy
    # ------------------------------------------------------------------
    x4 = jnp.asarray(rng.standard_normal((4, n, n)).astype(np.float32))
    b4 = jnp.asarray(rng.standard_normal((4, n, n)).astype(np.float32))

    def mono(state):
        def body(c, _):
            x, b = c
            return (0.999 * x + 0.001 * b, b), None
        return lax.scan(body, state, None, length=60)[0]

    timed("B-saxpy-805MB-monolithic", jax.jit(mono), (x4, b4), 60)

    def chunked(state):
        def body(c, _):
            x, b = c
            outs = [0.999 * x[i] + 0.001 * b[i] for i in range(4)]
            return (jnp.stack(outs), b), None
        return lax.scan(body, state, None, length=60)[0]

    timed("B-saxpy-805MB-unrolled4", jax.jit(chunked), (x4, b4), 60)

    # ------------------------------------------------------------------
    # C. batch-3 transform vs 3 x batch-1 at 4096
    # ------------------------------------------------------------------
    tr = MXUTransform(n, np.float32)
    z3 = C(jnp.asarray(rng.standard_normal((3, n, n)).astype(np.float32)),
           jnp.asarray(rng.standard_normal((3, n, n)).astype(np.float32)))

    def rt_b3(z):
        return tr.ifft2(tr.fft2(z)) * 0.9999

    def chainer(body, chain):
        def fn(state):
            def b(c, _):
                return body(c), None
            return lax.scan(b, state, None, length=chain)[0]
        return jax.jit(fn)

    timed("C-rt-c-4096-batch3", chainer(rt_b3, 15), z3, 15)

    def rt_3x1(z):
        outs = []
        for i in range(3):
            zi = C(z.re[i:i + 1], z.im[i:i + 1])
            outs.append(tr.ifft2(tr.fft2(zi)))
        return C(jnp.concatenate([o.re for o in outs]),
                 jnp.concatenate([o.im for o in outs])) * 0.9999

    timed("C-rt-c-4096-3xbatch1", chainer(rt_3x1, 15), z3, 15)

    # real-transform batching comparison (the step's dominant call type)
    x3 = jnp.asarray(rng.standard_normal((3, n, n)).astype(np.float32))

    def rrt_b3(x):
        return tr.irfft2(tr.rfft2(x)) * 0.9999

    timed("C-rt-r-4096-batch3", chainer(rrt_b3, 10), x3, 10)

    def rrt_3x1(x):
        return jnp.concatenate(
            [tr.irfft2(tr.rfft2(x[i:i + 1])) for i in range(3)]) * 0.9999

    timed("C-rt-r-4096-3xbatch1", chainer(rrt_3x1, 10), x3, 10)


if __name__ == "__main__":
    main()
