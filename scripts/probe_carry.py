"""Does lax.scan carry size drive per-iteration cost on this backend?

Same compute per iteration (one saxpy on (1,4096,4096), 150 MB traffic),
with increasing amounts of UNUSED state threaded through the scan carry.
If ms/iter grows with carry bytes, the backend copies/touches the whole
carry every iteration -> slimming the solver's scan carry is the lever.
Also: the same experiment with the dead weight passed as a closed-over
constant (not carried) as control.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PX_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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
            best = min(best, time.time() - t0)
        print(f"RESULT {label}: {best/chain*1e3:.3f} ms/iter "
              f"(region {best:.2f}s, compile {compile_s:.0f}s)", flush=True)

    x = jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))

    for ndead in (0, 2, 8):
        dead = tuple(
            jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))
            for _ in range(ndead))

        def sx(state, nd=ndead):
            def body(c, _):
                x, b = c[0], c[1]
                return (0.999 * x + 0.001 * b, b) + c[2:], None
            return lax.scan(body, state, None, length=150)[0]

        mb = (2 + ndead) * n * n * 4 / 1e6
        timed(f"carry-{ndead}dead-{mb:.0f}MB", jax.jit(sx),
              (x, b) + dead, 150)

    # control: dead weight exists on device but is NOT carried
    dead8 = [jnp.asarray(rng.standard_normal((1, n, n)).astype(np.float32))
             for _ in range(8)]
    for d in dead8:
        d.block_until_ready()

    def sx0(state):
        def body(c, _):
            x, b = c
            return (0.999 * x + 0.001 * b, b), None
        return lax.scan(body, state, None, length=150)[0]

    timed("carry-0dead-control-8resident", jax.jit(sx0), (x, b), 150)


if __name__ == "__main__":
    main()
