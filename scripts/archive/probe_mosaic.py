"""Mosaic feasibility probes for the fused four-step Pallas pass.

Each probe is independent (try/except) and prints PROBE <name>: OK/FAIL.
Probes:
  1. high_dot      — jnp.dot(precision=HIGH) inside a kernel: does it
                     compile, and does it deliver the multi-pass bf16
                     accuracy (~1e-5) like the XLA HIGH path?
  2. dot3d         — dot_general with a 3-D lhs inside a kernel.
  3. swapaxes      — jnp.swapaxes on a 3-D VMEM value inside a kernel.
  4. strided_read  — static strided slice of a VMEM ref (ref[:, 1::16]).
  5. loop_dots     — 16 sliced 2-D dots + VPU twiddle in one kernel
                     (the stage-1 structure of the fused pass), checked
                     against the XLA reference for the same arithmetic.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HIGH = jax.lax.Precision.HIGH
    rng = np.random.default_rng(0)

    def report(name, fn):
        try:
            msg = fn()
            print(f"PROBE {name}: OK {msg or ''}", flush=True)
        except Exception as e:
            print(f"PROBE {name}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # ---------------- probe 1: HIGH dot in kernel ----------------------
    def p_high():
        a = rng.standard_normal((256, 128)).astype(np.float32)
        b = rng.standard_normal((128, 128)).astype(np.float32)

        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:], precision=HIGH,
                               preferred_element_type=jnp.float32)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
        want = a.astype(np.float64) @ b.astype(np.float64)
        rel = np.abs(np.asarray(out) - want).max() / np.abs(want).max()
        # plain bf16-grade is ~2.5e-3; HIGH is ~1.4e-5
        return f"rel={rel:.2e} ({'HIGH honored' if rel < 1e-4 else 'bf16-grade!'})"

    # ---------------- probe 2: 3-D dot_general in kernel ---------------
    def p_dot3d():
        a = rng.standard_normal((8, 16, 128)).astype(np.float32)
        b = rng.standard_normal((128, 128)).astype(np.float32)
        dn = (((2,), (0,)), ((), ()))

        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], dn, precision=HIGH,
                preferred_element_type=jnp.float32)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 16, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
        want = np.einsum("abk,kn->abn", a.astype(np.float64),
                         b.astype(np.float64))
        rel = np.abs(np.asarray(out) - want).max() / np.abs(want).max()
        return f"rel={rel:.2e}"

    # ---------------- probe 3: swapaxes in kernel -----------------------
    def p_swap():
        a = rng.standard_normal((8, 16, 128)).astype(np.float32)

        def kern(a_ref, o_ref):
            o_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a))
        assert np.array_equal(np.asarray(out), np.swapaxes(a, 1, 2))
        return ""

    # ---------------- probe 4: strided ref read -------------------------
    def p_strided():
        a = rng.standard_normal((128, 256)).astype(np.float32)

        def kern(a_ref, o_ref):
            o_ref[:] = a_ref[:, 1::16]

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a))
        assert np.array_equal(np.asarray(out), a[:, 1::16])
        return ""

    # ---------------- probe 5: looped sliced dots + twiddle -------------
    def p_loop():
        TR, N1, N2 = 128, 128, 16
        a = rng.standard_normal((TR, N1 * N2)).astype(np.float32)
        m1 = rng.standard_normal((N1, N1)).astype(np.float32)
        tw = rng.standard_normal((N2, N1)).astype(np.float32)

        def kern(a_ref, m_ref, t_ref, o_ref):
            for x2 in range(N2):
                blk = a_ref[:, x2 * N1:(x2 + 1) * N1]
                d = jnp.dot(blk, m_ref[:], precision=HIGH,
                            preferred_element_type=jnp.float32)
                o_ref[:, x2 * N1:(x2 + 1) * N1] = d * t_ref[x2, :]

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TR, N1 * N2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(m1), jnp.asarray(tw))
        a64 = a.astype(np.float64).reshape(TR, N2, N1)
        want = np.einsum("rxk,kn->rxn", a64, m1.astype(np.float64))
        want = want * tw.astype(np.float64)[None, :, :]
        got = np.asarray(out).reshape(TR, N2, N1)
        rel = np.abs(got - want).max() / np.abs(want).max()
        return f"rel={rel:.2e}"

    report("high_dot", p_high)
    report("dot3d", p_dot3d)
    report("swapaxes", p_swap)
    report("strided_read", p_strided)
    report("loop_dots", p_loop)


if __name__ == "__main__":
    main()
