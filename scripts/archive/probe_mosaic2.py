"""Mosaic probe round 2: which reshapes/dots the fused pass may use.

All probes use default dot precision (HIGH is unsupported in kernels on
this backend, probe round 1).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    f32 = jnp.float32

    def report(name, fn):
        try:
            msg = fn()
            print(f"PROBE {name}: OK {msg or ''}", flush=True)
        except Exception as e:
            print(f"PROBE {name}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    def run1(kern, out_shape, *args):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    a2048 = jnp.asarray(rng.standard_normal((128, 2048)).astype(np.float32))
    a3d = jnp.asarray(rng.standard_normal((128, 16, 128)).astype(np.float32))
    m128 = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    m16 = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))

    # reshape (R, 2048) -> (R, 16, 128): minor split keeping 128 lanes
    def p_rs_split_keep128():
        def kern(a_ref, o_ref):
            o_ref[:] = a_ref[:].reshape(128, 16, 128)
        out = run1(kern, (128, 16, 128), a2048)
        assert np.array_equal(np.asarray(out),
                              np.asarray(a2048).reshape(128, 16, 128))
        return ""

    # reshape (R, 2048) -> (R, 128, 16): minor becomes 16
    def p_rs_split_minor16():
        def kern(a_ref, o_ref):
            o_ref[:] = a_ref[:].reshape(128, 128, 16)
        out = run1(kern, (128, 128, 16), a2048)
        assert np.array_equal(np.asarray(out),
                              np.asarray(a2048).reshape(128, 128, 16))
        return ""

    # leading merge (R, 16, 128) -> (R*16, 128)
    def p_rs_merge_lead():
        def kern(a_ref, o_ref):
            o_ref[:] = a_ref[:].reshape(128 * 16, 128)
        out = run1(kern, (128 * 16, 128), a3d)
        assert np.array_equal(np.asarray(out),
                              np.asarray(a3d).reshape(-1, 128))
        return ""

    # minor merge (R, 16, 128) -> (R, 2048)
    def p_rs_merge_minor():
        def kern(a_ref, o_ref):
            o_ref[:] = a_ref[:].reshape(128, 2048)
        out = run1(kern, (128, 2048), a3d)
        assert np.array_equal(np.asarray(out),
                              np.asarray(a3d).reshape(128, 2048))
        return ""

    # dot_general 3-D lhs, contract minor dim 2 (default precision)
    def p_dot3d_minor():
        dn = (((2,), (0,)), ((), ()))
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                                           preferred_element_type=f32)
        out = run1(kern, (128, 16, 128), a3d, m128)
        want = np.einsum("rxk,kn->rxn", np.asarray(a3d, np.float64),
                         np.asarray(m128, np.float64))
        rel = np.abs(np.asarray(out) - want).max() / np.abs(want).max()
        return f"rel={rel:.2e}"

    # dot_general 3-D lhs, contract sublane dim 1
    def p_dot3d_sublane():
        dn = (((1,), (0,)), ((), ()))
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                                           preferred_element_type=f32)
        out = run1(kern, (128, 128, 16), a3d, m16)
        want = np.einsum("rxk,xo->rko", np.asarray(a3d, np.float64),
                         np.asarray(m16, np.float64))
        rel = np.abs(np.asarray(out) - want).max() / np.abs(want).max()
        return f"rel={rel:.2e}"

    # static sublane index of a value: B[:, 3, :]
    def p_value_index():
        def kern(a_ref, o_ref):
            b = a_ref[:]
            o_ref[:] = b[:, 3, :]
        out = run1(kern, (128, 128), a3d)
        assert np.array_equal(np.asarray(out), np.asarray(a3d)[:, 3, :])
        return ""

    # swapaxes both directions at tile scale
    def p_swap_big():
        def kern(a_ref, o_ref):
            o_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)
        out = run1(kern, (128, 128, 16), a3d)
        assert np.array_equal(np.asarray(out), np.swapaxes(np.asarray(a3d), 1, 2))
        return ""

    report("rs_split_keep128", p_rs_split_keep128)
    report("rs_split_minor16", p_rs_split_minor16)
    report("rs_merge_lead", p_rs_merge_lead)
    report("rs_merge_minor", p_rs_merge_minor)
    report("dot3d_minor", p_dot3d_minor)
    report("dot3d_sublane", p_dot3d_sublane)
    report("value_index", p_value_index)
    report("swap_big", p_swap_big)

    # ---- speed probe: fused stage-1 (9 split-Gauss dots + twiddle) -----
    # input pre-arranged (R*n2, 128) x1-minor; compare against the XLA
    # equivalent arithmetic on the same layout.
    R, n2 = 4 * 2048, 16
    rows = R * n2 // 8  # keep it modest: 2 slices worth
    zr = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))

    def mask_split_np(m):
        m = m.astype(np.float32)
        hi = (m.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
        return hi, m - hi

    M1 = np.exp(-2j * np.pi * np.outer(np.arange(128), np.arange(128)) / 128)
    gtabs = []
    for p in (M1.real, M1.imag - M1.real, M1.imag + M1.real):
        gtabs.extend(mask_split_np(p))
    gtabs = [jnp.asarray(t) for t in gtabs]

    def split(x):
        xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(xi & jnp.uint32(0xFFFF0000), f32)
        return hi, x - hi

    def smm(a, bh, bl):
        ah, al = split(a)
        return (jnp.dot(a, bl, preferred_element_type=f32)
                + jnp.dot(al, bh, preferred_element_type=f32)
                + jnp.dot(ah, bh, preferred_element_type=f32))

    def stage1(vre, vim, ch, cl, s2h, s2l, s3h, s3l):
        t1 = smm(vre + vim, ch, cl)
        t2 = smm(vre, s2h, s2l)
        t3 = smm(vim, s3h, s3l)
        return t1 - t3, t1 + t2

    TR = 256

    def kern(zr_ref, zi_ref, ch, cl, s2h, s2l, s3h, s3l, or_ref, oi_ref):
        re, im = stage1(zr_ref[:], zi_ref[:], ch[:], cl[:], s2h[:], s2l[:],
                        s3h[:], s3l[:])
        or_ref[:] = re
        oi_ref[:] = im

    row_spec = pl.BlockSpec((TR, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def fused(zr, zi):
        return pl.pallas_call(
            kern,
            grid=(rows // TR,),
            in_specs=[row_spec, row_spec] + [tab_spec] * 6,
            out_specs=(row_spec, row_spec),
            out_shape=(jax.ShapeDtypeStruct((rows, 128), f32),) * 2,
            cost_estimate=pl.CostEstimate(
                flops=18 * rows * 128 * 128 * 2,
                bytes_accessed=4 * rows * 128 * 4, transcendentals=0),
        )(zr, zi, *gtabs)

    @jax.jit
    def xla_equiv(zr, zi):
        return stage1(zr, zi, *gtabs)

    from jax import lax

    def chain(fn):
        def run(state):
            def body(c, _):
                return fn(c[0], c[1]), None
            return lax.scan(body, state, None, length=50)[0]
        return jax.jit(run)

    def timed(label, fn, state):
        t0 = time.time()
        out = fn(state)
        s0 = float(np.asarray(out[0]).ravel()[0])
        compile_s = time.time() - t0
        assert np.isfinite(s0)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = fn(out)
            float(np.asarray(out[0]).ravel()[0])
            best = min(best, time.time() - t0)
        print(f"SPEED {label}: {best / 50 * 1e3:.3f} ms/call "
              f"(compile {compile_s:.0f}s)", flush=True)

    try:
        r0, i0 = jax.jit(fused)(zr, zi)
        w0, wi0 = jax.jit(xla_equiv)(zr, zi)
        rel = max(np.abs(np.asarray(r0) - np.asarray(w0)).max(),
                  np.abs(np.asarray(i0) - np.asarray(wi0)).max())
        print(f"STAGE1 fused-vs-xla maxdiff: {rel:.2e}", flush=True)
        timed("xla-stage1", chain(xla_equiv), (zr, zi))
        timed("fused-stage1", chain(fused), (zr, zi))
    except Exception as e:
        print(f"STAGE1 probe FAIL: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
