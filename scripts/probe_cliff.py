"""Isolate the 4096 even/odd real-transform collapse (roofline follow-up).

roofline_r3b facts: at 2048 the real roundtrip costs 0.67x the complex one
(23.8 vs 35.4 ms, batch 3) — the designed even/odd saving; at 4096 it costs
1.4x (551 vs 381 ms). Also pure elementwise/transpose bandwidth collapses
~5x from 2048-sized to 4096-sized buffers. This probe times the even/odd
path's constituent ops at 4096 and the buffer-size/shape dependence of the
elementwise collapse.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PC_REPS", "3"))
ONLY = os.environ.get("PC_ONLY", "")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from niwqg_tpu.carray import C
    from niwqg_tpu.ops.fft import MXUTransform

    rng = np.random.default_rng(0)
    B = 3
    n = 4096
    nh = n // 2

    def wanted(label):
        if not ONLY:
            return True
        return any(label.startswith(p) for p in ONLY.split(","))

    def timed(label, fn, state, chain):
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
        print(f"RESULT {label}: {best/chain*1e3:.3f} ms/iter "
              f"(region {best:.2f}s, compile {compile_s:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # A. buffer-size vs shape: saxpy over equal-bytes, different shapes
    # ------------------------------------------------------------------
    for shape, chain in (((1, 4096, 4096), 200), ((2, 4096, 4096), 150),
                         ((16, 2048, 2048), 100), ((64, 1024, 1024), 100),
                         ((1, 2048, 2048), 400)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        def sx(state, chain=chain):
            def body(c, _):
                x, b = c
                return (0.999 * x + 0.001 * b, b), None
            return lax.scan(body, state, None, length=chain)[0]

        gb = 3 * np.prod(shape) * 4 / 1e9
        label = f"saxpy-{'x'.join(map(str, shape))}"
        t0 = time.time()
        timed(label, jax.jit(sx), (x, b), chain)
        print(f"#   ({gb*1000:.0f} MB traffic/iter)", flush=True)

    # ------------------------------------------------------------------
    # B. even/odd path pieces at 4096 (batch 3), chained with a cheap
    #    renormalization so buffers stay live
    # ------------------------------------------------------------------
    tr = MXUTransform(n, np.float32)
    x0 = jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32))
    zc0 = C(jnp.asarray(rng.standard_normal((B, n, nh)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((B, n, nh)).astype(np.float32)))
    zk0 = C(jnp.asarray(rng.standard_normal((B, n, n // 2 + 1))
                        .astype(np.float32)),
            jnp.asarray(rng.standard_normal((B, n, n // 2 + 1))
                        .astype(np.float32)))

    def chainer(body, chain):
        def fn(state):
            def b(c, _):
                return body(c), None
            return lax.scan(b, state, None, length=chain)[0]
        return jax.jit(fn)

    # B1: strided even/odd pack: real (B,n,n) -> C(B,n,nh) -> re-interleave
    def pack_unpack(xx):
        u = C(xx[..., 0::2], xx[..., 1::2])
        lead = u.re.shape[:-1]
        return jnp.stack([u.re * 0.9999, u.im], axis=-1).reshape(
            lead + (n,))

    timed("eo-pack-unpack-4096", chainer(pack_unpack, 30), x0, 30)

    # B2: half-length complex 1-D DFT pass (x axis), (B,n,nh) — chained as
    # fwd+inv roundtrips so magnitudes stay O(1); halve the reported
    # ms/iter for the single-pass cost
    def half_dft(z):
        return tr._cdft_half(tr._cdft_half(z, inverse=False),
                             inverse=True) * 0.9999

    timed("eo-halfdft-xrt-4096", chainer(half_dft, 30), zc0, 30)

    # B3: reflect/butterfly (elementwise + flip/roll + concat)
    from niwqg_tpu.carray import jmul

    def butterfly(z):
        Ur = tr._reflect_conj_1d(z)
        E = (z + Ur) * 0.5
        O = jmul(z - Ur, -0.5)
        Xm = E + O * tr._w_f
        ny_re = z.re[..., :1] - z.im[..., :1]
        out = C(jnp.concatenate([Xm.re, ny_re], axis=-1),
                jnp.concatenate([Xm.im, jnp.zeros_like(ny_re)], axis=-1))
        # back to (B,n,nh) so the chain carries a fixed shape
        return C(out.re[..., :nh] * 0.9999, out.im[..., :nh])

    timed("eo-butterfly-4096", chainer(butterfly, 30), zc0, 30)

    # B4: y-pass complex DFT roundtrip on the half-spectrum column count
    # (nk=2049); halve ms/iter for the single-pass cost
    def ypass_nk(z):
        a = tr._cdft.along(z, inverse=False, axis=-2)
        return tr._cdft.along(a, inverse=True, axis=-2) * 0.9999

    timed("ypass-rt-nk2049-4096", chainer(ypass_nk, 15), zk0, 15)

    # B5: same y-pass roundtrip on an even 2048-column block
    zk2 = C(zk0.re[..., :nh], zk0.im[..., :nh])
    timed("ypass-rt-nk2048-4096", chainer(ypass_nk, 15), zk2, 15)

    # B6: full-width y-pass roundtrip (the complex fft2's second pass)
    zkf = C(jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32)))
    timed("ypass-rt-nk4096-4096", chainer(ypass_nk, 15), zkf, 15)

    # B7: x-pass roundtrip on full width
    def xpass(z):
        a = tr._cdft.along(z, inverse=False, axis=-1)
        return tr._cdft.along(a, inverse=True, axis=-1) * 0.9999

    timed("xpass-rt-4096", chainer(xpass, 15), zkf, 15)

    # B8: real roundtrip with evenodd OFF but four-step half tables off too
    #     (dedicated dense rfft matrices) — is dense-real faster here?
    tr_d = MXUTransform(n, np.float32, evenodd=False)

    def rt_dense_real(xx):
        return tr_d.irfft2(tr_d.rfft2(xx)) * 0.9999

    timed("rt-r-4096-dense-real", chainer(rt_dense_real, 5), x0, 5)

    # B9: real roundtrip via the full complex path (zero imag plane)
    def rt_complex_real(xx):
        zh = tr.fft2(C(xx, jnp.zeros_like(xx)))
        return tr.ifft2(zh).re * 0.9999

    timed("rt-r-4096-via-complex", chainer(rt_complex_real, 10), x0, 10)

    # B10: current even/odd real roundtrip (control, matches roofline_r3b)
    def rt_real(xx):
        return tr.irfft2(tr.rfft2(xx)) * 0.9999

    timed("rt-r-4096-evenodd", chainer(rt_real, 10), x0, 10)


if __name__ == "__main__":
    main()
