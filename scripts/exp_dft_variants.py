"""Four-step DFT formulation experiment (transform-internals lever).

Compares, in one process on the live backend, 2048-point 2-D complex
roundtrips (batch 4):

  A. control — the current MXUTransform ('high' + Gauss four-step with
     explicit swapaxes around each 1-D pass)
  B. chain — same arithmetic expressed as dot_general contractions over
     interior dims (results appended minor-most), with ONE
     transpose+reshape at each pass boundary to restore canonical index
     order
  C. permuted — the roundtrip on a resident *permuted* layout: forward
     chain ends at the four-step-natural spectral layout
     (k1x,k2x,k1y,k2y), a diagonal table multiply stands in for the
     solver's spectral algebra, and the inverse chain ends at the
     permuted physical layout (y2,y1,x2,x1). Zero index transposes
     anywhere — measures the ceiling of a layout-permuted solver, since
     every spectral/physical op in the model is pointwise.

Timing: lax.scan-chained roundtrips closed by a scalar fetch (the only
trustworthy protocol on this relay backend — see PERFORMANCE.md).
Accuracy: relative error vs host numpy (shipped as expected arrays).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX = int(os.environ.get("EXP_NX", "2048"))
BATCH = int(os.environ.get("EXP_BATCH", "4"))
REPS = int(os.environ.get("EXP_REPS", "3"))
CHAIN = int(os.environ.get("EXP_CHAIN", "50"))
N1 = int(os.environ.get("EXP_N1", "128"))
ONLY = os.environ.get("EXP_ONLY", "")  # comma-separated variant letters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from niwqg_tpu.carray import C
    from niwqg_tpu.ops.fft import MXUTransform

    n, n1 = NX, N1
    n2 = n // n1
    f32 = jnp.float32
    HIGH = lax.Precision.HIGH

    # ------------------------------------------------------------------
    # tables
    # ------------------------------------------------------------------
    def dft_mat(m, inverse, scale=1.0):
        idx = np.arange(m)
        return np.exp((1j if inverse else -1j) * 2.0 * np.pi
                      * np.outer(idx, idx) / m) * scale

    def gauss(Mc):
        """(c, s2, s3) Gauss-trick real tables for a complex matrix."""
        return (jnp.asarray(Mc.real.astype(np.float32)),
                jnp.asarray((Mc.imag - Mc.real).astype(np.float32)),
                jnp.asarray((Mc.imag + Mc.real).astype(np.float32)))

    k1 = np.arange(n1)
    x2 = np.arange(n2)
    Tf_np = np.exp(-2j * np.pi * np.outer(x2, k1) / n)   # T[x2, k1]
    M1f = gauss(dft_mat(n1, False))
    M2f = gauss(dft_mat(n2, False))
    M1i = gauss(dft_mat(n1, True))
    M2i = gauss(dft_mat(n2, True, 1.0 / n))  # 1/n folded per 1-D pass
    Tf = (jnp.asarray(Tf_np.real.astype(np.float32)),
          jnp.asarray(Tf_np.imag.astype(np.float32)))
    Ti = (Tf[0], -Tf[1])

    def gdot(zre, zim, tab, dim):
        """Gauss 3-matmul complex product contracting ``dim`` of z with
        dim 0 of the (K, K) table; result dim appended minor-most."""
        dn = (((dim,), (0,)), ((), ()))
        t1 = lax.dot_general(zre + zim, tab[0], dn, precision=HIGH,
                             preferred_element_type=f32)
        t2 = lax.dot_general(zre, tab[1], dn, precision=HIGH,
                             preferred_element_type=f32)
        t3 = lax.dot_general(zim, tab[2], dn, precision=HIGH,
                             preferred_element_type=f32)
        return t1 - t3, t1 + t2

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    # ------------------------------------------------------------------
    # variant B: canonical-boundary chain
    # ------------------------------------------------------------------
    def pass_last_B(zre, zim, M1, M2, T):
        """1-D four-step along the last axis, canonical in/out."""
        lead = zre.shape[:-1]
        zre = zre.reshape(lead + (n1, n2))
        zim = zim.reshape(lead + (n1, n2))
        d = zre.ndim - 2
        # contract x1 -> (..., x2, k1)
        ar, ai = gdot(zre, zim, M1, d)
        ar, ai = cmul(ar, ai, T[0], T[1])
        # contract x2 -> (..., k1, k2)
        br, bi = gdot(ar, ai, M2, d)
        # canonical k = k2*n1 + k1: one transpose+reshape per pass
        br = jnp.swapaxes(br, -1, -2).reshape(lead + (n,))
        bi = jnp.swapaxes(bi, -1, -2).reshape(lead + (n,))
        return br, bi

    def fft2_B(zre, zim, M1, M2, T):
        zre, zim = pass_last_B(zre, zim, M1, M2, T)          # x
        zre, zim = jnp.swapaxes(zre, -1, -2), jnp.swapaxes(zim, -1, -2)
        zre, zim = pass_last_B(zre, zim, M1, M2, T)          # y
        return jnp.swapaxes(zre, -1, -2), jnp.swapaxes(zim, -1, -2)

    # ------------------------------------------------------------------
    # variant C: fully permuted resident layouts
    #   physical P: (B, y2, y1, x2, x1)   spectral S: (B, k1x, k2x, k1y, k2y)
    # ------------------------------------------------------------------
    def fwd_C(zre, zim):
        # x stage 1: contract x1 (dim 4) -> (B, y2, y1, x2, k1x)
        ar, ai = gdot(zre, zim, M1f, 4)
        ar, ai = cmul(ar, ai, Tf[0], Tf[1])                  # (x2, k1x)
        # x stage 2: contract x2 (dim 3) -> (B, y2, y1, k1x, k2x)
        ar, ai = gdot(ar, ai, M2f, 3)
        # y stage 1: contract y1 (dim 2) -> (B, y2, k1x, k2x, k1y)
        ar, ai = gdot(ar, ai, M1f, 2)
        tw_r = Tf[0][:, None, None, :]                       # (y2,1,1,k1y)
        tw_i = Tf[1][:, None, None, :]
        ar, ai = cmul(ar, ai, tw_r, tw_i)
        # y stage 2: contract y2 (dim 1) -> (B, k1x, k2x, k1y, k2y)
        return gdot(ar, ai, M2f, 1)

    def inv_C(zre, zim):
        # y inverse: contract k2y (dim 4) -> (B, k1x, k2x, k1y, y2)
        ar, ai = gdot(zre, zim, M2i, 4)
        twr = Ti[0].T[:, None]                               # (k1y, 1) x (y2)
        # conj(T)[y2, k1y] indexed as (k1y, y2) on the trailing dims
        ar, ai = cmul(ar, ai, Ti[0].T, Ti[1].T)
        # contract k1y (dim 3) -> (B, k1x, k2x, y2, y1)
        ar, ai = gdot(ar, ai, M1i, 3)
        # x inverse: contract k2x (dim 2) -> (B, k1x, y2, y1, x2)
        ar, ai = gdot(ar, ai, M2i, 2)
        twr2 = Ti[0].T[:, None, None, :]                     # (k1x,1,1,x2)
        twi2 = Ti[1].T[:, None, None, :]
        ar, ai = cmul(ar, ai, twr2, twi2)
        # contract k1x (dim 1) -> (B, y2, y1, x2, x1)
        return gdot(ar, ai, M1i, 1)

    def to_P(x):
        """canonical (B, y, x) -> permuted physical (B, y2, y1, x2, x1)."""
        b = x.shape[0]
        return x.reshape(b, n1, n2, n1, n2).transpose(0, 2, 1, 4, 3)

    def from_P(x):
        b = x.shape[0]
        return x.transpose(0, 2, 1, 4, 3).reshape(b, n, n)

    # ------------------------------------------------------------------
    # inputs + host reference
    # ------------------------------------------------------------------
    rng = np.random.default_rng(0)
    zr_np = rng.standard_normal((BATCH, n, n)).astype(np.float32)
    zi_np = rng.standard_normal((BATCH, n, n)).astype(np.float32)
    ref = np.fft.fft2(zr_np.astype(np.float64)
                      + 1j * zi_np.astype(np.float64))
    zr = jnp.asarray(zr_np)
    zi = jnp.asarray(zi_np)

    def relerr(got_r, got_i, want):
        g = np.asarray(got_r).astype(np.float64) + 1j * np.asarray(got_i)
        return float(np.abs(g - want).max() / np.abs(want).max())

    # diagonal table standing in for the solver's spectral algebra
    diag_np = rng.standard_normal((n, n)).astype(np.float32) * 0.1

    results = {}

    def timed(label, fn, state):
        # warmup/compile
        t0 = time.time()
        out = fn(state)
        s0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        compile_s = time.time() - t0
        assert np.isfinite(s0)
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            out = fn(out)
            s0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            dt = time.time() - t0
            assert np.isfinite(s0), label
            best = min(best, dt)
        ms = best / CHAIN / BATCH * 1e3
        results[label] = ms
        print(f"RESULT {label}: {ms:.3f} ms/slice  (compile {compile_s:.0f}s)",
              flush=True)

    def wanted(v):
        return not ONLY or v in ONLY.split(",")

    # ---- A: control ---------------------------------------------------
    tr = MXUTransform(n, np.float32)  # default: 'high' + gauss + four-step
    diag = jnp.asarray(diag_np)

    # NOTE: the diagonal tables ride the scan carry, not the closure — a
    # closed-over (n,n) constant is serialized into the remote-compile
    # request and crashes/overflows it at 4096 (observed).
    def rt_A(state):
        def body(c, _):
            zr_, zi_, d = c
            zh = tr.fft2(C(zr_, zi_))
            zh = C(zh.re * d, zh.im * d)
            z = tr.ifft2(zh)
            return (z.re, z.im, d), None
        return lax.scan(body, state, None, length=CHAIN)[0]

    if wanted("A"):
        zh0 = tr.fft2(C(zr, zi))
        print(f"accuracy A: {relerr(zh0.re, zh0.im, ref):.2e}", flush=True)
        timed("A-control", jax.jit(rt_A), (zr, zi, diag))

    # ---- B: canonical-boundary chain ----------------------------------
    def rt_B(state):
        def body(c, _):
            hr, hi = fft2_B(c[0], c[1], M1f, M2f, Tf)
            hr, hi = hr * c[2], hi * c[2]
            gr, gi = fft2_B(hr, hi, M1i, M2i, Ti)
            return (gr, gi, c[2]), None
        return lax.scan(body, state, None, length=CHAIN)[0]

    if wanted("B"):
        hr, hi = fft2_B(zr, zi, M1f, M2f, Tf)
        print(f"accuracy B: {relerr(hr, hi, ref):.2e}", flush=True)
        timed("B-chain", jax.jit(rt_B), (zr, zi, diag))

    # ---- C: fully permuted layout -------------------------------------
    # permute the diagonal table into S layout once (host-side relabeling)
    diag_S = jnp.asarray(
        diag_np.reshape(n1, n2, n1, n2)      # (k1y? ... careful below)
    )
    # canonical spectral index (ky, kx) with ky = k2y*n1 + k1y etc.
    # S layout is (k1x, k2x, k1y, k2y): build by explicit indexing
    KY, KX = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d_full = diag_np  # indexed [ky, kx]
    k1x_ = np.arange(n1)[:, None, None, None]
    k2x_ = np.arange(n2)[None, :, None, None]
    k1y_ = np.arange(n1)[None, None, :, None]
    k2y_ = np.arange(n2)[None, None, None, :]
    diag_S = jnp.asarray(
        d_full[(k2y_ * n1 + k1y_), (k2x_ * n1 + k1x_)].astype(np.float32))

    def rt_C(state):
        def body(c, _):
            hr, hi = fwd_C(c[0], c[1])
            hr, hi = hr * c[2], hi * c[2]
            gr, gi = inv_C(hr, hi)
            return (gr, gi, c[2]), None
        return lax.scan(body, state, None, length=CHAIN)[0]

    if wanted("C"):
        # accuracy: fwd_C of permuted input vs ref gathered into S layout
        pr, pi = to_P(zr), to_P(zi)
        sr, si = fwd_C(pr, pi)
        ref_S = ref[:, (k2y_ * n1 + k1y_), (k2x_ * n1 + k1x_)]
        print(f"accuracy C: {relerr(sr, si, ref_S):.2e}", flush=True)
        timed("C-permuted", jax.jit(rt_C), (pr, pi, diag_S))

    print("SUMMARY", {k: round(v, 3) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
