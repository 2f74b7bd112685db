import functools, os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
n, TR, N1 = 2048, 128, 16
N2 = n // 16
rng = np.random.default_rng(0)

def mask_split_np(m):
    m = m.astype(np.float32)
    hi = (m.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    return hi, m - hi

def block_real(M):
    return np.block([[M.real, M.imag], [-M.imag, M.real]])

def triple_rows(B):
    bh, bl = mask_split_np(B)
    return np.vstack([bl, bh, bh]).astype(np.float32)

a_ = np.arange(N1); b_ = np.arange(N2)
M1 = np.exp(-2j*np.pi*np.outer(a_, a_)/N1)
M2 = np.exp(-2j*np.pi*np.outer(b_, b_)/N2)
T = np.exp(-2j*np.pi*np.outer(b_, a_)/n)
B1 = jnp.asarray(triple_rows(block_real(M1)))
M2r3 = jnp.asarray(triple_rows(M2.real))
M2i3 = jnp.asarray(triple_rows(M2.imag))
TWA = jnp.asarray(np.concatenate([T.real, T.real], 1).astype(np.float32))
TWB = jnp.asarray(np.concatenate([-T.imag, T.imag], 1).astype(np.float32))

def split(x):
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(xi & jnp.uint32(0xFFFF0000), f32)
    return hi, x - hi

DN_SUB = (((1,), (0,)), ((), ()))
DN_MIN = (((2,), (0,)), ((), ()))

def kern_a(zr_ref, zi_ref, b1_ref, o_ref):
    zre = zr_ref[:].reshape(TR, N1, N2)
    zim = zi_ref[:].reshape(TR, N1, N2)
    z2 = jnp.concatenate([zre, zim], axis=1)
    zh, zl = split(z2)
    z6 = jnp.concatenate([z2, zl, zh], axis=1)
    o_ref[:] = jax.lax.dot_general(z6, b1_ref[:], DN_SUB,
                                   preferred_element_type=f32)

def kern_b(s1_ref, twa_ref, twb_ref, m2r_ref, m2i_ref, ore_ref, oim_ref):
    s1 = s1_ref[:]
    tw = s1 * twa_ref[:] + pltpu.roll(s1, shift=16, axis=2) * twb_ref[:]
    sw = jnp.swapaxes(tw, 1, 2)
    swh, swl = split(sw)
    sw3 = jnp.concatenate([sw, swl, swh], axis=2)
    dR = jax.lax.dot_general(sw3, m2r_ref[:], DN_MIN,
                             preferred_element_type=f32)
    dI = jax.lax.dot_general(sw3, m2i_ref[:], DN_MIN,
                             preferred_element_type=f32)
    cre = dR[:, :16, :] - dI[:, 16:, :]
    cim = dI[:, :16, :] + dR[:, 16:, :]
    ore_ref[:] = jnp.swapaxes(cre, 1, 2)
    oim_ref[:] = jnp.swapaxes(cim, 1, 2)

call_a = functools.partial(
    pl.pallas_call, kern_a,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((TR, N2, 32), f32))()

call_b = functools.partial(
    pl.pallas_call, kern_b,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
    out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    out_shape=(jax.ShapeDtypeStruct((TR, N2, N1), f32),) * 2)()

zr_np = rng.standard_normal((TR, n)).astype(np.float32)
zi_np = rng.standard_normal((TR, n)).astype(np.float32)
zr, zi = jnp.asarray(zr_np), jnp.asarray(zi_np)

try:
    s1 = call_a(zr, zi, B1)
    o1, o2 = call_b(s1, TWA, TWB, M2r3, M2i3)
    got = (np.asarray(o1).astype(np.float64)
           + 1j*np.asarray(o2)).reshape(TR, n)
    want = np.fft.fft(zr_np.astype(np.float64) + 1j*zi_np, axis=-1)
    rel = np.abs(got-want).max()/np.abs(want).max()
    print(f"AB-PASS accuracy: rel={rel:.2e}", flush=True)
except Exception as e:
    print(f"AB-PASS FAIL: {type(e).__name__}: {str(e)[:140]}", flush=True)
    sys.exit(0)

# ---- speed at scale: lax.map over tiles --------------------------------
BATCH = 4
CHAIN = 50
R = BATCH * n

def pass_fused(zre, zim):
    zre_t = zre.reshape(R // TR, TR, n)
    zim_t = zim.reshape(R // TR, TR, n)
    def one(args):
        aa, bb = args
        s1 = call_a(aa, bb, B1)
        return call_b(s1, TWA, TWB, M2r3, M2i3)
    o1, o2 = lax.map(one, (zre_t, zim_t))
    return o1.reshape(R, n), o2.reshape(R, n)

Zr = jnp.asarray(rng.standard_normal((R, n)).astype(np.float32))
Zi = jnp.asarray(rng.standard_normal((R, n)).astype(np.float32))

hr, hi_ = jax.jit(pass_fused)(Zr, Zi)
want = np.fft.fft(np.asarray(Zr, np.float64) + 1j*np.asarray(Zi, np.float64),
                  axis=-1)
got = np.asarray(hr).astype(np.float64) + 1j*np.asarray(hi_)
print(f"MAP accuracy: rel={np.abs(got-want).max()/np.abs(want).max():.2e}",
      flush=True)

from niwqg_tpu.carray import C
from niwqg_tpu.ops.fft import MXUTransform
mxu = MXUTransform(n, np.float32)

def xla_fwd(a, bb):
    h = mxu._cdft.along(C(a, bb), inverse=False, axis=-1)
    return h.re, h.im

def chain(fn):
    def run(state):
        def body(c, _):
            o = fn(c[0], c[1])
            return (o[0] * (1.0/64.0), o[1] * (1.0/64.0)), None
        return lax.scan(body, state, None, length=CHAIN)[0]
    return jax.jit(run)

def timed(label, fn, state):
    t0 = time.time()
    out = fn(state)
    s0 = float(np.asarray(out[0]).ravel()[0])
    compile_s = time.time()-t0
    assert np.isfinite(s0), label
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(out)
        float(np.asarray(out[0]).ravel()[0])
        best = min(best, time.time()-t0)
    print(f"SPEED {label}: {best/CHAIN/BATCH*1e3:.3f} ms/slice "
          f"(compile {compile_s:.0f}s)", flush=True)

timed("xla-1d-fwd", chain(xla_fwd), (Zr, Zi))
timed("fused-1d-fwd", chain(pass_fused), (Zr, Zi))
time.sleep(2)
