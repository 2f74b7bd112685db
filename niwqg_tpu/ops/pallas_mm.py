"""Pallas TPU kernel: fused complex matmul with masked-split precision.

The matmul-DFT's hot op is ``Z @ M`` for complex ``Z`` (re/im planes) and a
constant complex DFT matrix ``M``, at ~16-mantissa-bit accuracy via the
masked hi/lo operand split (see ``ops/fft.py``). Lowered through XLA this
is 12 separate ``dot`` ops whose intermediates round-trip HBM before the
adds. This kernel fuses all of it: one pass over the operand tiles, twelve
MXU contractions accumulating into two VMEM scratch accumulators, one HBM
write per output plane.

Grid: ``(M/TM, N/TN, K/TK)`` with K innermost for accumulation. The hi/lo
split of the streamed operand is computed in-register per tile; the DFT
matrix arrives pre-split (4 planes: re_hi, re_lo, im_hi, im_lo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split(x):
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(xi & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi, x - hi


def _kernel(ar_ref, ai_ref, brh_ref, brl_ref, bih_ref, bil_ref,
            or_ref, oi_ref, acc_r, acc_i):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    ar = ar_ref[:]
    ai = ai_ref[:]
    arh, arl = _split(ar)
    aih, ail = _split(ai)
    f32 = jnp.float32

    def smm(x, xh, xl, yh, yl):
        # split product: x@yl captures (xh+xl)@yl; xl@yh and xh@yh complete
        return (jnp.dot(x, yl, preferred_element_type=f32)
                + jnp.dot(xl, yh, preferred_element_type=f32)
                + jnp.dot(xh, yh, preferred_element_type=f32))

    brh, brl = brh_ref[:], brl_ref[:]
    bih, bil = bih_ref[:], bil_ref[:]
    acc_r[:] += smm(ar, arh, arl, brh, brl) - smm(ai, aih, ail, bih, bil)
    acc_i[:] += smm(ar, arh, arl, bih, bil) + smm(ai, aih, ail, brh, brl)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        or_ref[:] = acc_r[:]
        oi_ref[:] = acc_i[:]


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "interpret"))
def csplit_matmul(ar, ai, brh, brl, bih, bil, tm=256, tn=512, tk=512,
                  interpret=False):
    """(ar + i*ai) @ (b) with pre-split b planes; returns (out_re, out_im).

    ``ar``/``ai``: (M, K) f32. ``b*``: (K, N) f32 pre-split planes.
    M, K, N must be divisible by the tile sizes.
    """
    M, K = ar.shape
    N = brh.shape[1]
    tm, tn, tk = min(tm, M), min(tn, N), min(tk, K)
    grid = (M // tm, N // tn, K // tk)

    a_spec = pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                          memory_space=pltpu.VMEM)

    out_r, out_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[a_spec, a_spec, b_spec, b_spec, b_spec, b_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(jax.ShapeDtypeStruct((M, N), jnp.float32),
                   jax.ShapeDtypeStruct((M, N), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * 2 * M * N * K, bytes_accessed=(2 * M * K + 4 * K * N
                                                      + 2 * M * N) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ar, ai, brh, brl, bih, bil)
    return out_r, out_i
