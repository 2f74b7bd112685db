"""Pallas direct-exchange all-to-all transpose (ROADMAP item 5 follow-up).

The pencil FFT's serial bottleneck is the transpose: ``lax.all_to_all``
is scheduled by XLA as one monolithic collective, so every device idles
while the full block crosses the interconnect. The XLA-level remedy
(``PencilTransform(overlap_chunks=c)``) splits it into independent
column-pencil chunks the latency-hiding scheduler can overlap with 1-D
FFT compute. This module is the Pallas-level alternative for when the
scheduler proves insufficient on real ICI hardware: a hand-written
direct-exchange kernel in which each device issues its P-1 peer-block
RDMAs (``pltpu.make_async_remote_copy``) back-to-back, so ALL transfers
are in flight concurrently (full ICI utilization, no serialization),
optionally chunked per peer so early chunks land while later ones are
still flying (double buffering across the exchange).

Semantics: exactly ``lax.all_to_all(x, axis, split_axis=1, concat_axis=0,
tiled=True)`` for a 2-D local block (rows, P*W) -> (P*rows, W), and the
inverse with ``split_axis=0, concat_axis=1`` — the two layouts the pencil
transform uses. Must run inside ``shard_map`` over a 1-D mesh.

Correctness is asserted against ``lax.all_to_all`` in interpret mode on
the virtual CPU mesh (``tests/test_pallas_a2a.py``); the compiled-mode
A/B needs real multi-chip ICI, which this environment does not expose
(single remote chip) — the kernel is gated behind
``transform_opts={"pallas_a2a": True}`` ready for that hardware.

Complex inputs ride as their real/imag planes stacked on a leading axis
(one DMA each), since the TPU path has no complex dtype anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mesh import AXIS


def _entry_barrier(nP, axis, barrier):
    """Global barrier before any remote write: a fast device must not
    start RDMAs into a peer's output (or signal its recv semaphores)
    before that peer has entered the kernel — and because the fwd and
    inv kernels run back-to-back every step, a sender could otherwise
    race a receiver still draining the previous kernel's semaphores."""
    me = lax.axis_index(axis)
    for s in range(1, nP):
        peer = lax.rem(me + jnp.int32(s), jnp.int32(nP))
        pltpu.semaphore_signal(barrier, inc=1, device_id=peer,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, nP - 1)


def _fwd_kernel(nP, R, W, chunks, axis, use_barrier, x_ref, out_ref,
                send_sem, recv_sem, barrier_sem):
    """(R, nP*W) row block -> (nP*R, W) column pencil, direct exchange.

    Sender ``me`` writes its ``dst``-block into rows [me*R, (me+1)*R) of
    ``dst``'s output. Per (peer, chunk) an independent DMA + semaphore
    slot: all nP-1 peer transfers (x ``chunks`` column chunks each) are
    started before any wait, so they share the wire concurrently.
    """
    if use_barrier:
        _entry_barrier(nP, axis, barrier_sem)
    me = lax.axis_index(axis)
    cw = W // chunks
    # local block: plain VMEM/HBM copy
    out_ref[:, pl.ds(me * R, R), :] = x_ref[:, :, pl.ds(me * W, W)]
    rdmas = []
    for s in range(1, nP):
        dst = lax.rem(me + jnp.int32(s), jnp.int32(nP))
        for c in range(chunks):
            slot = (s - 1) * chunks + c
            rdma = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[:, :, pl.ds(dst * W + c * cw, cw)],
                dst_ref=out_ref.at[:, pl.ds(me * R, R),
                                   pl.ds(c * cw, cw)],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[slot],
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdmas.append(rdma)
    for r in rdmas:
        r.wait()


def _inv_kernel(nP, R, W, chunks, axis, use_barrier, x_ref, out_ref,
                send_sem, recv_sem, barrier_sem):
    """(nP*R, W) column pencil -> (R, nP*W) row block (inverse layout)."""
    if use_barrier:
        _entry_barrier(nP, axis, barrier_sem)
    me = lax.axis_index(axis)
    cw = W // chunks
    out_ref[:, :, pl.ds(me * W, W)] = x_ref[:, pl.ds(me * R, R), :]
    rdmas = []
    for s in range(1, nP):
        dst = lax.rem(me + jnp.int32(s), jnp.int32(nP))
        for c in range(chunks):
            slot = (s - 1) * chunks + c
            rdma = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[:, pl.ds(dst * R, R),
                                 pl.ds(c * cw, cw)],
                dst_ref=out_ref.at[:, :,
                                   pl.ds(me * W + c * cw, cw)],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[slot],
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdmas.append(rdma)
    for r in rdmas:
        r.wait()


def _call(kernel, nP, chunks, axis, out_shape, x, interpret, cid):
    nsem = (nP - 1) * chunks
    return pl.pallas_call(
        kernel,
        # vma: the output varies across the mesh axis (per-device shards)
        # — required when the enclosing shard_map checks varying-mesh-axes
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype, vma={axis}),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,)),
                        pltpu.SemaphoreType.DMA((nsem,)),
                        pltpu.SemaphoreType.REGULAR],
        # distinct collective_id per direction: the fwd and inv kernels
        # run back-to-back each step and must not share barrier state
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=cid),
        interpret=interpret,
    )(x)


def _planes(z):
    """Real view of a complex local block as (..., 2, rows, cols)."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-3)


def _unplanes(p):
    return lax.complex(p[..., 0, :, :], p[..., 1, :, :])


def all_to_all_fwd(z, nP: int, chunks: int = 1, axis: str = AXIS,
                   interpret: bool = False):
    """Drop-in for ``lax.all_to_all(z, axis, split_axis=-1,
    concat_axis=-2, tiled=True)`` on a complex 2-D (or leading-batched)
    local block, via the direct-exchange kernel."""
    lead = z.shape[:-2]
    R, WP = z.shape[-2], z.shape[-1]
    W = WP // nP
    chunks = max(1, min(chunks, W))
    while W % chunks:
        chunks -= 1
    p = _planes(z).reshape((-1, R, WP))
    # entry barrier only in compiled mode: the interpreter neither
    # implements remote semaphore signals nor needs the barrier (its
    # per-device execution is already serialized by the host)
    k = functools.partial(_fwd_kernel, nP, R, W, chunks, axis,
                          not interpret)
    out = _call(k, nP, chunks, axis, (p.shape[0], nP * R, W), p, interpret,
                cid=0)
    out = out.reshape(lead + (2, nP * R, W))
    return _unplanes(out)


def all_to_all_inv(z, nP: int, chunks: int = 1, axis: str = AXIS,
                   interpret: bool = False):
    """Drop-in for ``lax.all_to_all(z, axis, split_axis=-2,
    concat_axis=-1, tiled=True)`` (the inverse-direction transpose)."""
    lead = z.shape[:-2]
    RP, W = z.shape[-2], z.shape[-1]
    R = RP // nP
    chunks = max(1, min(chunks, W))
    while W % chunks:
        chunks -= 1
    p = _planes(z).reshape((-1, RP, W))
    k = functools.partial(_inv_kernel, nP, R, W, chunks, axis,
                          not interpret)
    out = _call(k, nP, chunks, axis, (p.shape[0], R, nP * W), p, interpret,
                cid=1)
    out = out.reshape(lead + (2, R, nP * W))
    return _unplanes(out)
