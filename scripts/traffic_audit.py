"""Per-step ICI communication-volume audit at scale (VERDICT r3 item 4).

Compiles the FULL sharded coupled fast-kernel step (the TPU production
step shape) on a virtual mesh at production sizes and

  1. counts collective traffic in the optimized HLO (the per-device
     local program under shard_map — all-to-all result bytes are exactly
     what each device's transpose buffers hold; the ICI-crossing share
     is (P-1)/P of that, each device keeping its diagonal block), and
  2. cross-checks it against an exact trace-time census of the pencil
     provider's transform calls (each 2-D transform = one full-width
     all_to_all per field on this path; every field block is
     (ny/P, nx) complex).

Also audits the ``pair_inverse`` kernel: packing two real fields per
complex inverse halves the real-inverse group's transposes — on the
pencil path that is a direct ICI-volume reduction, quantified here.

Emits one JSON line per (P, nx, pair); run under
XLA_FLAGS=--xla_force_host_platform_device_count=<P> JAX_PLATFORMS=cpu.
Compile-only — no execution, so 8192 audits cost only compile time.
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)


def _shapes(txt, op):
    """(element_count, bytes) of every ``op`` result in the HLO."""
    out = []
    marker = " " + op + "("
    bytes_of = {"f64": 8, "f32": 4, "c128": 16, "c64": 8, "u32": 4,
                "s32": 4, "pred": 1, "bf16": 2, "f16": 2}
    for line in txt.splitlines():
        if marker not in line or "= " not in line:
            continue
        restype = line.split("= ", 1)[1].split(marker, 1)[0]
        for ty, dims in re.findall(r"(\w+)\[([0-9,]*)\]", restype):
            n = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
            out.append((n, n * bytes_of.get(ty, 8)))
    return out


class _Census:
    """Wrap a transform provider; count fields per direction at trace
    time (leading-axis product = fields per batched call)."""

    def __init__(self, tr):
        self._tr = tr
        self.counts = {}

    def __getattr__(self, name):
        fn = getattr(self._tr, name)
        if name not in ("fft2", "ifft2", "fft2_real", "ifft2_real",
                        "rfft2", "irfft2", "ifft2_real_pairs"):
            return fn

        def wrapped(z, *a, **kw):
            arr = z.re if hasattr(z, "re") else z
            nf = int(np.prod(arr.shape[:-2])) if arr.ndim > 2 else 1
            self.counts[name] = self.counts.get(name, 0) + nf
            return fn(z, *a, **kw)

        return wrapped


def audit(nx: int, P: int, pair: bool):
    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic
    from niwqg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(P)
    U0 = 0.05
    kkw = {"pair_inverse": True} if pair else {}
    m = CoupledModel.Model(nx=nx, use_filter=True, U=-U0, tdiags=1,
                           nu4=7.5e9, nu4w=7.5e9, fast=True,
                           L=2 * np.pi * 200e3, dt=157.0, tmax=157.0 * 10,
                           m=1.0 / 325, N=0.005, f=1e-4, mesh=mesh, **kkw)
    if nx < 8192:
        # set_q/set_phi EXECUTE sharded transforms; at 8192² on the
        # 8-threads-over-4-cores virtual mesh that trips XLA-CPU's 40 s
        # collective-rendezvous watchdog. The audit only needs shapes.
        k0 = 10 * (2 * np.pi / m.L)
        m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
        m.set_phi((np.ones((nx, nx)) + 1j) * 2 * U0 / np.sqrt(2))
    _, g, consts = m._step_fns()
    txt = jax.jit(g).lower(consts, m.state).compile().as_text()

    a2a = _shapes(txt, "all-to-all")
    ar = _shapes(txt, "all-reduce")
    a2a_bytes = sum(b for _, b in a2a)
    a2a_ici = a2a_bytes * (P - 1) / P

    # exact census: re-trace one step with a counting provider
    cen = _Census(m.kernel.tr)
    real_tr, m.kernel.tr = m.kernel.tr, cen
    # rebind the kernel's real-path aliases onto the counting wrapper
    saved = (m.kernel._fwd_real, m.kernel._inv_real)
    if not getattr(m.kernel, "q_half", False):
        m.kernel._fwd_real = cen.fft2_real
        if not getattr(m.kernel, "pair_inverse", False):
            # pair mode's _inv_real closure reads kernel.tr dynamically
            # (already counted); only the forward alias needs rebinding
            m.kernel._inv_real = cen.ifft2_real
    try:
        jax.eval_shape(lambda s: m.kernel.step(s), m.state)
    finally:
        m.kernel.tr = real_tr
        m.kernel._fwd_real, m.kernel._inv_real = saved
    # model: one full-width (ny/P, nx) complex128 block transposed per
    # field-transform on the pencil path; a packed pair of real fields
    # rides ONE complex inverse (ceil for odd tails); ICI share (P-1)/P
    n_pair_fields = cen.counts.get("ifft2_real_pairs", 0)
    fields = (cen.counts.get("fft2", 0) + cen.counts.get("ifft2", 0)
              + cen.counts.get("fft2_real", 0)
              + cen.counts.get("ifft2_real", 0)
              + (n_pair_fields + 1) // 2)
    model = fields * (nx // P) * nx * 16 * (P - 1) / P

    rec = {
        "P": P, "nx": nx, "pair_inverse": bool(pair),
        "census": cen.counts, "transposed_fields_per_step": fields,
        "all_to_all_ops": len(a2a),
        "a2a_ici_bytes_per_dev_per_step": int(a2a_ici),
        "model_ici_bytes_per_dev_per_step": int(model),
        "hlo_over_model": round(a2a_ici / model, 3) if model else None,
        "all_reduce_count": len(ar),
        "all_reduce_max_elems": max((n for n, _ in ar), default=0),
        "all_gather_count": len(_shapes(txt, "all-gather")),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    P = len(jax.devices())
    sizes = [int(s) for s in
             os.environ.get("NIWQG_AUDIT_SIZES", "2048,4096,8192").split(",")]
    pairs = os.environ.get("NIWQG_AUDIT_PAIR", "0,1")
    for nx in sizes:
        for p in pairs.split(","):
            audit(nx, P, p != "0")


if __name__ == "__main__":
    main()
