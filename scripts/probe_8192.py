"""8192² on the multi-chip path (virtual mesh) with memory accounting
(VERDICT r3 item 6).

Single-chip 8192² is RESOURCE_EXHAUSTED (ROADMAP, closed round 3) — the
question is whether the SHARDED step fits per device. This script, on an
8-device virtual CPU mesh:

  1. compiles the full coupled fast-kernel step at 8192² for BOTH
     distributed providers (pencil shard_map and GSPMD MXU matmul-DFT)
     and records XLA's memory analysis (argument/output/temp/peak bytes
     — for SPMD modules these are PER-DEVICE figures);
  2. EXECUTES one full step on the pencil provider (f64; the MXU
     provider's matmul-DFT at 8192² is compute-infeasible on a 4-core
     CPU host, so it gets the compile + memory budget only — on real
     TPU hardware it is the fast path);
  3. prints a per-buffer state budget so the numbers can be checked by
     hand.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8
     JAX_PLATFORMS=cpu python scripts/probe_8192.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

NX = int(os.environ.get("NIWQG_8192_NX", "8192"))


def build(backend, dtype, init_fields=True):
    from niwqg_tpu import CoupledModel
    from niwqg_tpu import InitialConditions as ic
    from niwqg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(len(jax.devices()))
    U0 = 0.05
    m = CoupledModel.Model(nx=NX, L=2 * np.pi * 200e3, dt=157.0,
                           tmax=157.0 * 10, m=1.0 / 325, N=0.005, f=1e-4,
                           use_filter=True, nu4=7.5e9, nu4w=7.5e9,
                           mesh=mesh, backend=backend, dtype=dtype,
                           fast=True, tdiags=1000)
    if init_fields:
        k0 = 10 * (2 * np.pi / m.L)
        m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
        m.set_phi((np.ones((NX, NX)) + 1j) * 2 * U0 / np.sqrt(2))
    return m


def state_budget(m, dtype):
    """Hand per-buffer accounting of the carried state (global bytes)."""
    leaves = jax.tree_util.tree_leaves(m.state)
    tot = sum(x.size * x.dtype.itemsize for x in leaves
              if hasattr(x, "size"))
    n_field = sum(1 for x in leaves
                  if hasattr(x, "size") and x.size >= NX * NX // 2)
    return {"state_bytes_global": int(tot), "field_planes": int(n_field),
            "bytes_per_plane": int(NX * NX * np.dtype(dtype).itemsize)}


def run(backend, dtype, execute):
    t0 = time.time()
    # compile-only arms skip set_q/set_phi: those EXECUTE sharded
    # transforms, and at 8192^2 on 8-threads-over-4-cores the work
    # between collectives trips XLA-CPU's 40 s rendezvous watchdog
    # (lowering/compiling the step needs only the zero state's shapes)
    m = build(backend, dtype, init_fields=execute)
    build_s = time.time() - t0
    _, g, consts = m._step_fns()
    t0 = time.time()
    compiled = jax.jit(g).lower(consts, m.state).compile()
    compile_s = time.time() - t0
    ma = compiled.memory_analysis()
    rec = {
        "nx": NX, "backend": backend, "dtype": str(np.dtype(dtype)),
        "devices": len(jax.devices()),
        "build_s": round(build_s, 1), "compile_s": round(compile_s, 1),
        "per_device_mem": {
            "arg_bytes": int(ma.argument_size_in_bytes),
            "out_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_extra_over_args": int(ma.temp_size_in_bytes
                                        + ma.output_size_in_bytes),
        },
        "state": state_budget(m, dtype),
        "executed": False,
    }
    if execute:
        t0 = time.time()
        out = compiled(consts, m.state)
        jax.block_until_ready(out)
        step_s = time.time() - t0
        qre = np.asarray(out.qh.re)
        assert np.isfinite(qre).all()
        rec.update(executed=True, step_s=round(step_s, 1),
                   tc=int(np.asarray(out.tc)))
    print(json.dumps(rec), flush=True)


def main():
    if os.environ.get("NIWQG_8192_ONLY") == "mxu":
        run("mxu", np.float32, execute=False)
        return
    # pencil: compile + EXECUTE one step (native FFT, feasible on CPU).
    # f32: an f64 attempt hit XLA-CPU's hard 40 s collective-rendezvous
    # timeout (8 device threads on 4 physical cores — one shard's FFT
    # work between all_to_alls exceeded the watchdog; host-environment
    # artifact, not a memory/framework limit). f32 halves the work and
    # matches the TPU production dtype.
    run("auto", np.float32, execute=True)
    # GSPMD MXU: compile + memory budget (f32 = the TPU production dtype)
    run("mxu", np.float32, execute=False)


if __name__ == "__main__":
    main()
