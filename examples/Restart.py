"""Checkpoint / resume — first-class restart (beyond the reference).

The reference can only re-seed fields from snapshots (``Saving.py`` has
no resume routine: ``t``, ``tc``, the RK4-integrated budget accumulators
and the accumulated diagnostic series are lost, SURVEY.md §5). Here a
checkpoint round-trips the FULL state bit-exactly: a run split across a
save/load boundary reproduces the uninterrupted run to the last bit.

Run:  JAX_PLATFORMS=cpu python examples/Restart.py
"""

import os
import tempfile

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from niwqg_tpu import CoupledModel
from niwqg_tpu import InitialConditions as ic


def build(tmax_steps):
    U0 = 0.05
    m = CoupledModel.Model(nx=128, use_filter=False, U=-U0, tdiags=2,
                           tmax=tmax_steps * 10000.0)
    k0 = 10 * (2 * np.pi / m.L)
    q = ic.LambDipole(m, U=U0, R=2 * np.pi / k0)
    m.set_q(q)
    m.set_phi((np.ones_like(q) + 1j) * 5 * U0 / np.sqrt(2))
    return m


# --- uninterrupted control: 20 steps straight -------------------------
control = build(20)
control.run()

# --- interrupted run: 10 steps, checkpoint, fresh process-equivalent
#     model, resume, 10 more steps ------------------------------------
first = build(10)
first.run()
ckpt = os.path.join(tempfile.mkdtemp(), "state.ckpt")
first.save_checkpoint(ckpt)
print(f"checkpointed at step {int(first.tc)} -> {ckpt}")

resumed = build(20)           # fresh model object (new process in real use)
resumed.load_checkpoint(ckpt)
assert int(resumed.tc) == 10
resumed.run()                 # continues from step 10 to tmax

# --- bit-exact equivalence --------------------------------------------
assert np.array_equal(control.q, resumed.q)
assert np.array_equal(np.asarray(control.phi), np.asarray(resumed.phi))
assert control.Ke == resumed.Ke and control.Kw == resumed.Kw
for name in ("ke_qg", "ke_niw", "pe_niw", "gamma_r"):
    a = control.diagnostics[name]["value"]
    b = resumed.diagnostics[name]["value"]
    assert np.array_equal(a, b), name
print("resume is bit-exact: fields, budgets and all diagnostic series "
      "match the uninterrupted run")
