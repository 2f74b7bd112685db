"""Debug QL faithful-quirks parity: compare one step stage-by-stage."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import logging

logging.disable(logging.CRITICAL)

from niwqg import CoupledModel as RefCoupled
from niwqg import InitialConditions as ric
from niwqg import QLModel as RefQL

from niwqg_tpu import QLModel

RefQL.Model.model = "QL Model"
RefQL.Model.jacobian_phic_phi = RefCoupled.Model.jacobian_phic_phi

U0 = 0.05
kw = dict(use_filter=False, U=-U0, tdiags=1, tmax=10 * 10000.0)
ref = RefQL.Model(**kw)
k0 = 10 * (2 * np.pi / ref.L)
q = ric.LambDipole(ref, U=U0, R=2 * np.pi / k0)
phi = np.asarray(ric.WavePacket(ref, k=2 * k0, l=0, R=2 * np.pi / k0,
                                x0=ref.L / 2, y0=ref.L / 2))
ref.set_q(q)
ref.set_phi(phi)

m = QLModel.Model(faithful_quirks=True, **kw)
m.set_q(q)
m.set_phi(phi)


def cmp(name, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    s = np.abs(a).max() + 1e-300
    print(f"{name:12s} relmax={np.abs(a - b).max() / s:.3e} scale={s:.3e}")


# after set_q/set_phi
cmp("qh0", ref.qh, m.qh)
cmp("phih0", ref.phih, m.phih)
cmp("ph0", ref.ph, m.ph)
cmp("qwh0", ref.qwh, m.qwh)
cmp("q_psi0", ref.q_psi, m.state.d.q_psi)
cmp("u0", ref.u, m.u)
cmp("phix0", ref.phix, m.state.d.phix.to_complex())

for i in range(3):
    ref._step_etdrk4()
    m.state = m.kernel.step(m.state)
    print(f"--- step {i+1}")
    cmp("qh", ref.qh, m.qh)
    cmp("phih", ref.phih, m.phih)
    cmp("qwh", ref.qwh, m.qwh)
    cmp("ph", ref.ph, m.ph)
    cmp("q_psi", ref.q_psi, m.state.d.q_psi)
    cmp("Ke", ref.Ke, m.state.Ke)
