"""niwqg_tpu — a TPU-native pseudospectral NIW–QG framework.

Brand-new JAX/XLA/Pallas re-design of the capabilities of
``cesar-rocha/niwqg``: the Xie & Vanneste (2015) coupled model of
near-inertial waves on barotropic QG flow, its uncoupled/quasilinear/YBJ
variants, and the standalone QG(+passive scalar) model, on an ETDRK4
pseudospectral core — built for TPU from the start (real-arithmetic complex
pairs, MXU matmul-DFT transforms, shardable pure-function steppers).

Import-compatible with the reference package layout::

    from niwqg_tpu import CoupledModel
    m = CoupledModel.Model(L=2*np.pi*200e3, nx=512, ...)
    m.set_q(q); m.set_phi(phi); m.run()
"""

__version__ = "0.1.0"

from . import CoupledModel, QGModel, QLModel, UnCoupledModel, YBJModel
from . import diagnostics as Diagnostics
from . import initial_conditions as InitialConditions
from . import io as Saving
from .carray import C
from .grid import Grid
