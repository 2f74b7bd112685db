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


def enable_compile_cache(cache_dir: str = None):
    """Turn on JAX's persistent compilation cache (opt-in, recommended).

    Measured on the target TPU backend (PERFORMANCE.md round 4): the
    10-step bench chunk compiles in 6.7-10.4 s from cache vs 37-62 s
    cold, and a reference-API ``run()``'s first-cadence warm-up drops
    125 s -> 23 s — each distinct scan length compiles once per machine
    instead of once per process. Call BEFORE constructing any model.

    ``cache_dir`` defaults to ``~/.cache/niwqg_tpu_xla`` (created if
    missing). Safe to call on any backend; silently no-ops if the config
    knobs are unavailable.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "niwqg_tpu_xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):
        pass
    return cache_dir


from . import CoupledModel, QGModel, QLModel, UnCoupledModel, YBJModel
from . import diagnostics as Diagnostics
from . import initial_conditions as InitialConditions
from . import io as Saving
from .carray import C
from .grid import Grid
