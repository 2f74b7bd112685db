"""Import-parity shim: ``from niwqg_tpu import QGModel; QGModel.Model``."""
from .api import QGModel as Model  # noqa: F401
