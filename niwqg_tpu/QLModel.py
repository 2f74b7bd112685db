"""Import-parity shim: ``from niwqg_tpu import QLModel; QLModel.Model``."""
from .api import QLModel as Model  # noqa: F401
