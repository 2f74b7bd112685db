from . import mesh, pfft  # noqa: F401
