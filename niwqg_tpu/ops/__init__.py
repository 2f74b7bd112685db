from . import fft, spectral  # noqa: F401
