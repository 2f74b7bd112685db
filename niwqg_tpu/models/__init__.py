from . import coupled, kernel, qg, ql, uncoupled, ybj  # noqa: F401
