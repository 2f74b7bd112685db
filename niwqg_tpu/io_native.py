"""ctypes binding for the native async snapshot writer.

Compiles ``native/async_writer.cpp`` on first use (g++, cached by source
mtime) and exposes :class:`AsyncSnapshotWriter`: submit numpy arrays as
``.npy`` files from the step loop without blocking on disk. Falls back
cleanly (``available() -> False``) when no compiler is present.
"""

from __future__ import annotations

import ctypes
import io as _io
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "async_writer.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "native", "_build")
_LIB = os.path.join(_BUILD_DIR, "libasyncwriter.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.aw_create.restype = ctypes.c_void_p
        lib.aw_create.argtypes = [ctypes.c_int]
        lib.aw_submit.restype = ctypes.c_int
        lib.aw_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_void_p, ctypes.c_uint64]
        lib.aw_pending.restype = ctypes.c_int
        lib.aw_pending.argtypes = [ctypes.c_void_p]
        lib.aw_errors.restype = ctypes.c_long
        lib.aw_errors.argtypes = [ctypes.c_void_p]
        lib.aw_drain.argtypes = [ctypes.c_void_p]
        lib.aw_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class AsyncSnapshotWriter:
    """Background-thread file sink (C++ worker pool)."""

    def __init__(self, n_threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native async writer unavailable (no g++?)")
        self._lib = lib
        self._h = lib.aw_create(n_threads)

    def submit_npy(self, path: str, array: np.ndarray) -> int:
        """Serialize ``array`` to .npy bytes and enqueue the write."""
        buf = _io.BytesIO()
        np.save(buf, np.ascontiguousarray(array))
        data = buf.getbuffer()
        return self._lib.aw_submit(
            self._h, path.encode(),
            (ctypes.c_char * len(data)).from_buffer(data), len(data)
        )

    def submit_bytes(self, path: str, data: bytes) -> int:
        return self._lib.aw_submit(self._h, path.encode(), data, len(data))

    def pending(self) -> int:
        return self._lib.aw_pending(self._h)

    def errors(self) -> int:
        return self._lib.aw_errors(self._h)

    def drain(self):
        self._lib.aw_drain(self._h)

    def close(self):
        if self._h:
            self._lib.aw_drain(self._h)
            self._lib.aw_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
