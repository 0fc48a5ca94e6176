"""Native (C++) runtime components, loaded via ctypes.

``build()`` compiles the shared library with the system g++ (no pybind11 —
the C ABI + ctypes keeps the build one command). All callers fall back to
the NumPy path when the library is absent, so the native layer is an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["build", "available", "wav_read_batch"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwav_loader.so")
_lib = None


def build(force: bool = False) -> str:
    """Compile libwav_loader.so in place; returns the path."""
    src = os.path.join(_DIR, "wav_loader.cc")
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(src)
    ):
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
             src, "-o", _SO],
            check=True,
        )
    return _SO


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        # always consult build(): it is a no-op when the .so is newer than
        # the source, and recompiles a missing or stale binary (an edited
        # wav_loader.cc must never keep running through the old .so)
        build()
    except Exception:
        if not os.path.exists(_SO):
            return None
        # toolchain unavailable but a prebuilt .so exists — use it
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None  # ABI-incompatible binary: fall back to the NumPy path
    lib.wav_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.wav_read_batch.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    try:
        return _load() is not None
    except Exception:
        return False


def wav_read_batch(paths, max_len: int, n_threads: int = 0):
    """Decode ``paths`` in parallel into one padded float32 batch.

    Returns ``(batch (N, max_len) f32, lens (N,) i32, rates (N,) i32)``;
    a rate of 0 marks a file that failed to decode.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native wav loader unavailable (g++ build failed)")
    n = len(paths)
    out = np.empty((n, max_len), np.float32)  # zero-filled by the C++ side
    lens = np.zeros(n, np.int32)
    rates = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.wav_read_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return out, lens, rates
