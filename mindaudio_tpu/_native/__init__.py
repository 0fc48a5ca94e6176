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

__all__ = ["build", "available", "wav_read_batch",
           "beam_available", "ctc_prefix_beam_batch"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwav_loader.so")
_SO_BEAM = os.path.join(_DIR, "libctc_beam.so")
_lib = None
_beam_lib = None


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


def _load_beam():
    global _beam_lib
    if _beam_lib is not None:
        return _beam_lib
    src = os.path.join(_DIR, "ctc_beam.cc")
    # a packaged install may ship only the built .so; a missing source can't
    # make the binary stale (and must not raise here)
    stale = (os.path.exists(_SO_BEAM) and os.path.exists(src)
             and os.path.getmtime(_SO_BEAM) < os.path.getmtime(src))
    try:
        if not os.path.exists(_SO_BEAM) or stale:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
                 src, "-o", _SO_BEAM],
                check=True,
            )
    except Exception:
        # never serve a .so known to be older than its source — a changed
        # algorithm must fall back to the (correct) Python DP instead
        if stale or not os.path.exists(_SO_BEAM):
            return None
    try:
        lib = ctypes.CDLL(_SO_BEAM)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ctc_prefix_beam_batch.argtypes = [
        f32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, f32p, i32p,
    ]
    lib.ctc_prefix_beam_batch.restype = ctypes.c_int32
    _beam_lib = lib
    return _beam_lib


def beam_available() -> bool:
    try:
        return _load_beam() is not None
    except Exception:
        return False


def ctc_prefix_beam_batch(top_logp, top_idx, n_valid, beam_size,
                          blank_id=0, max_len=None):
    """Native batched CTC prefix beam search (ctc_beam.cc).

    Args:
        top_logp: ``(B, T, K)`` f32 per-frame top-k log-probs.
        top_idx: ``(B, T, K)`` int top-k token ids.
        n_valid: ``(B,)`` valid frame counts.

    Returns:
        list over the batch of best-first ``[(prefix_tuple, log_prob), ...]``
        — same contract as ``utils.recognize.ctc_prefix_beam_dp``.
    """
    lib = _load_beam()
    if lib is None:
        raise RuntimeError("native ctc beam unavailable (g++ build failed)")
    top_logp = np.ascontiguousarray(top_logp, np.float32)
    top_idx = np.ascontiguousarray(top_idx, np.int32)
    n_valid = np.ascontiguousarray(n_valid, np.int32)
    b, t, k = top_logp.shape
    max_len = int(max_len if max_len is not None else t)
    max_len = max(max_len, 1)
    tokens = np.zeros((b, beam_size, max_len), np.int32)
    lens = np.zeros((b, beam_size), np.int32)
    scores = np.zeros((b, beam_size), np.float32)
    counts = np.zeros((b,), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.ctc_prefix_beam_batch(
        top_logp.ctypes.data_as(f32p), top_idx.ctypes.data_as(i32p),
        n_valid.ctypes.data_as(i32p), b, t, k, beam_size, blank_id, max_len,
        tokens.ctypes.data_as(i32p), lens.ctypes.data_as(i32p),
        scores.ctypes.data_as(f32p), counts.ctypes.data_as(i32p),
    )
    if rc != 0:
        raise RuntimeError(f"ctc_prefix_beam_batch failed (rc={rc})")
    return [
        [(tuple(tokens[i, j, : lens[i, j]].tolist()), float(scores[i, j]))
         for j in range(int(counts[i]))]
        for i in range(b)
    ]


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
