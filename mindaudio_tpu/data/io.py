"""WAV I/O for the host-side data layer.

API parity with the reference ``mindaudio.data.io`` (reference: io.py:552 ``read``,
io.py:750 ``write``): RIFF/RIFX WAV, PCM and IEEE-float, partial reads via
``offset``/``duration`` (seconds), and int16/int32 -> [-1, 1) float normalization
on read.  Instead of a hand-rolled byte parser we build on ``scipy.io.wavfile``
(which already handles 1-64 bit PCM incl. 24-bit repacking and RIFX) and add the
reference's offset/duration and normalization semantics on top.

``pin_memory`` / ``recursive_to`` (reference io.py:889/907) are re-interpreted
for JAX: they move pytrees of arrays onto the default JAX device.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile as _wavfile

__all__ = ["read", "write", "pin_memory", "recursive_to"]


def read(file, offset=0.0, duration=None):
    """Read a WAV file.

    Args:
        file: path or open file handle of a RIFF/RIFX WAV file.
        offset: start reading after this time (seconds).
        duration: only load up to this much audio (seconds). ``None`` reads to
            the end.

    Returns:
        (audio, samplerate): ``audio`` is float for int16/int32 (normalized by
        2**15 / 2**31 respectively, matching the reference), and the raw dtype
        otherwise (float32/float64/uint8 files are returned as stored). 1-D for
        mono, (num_samples, num_channels) otherwise.
    """
    sr, data = _wavfile.read(file)

    if offset or duration is not None:
        start = int(round(float(offset) * sr))
        stop = data.shape[0] if duration is None else start + int(round(float(duration) * sr))
        data = data[start:stop]

    if data.dtype == np.int32:
        data = data / 2147483648.0
    elif data.dtype == np.int16:
        data = data / 32768.0
    return data, sr


def write(file, data, sr):
    """Write a numpy array as a WAV file (scipy-compatible semantics).

    Args:
        file: output path or file handle.
        data: 1-D (mono) or 2-D ``(num_samples, num_channels)`` array of
            integer or float samples. Float data is written as IEEE float,
            integers as PCM.
        sr: sample rate in samples/sec.
    """
    data = np.asarray(data)
    _wavfile.write(file, int(sr), data)


def pin_memory(data):
    """Move a (possibly nested) structure of arrays onto the default JAX device.

    The reference's ``pin_memory`` (io.py:889) pins host tensors for faster
    transfer; the TPU-native analogue is an async ``jax.device_put``.
    """
    return recursive_to(data)


def recursive_to(data, device=None):
    """Recursively ``jax.device_put`` every array in lists/tuples/dicts."""
    import jax

    if isinstance(data, (list, tuple)):
        return type(data)(recursive_to(v, device) for v in data)
    if isinstance(data, dict):
        return {k: recursive_to(v, device) for k, v in data.items()}
    if isinstance(data, np.ndarray) or hasattr(data, "__jax_array__") or hasattr(data, "device"):
        try:
            return jax.device_put(data, device)
        except (TypeError, ValueError):
            return data
    return data
