"""On-device polyphase resampling (kaiser-windowed sinc).

Device replacement for the reference's ``msaudio.Resample`` native kernel
(reference processing.py:132-186 ``resample`` with method="kaiser_best") —
the last ``[native-in-dep]`` DSP op from SURVEY §2.1. Implemented as one
grouped strided convolution: for a rational rate L/M, the L polyphase
filters form the output channels of a conv with stride M, so the whole
resample is a single MXU-friendly op (torchaudio's formulation).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample"]


def _kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int,
            rolloff: float, beta: float):
    """(L, width) polyphase kernel bank + padding, host-computed constants."""
    gcd = math.gcd(orig_freq, new_freq)
    up = new_freq // gcd      # L (polyphase count)
    down = orig_freq // gcd   # M (conv stride)

    base_freq = min(down, up) * rolloff  # cutoff in reduced-Hz
    width = math.ceil(lowpass_filter_width * down / base_freq)

    # t[j, k]: normalized time of tap k for output phase j — the sinc is
    # evaluated at (k/M - j/L) * cutoff (torchaudio kaiser_best formulation)
    idx = np.arange(-width, width + down)[None] / down
    t = (-np.arange(up)[:, None] / up + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / np.i0(beta)
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * base_freq / down
    return jnp.asarray(kernel, jnp.float32), width, up, down


@functools.partial(
    jax.jit,
    static_argnames=("orig_freq", "new_freq", "lowpass_filter_width", "rolloff", "beta"),
)
def resample(
    waveforms,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    beta: float = 14.769656459379492,
):
    """Resample ``(..., T)`` from ``orig_freq`` to ``new_freq`` on device.

    Kaiser-best defaults match torchaudio/msaudio. Output length is
    ``ceil(T * new_freq / orig_freq)``.
    """
    if orig_freq == new_freq:
        return waveforms
    kernel, width, up, down = _kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff, beta
    )

    shape = waveforms.shape
    x = waveforms.reshape(-1, shape[-1]).astype(jnp.float32)
    t_in = shape[-1]
    target_len = int(math.ceil(t_in * up / down))

    x = jnp.pad(x, ((0, 0), (width, width + down)))
    # conv: out[b, frame, phase] = sum_k x[b, frame*down + k] * kernel[phase, k]
    y = jax.lax.conv_general_dilated(
        x[:, None, :], kernel[:, None, :],
        window_strides=(down,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, up, frames)
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)[:, :target_len]
    return y.reshape(shape[:-1] + (target_len,)).astype(waveforms.dtype)
