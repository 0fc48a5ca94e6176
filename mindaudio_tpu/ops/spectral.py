"""On-device spectral ops — the fused TPU path of the data layer.

Replaces every ``mindspore.dataset.audio`` C++ kernel call in the reference
(reference spectrum.py:594-698, features.py:62/191) with jitted JAX that keeps
the whole front-end (framing → window → DFT → power → mel → log) on-chip.

TPU-first design notes:
- The DFT is a **matmul with a precomputed (window ⊙ DFT-basis) matrix**, not an
  FFT: typical audio n_fft (400/512/1024) is small, and non-powers-of-two force
  XLA into Bluestein. Two ``(frames, n_fft) @ (n_fft, n_freq)`` bf16/f32
  matmuls ride the MXU and fuse with the mel projection, which is exactly the
  shape of work the 128×128 systolic array wants.
- Framing uses K = ceil(n_fft/hop) strided reshapes (no gather): frame i,
  column block j is ``sig[(i+j)*hop : (i+j+1)*hop]``. Extra columns beyond
  n_fft multiply against zero rows of the DFT matrix, so no masking is needed.
- Everything is shape-static and jit-cacheable per (n_fft, hop, n_mels) config.
- ``pallas_mel.fused_logmel`` is the hand-scheduled Pallas version of the same
  pipeline (single HBM read of the signal, double-buffered).

All functions accept ``(T,)`` or ``(B, T)`` input and return time-last
``(..., freq, frames)`` layouts matching the host API.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .filterbanks import (
    create_dct,
    get_window,
    kaldi_mel_banks,
    melscale_fbanks,
)

# DSP parity ops run the MXU in full-f32 (6-pass bf16) mode by default:
# feature extraction feeds CMVN statistics and golden tests, where
# bf16-default matmul error (~2e-3 relative) is visible, and it is a small
# fraction of a training step (measured: ~equal step time vs relaxed
# precision on the 46M conformer). Model matmuls elsewhere use the default.
_PRECISION = jax.lax.Precision.HIGHEST

_PRECISION_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def set_precision(level: str):
    """Set the module default DFT/mel matmul precision:
    "default" | "high" | "highest".

    Takes effect on the *next* call of any op in this module (precision is a
    static jit argument, so changing it retraces — no stale-cache footgun).
    Per-call override: every public op also accepts ``precision=``.
    """
    global _PRECISION
    _PRECISION = _PRECISION_LEVELS[level]


def _resolve_precision(precision):
    if precision is None:
        return _PRECISION
    if isinstance(precision, str):
        return _PRECISION_LEVELS[precision]
    return precision


def _precision_aware(jitted):
    """Bind ``precision`` at call time (not trace time) as a static jit arg."""

    @functools.wraps(jitted)
    def wrapper(*args, precision=None, **kwargs):
        return jitted(*args, precision=_resolve_precision(precision), **kwargs)

    return wrapper

__all__ = [
    "dft_matrices",
    "frame_signal",
    "stft",
    "spectrogram",
    "melscale",
    "melspectrogram",
    "amplitude_to_db",
    "fbank",
    "mfcc",
    "kaldi_fbank",
    "compute_deltas",
    "overlap_and_add",
    "sliding_window_cmn",
    "global_cmvn",
]


@functools.lru_cache(maxsize=16)
def _raw_dft(n_fft, dtype_str="float32"):
    """Unwindowed rDFT cos/sin basis ``(n_fft, n_fft//2+1)`` (plain numpy)."""
    n = np.arange(n_fft)[:, None]
    freqs = np.arange(n_fft // 2 + 1)[None, :]
    angle = -2.0 * np.pi * n * freqs / n_fft
    dtype = np.dtype(dtype_str)
    return np.cos(angle).astype(dtype), np.sin(angle).astype(dtype)


@functools.lru_cache(maxsize=64)
def dft_matrices(n_fft, win_length, window, hop_length, dtype_str="float32"):
    """Precompute the fused (window ⊙ rDFT) matrices, padded for strided framing.

    Returns ``(Wr, Wi)`` of shape ``(K * hop, n_freq)`` where
    ``K = ceil(n_fft / hop)``; rows in ``[n_fft, K*hop)`` are zero so frames may
    carry ``K*hop`` samples without masking.
    """
    n_freq = n_fft // 2 + 1
    k = math.ceil(n_fft / hop_length)
    width = k * hop_length

    win = np.zeros(n_fft)
    w = get_window(window, win_length, fftbins=True)
    lpad = (n_fft - win_length) // 2
    win[lpad : lpad + win_length] = w

    n = np.arange(n_fft)[:, None]
    freqs = np.arange(n_freq)[None, :]
    angle = -2.0 * np.pi * n * freqs / n_fft
    wr = np.zeros((width, n_freq))
    wi = np.zeros((width, n_freq))
    wr[:n_fft] = np.cos(angle) * win[:, None]
    wi[:n_fft] = np.sin(angle) * win[:, None]
    # cache plain numpy: jnp arrays created inside a jit trace are tracers and
    # must not leak across traces through the lru_cache
    dtype = np.dtype(dtype_str)
    return wr.astype(dtype), wi.astype(dtype)


def frame_signal(x, n_fft, hop_length, n_frames):
    """Strided-reshape framing: ``(..., T) -> (..., n_frames, K * hop)``.

    Column block j of frame i reads ``x[(i + j) * hop : (i + j + 1) * hop]``;
    requires ``x.shape[-1] >= (n_frames + K - 1) * hop``. No gathers — XLA
    lowers each block to a contiguous strided copy.
    """
    k = math.ceil(n_fft / hop_length)
    need = (n_frames + k - 1) * hop_length
    if x.shape[-1] < need:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - x.shape[-1])])
    blocks = [
        x[..., j * hop_length : (n_frames + j) * hop_length].reshape(
            x.shape[:-1] + (n_frames, hop_length)
        )
        for j in range(k)
    ]
    return jnp.concatenate(blocks, axis=-1)


def _num_frames(n_samples, n_fft, hop_length, center):
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - n_fft) // hop_length


def _pad_signal(x, n_fft, hop_length, center, pad_mode):
    if center:
        pads = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pads, mode=pad_mode)
    return x


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "win_length", "hop_length", "window", "center", "pad_mode",
        "precision",
    ),
)
def stft(
    waveforms,
    n_fft=512,
    win_length=None,
    hop_length=None,
    window="hann",
    center=True,
    pad_mode="constant",
    precision=None,
):
    """On-device STFT returning ``(real, imag)`` stacked on the last axis:
    ``(..., n_freq, n_frames, 2)``.

    librosa conventions, matching ``mindaudio_tpu.data.spectrum.stft`` (which
    itself matches reference spectrum.py:125).
    """
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 4
    n_frames = _num_frames(waveforms.shape[-1], n_fft, hop_length, center)
    x = _pad_signal(waveforms, n_fft, hop_length, center, pad_mode)
    frames = frame_signal(x, n_fft, hop_length, n_frames)

    wr, wi = (jnp.asarray(m) for m in dft_matrices(n_fft, win_length, window, hop_length))
    real = jnp.matmul(frames, wr, preferred_element_type=jnp.float32, precision=precision)
    imag = jnp.matmul(frames, wi, preferred_element_type=jnp.float32, precision=precision)
    # (..., n_frames, n_freq) -> (..., n_freq, n_frames, 2)
    return jnp.stack(
        (jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2)), axis=-1
    )


def _power_frames(waveforms, n_fft, win_length, hop_length, window, center, pad_mode, power, precision, compute_dtype=jnp.float32):
    """Shared power-spectrum core: ``(..., n_frames, n_freq)`` (time-major)."""
    n_frames = _num_frames(waveforms.shape[-1], n_fft, hop_length, center)
    x = _pad_signal(waveforms, n_fft, hop_length, center, pad_mode)
    frames = frame_signal(x, n_fft, hop_length, n_frames).astype(compute_dtype)
    wr, wi = (
        jnp.asarray(m)
        for m in dft_matrices(n_fft, win_length, window, hop_length, str(np.dtype(compute_dtype)))
    )
    real = jnp.matmul(frames, wr, preferred_element_type=jnp.float32, precision=precision)
    imag = jnp.matmul(frames, wi, preferred_element_type=jnp.float32, precision=precision)
    p = real * real + imag * imag
    if power == 2.0:
        return p
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(p, 1e-30))
    return jnp.power(jnp.maximum(p, 1e-30), power / 2.0)


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "win_length", "hop_length", "pad", "window", "power",
        "normalized", "center", "pad_mode", "precision",
    ),
)
def spectrogram(
    waveforms,
    n_fft=400,
    win_length=None,
    hop_length=None,
    pad=0,
    window="hann",
    power=2.0,
    normalized=False,
    center=True,
    pad_mode="reflect",
    precision=None,
):
    """On-device torchaudio-convention spectrogram: ``(..., n_freq, n_frames)``.

    Device replacement for reference spectrum.py:594-606 (msaudio.Spectrogram).
    """
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 2
    if pad > 0:
        waveforms = jnp.pad(waveforms, [(0, 0)] * (waveforms.ndim - 1) + [(pad, pad)])
    p = _power_frames(
        waveforms, n_fft, win_length, hop_length, window, center, pad_mode,
        power, precision,
    )
    if normalized:
        w = get_window(window, win_length, fftbins=True)
        p = p / np.sqrt(np.sum(w**2)) ** power
    return jnp.swapaxes(p, -1, -2)


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=("n_mels", "sample_rate", "f_min", "f_max", "n_stft",
                     "norm", "mel_type", "precision"),
)
def melscale(
    spec, n_mels=128, sample_rate=16000, f_min=0.0, f_max=None, n_stft=201,
    norm=None, mel_type="htk", precision=None,
):
    """Project ``(..., n_freq, time)`` onto ``(..., n_mels, time)`` on device."""
    f_max = f_max if f_max is not None else sample_rate // 2
    fb = jnp.asarray(
        melscale_fbanks(n_stft, f_min, f_max, n_mels, sample_rate,
                        norm=None if norm in (None, "none") else norm,
                        mel_scale=mel_type)
    )
    return jnp.swapaxes(jnp.matmul(jnp.swapaxes(spec, -1, -2), fb,
                                   preferred_element_type=jnp.float32, precision=precision), -1, -2)


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "win_length", "hop_length", "window", "power", "center",
        "pad_mode", "n_mels", "sample_rate", "f_min", "f_max", "norm",
        "mel_type", "precision",
    ),
)
def melspectrogram(
    waveforms,
    n_fft=400,
    win_length=None,
    hop_length=None,
    window="hann",
    power=2.0,
    center=True,
    pad_mode="reflect",
    n_mels=128,
    sample_rate=16000,
    f_min=0.0,
    f_max=None,
    norm=None,
    mel_type="htk",
    precision=None,
):
    """Fused on-device mel spectrogram ``(..., n_mels, n_frames)``.

    One jitted graph: frame → window⊙DFT matmul → |·|^power → mel matmul. XLA
    fuses the elementwise square between the two MXU matmuls. Device
    replacement for reference spectrum.py:609-698.
    """
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 2
    p = _power_frames(
        waveforms, n_fft, win_length, hop_length, window, center, pad_mode,
        power, precision,
    )
    f_max = f_max if f_max is not None else sample_rate // 2
    fb = jnp.asarray(
        melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate,
                        norm=None if norm in (None, "none") else norm,
                        mel_scale=mel_type)
    )
    mel = jnp.matmul(p, fb, preferred_element_type=jnp.float32, precision=precision)
    return jnp.swapaxes(mel, -1, -2)


@functools.partial(jax.jit, static_argnames=("stype", "top_db"))
def amplitude_to_db(spec, stype="power", ref=1.0, amin=1e-10, top_db=80.0):
    """dB conversion with per-sample ``top_db`` floor (device version of
    ``data.spectrum.amplitude_to_dB``; reference spectrum.py:25)."""
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.clip(spec, amin, None))
    db = db - multiplier * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        if spec.ndim > 2:
            axes = tuple(range(spec.ndim - 3, spec.ndim))  # (channel, freq, time)
            axes = tuple(a for a in axes if a >= 0)
        else:
            axes = tuple(range(spec.ndim))
        floor = jnp.amax(db, axis=axes, keepdims=True) - top_db
        db = jnp.maximum(db, floor)
    return db


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mels", "n_fft", "sample_rate", "f_min", "f_max", "win_length",
        "hop_length", "window", "deltas", "context", "left_frames",
        "right_frames", "precision",
    ),
)
def fbank(
    waveforms,
    deltas=False,
    context=False,
    n_mels=40,
    n_fft=400,
    sample_rate=16000,
    f_min=0.0,
    f_max=None,
    left_frames=5,
    right_frames=5,
    win_length=None,
    hop_length=None,
    window="hann",
    precision=None,
):
    """Fused on-device log-mel filterbank features ``(..., freq, time)``.

    Numerically matches ``mindaudio_tpu.data.features.fbank`` (reference
    features.py:196) while staying entirely on-chip — the north-star op.
    """
    mel = melspectrogram(
        waveforms,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        window=window,
        n_mels=n_mels,
        sample_rate=sample_rate,
        f_min=f_min,
        f_max=f_max,
        precision=precision,
    )
    out = amplitude_to_db(mel)
    if deltas:
        d1 = compute_deltas(out)
        d2 = compute_deltas(d1)
        out = jnp.concatenate((out, d1, d2), axis=-2)
    if context:
        out = _context_window(out, left_frames, right_frames)
    return out


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mels", "n_mfcc", "n_fft", "sample_rate", "f_min", "f_max",
        "win_length", "hop_length", "norm", "log_mels", "deltas", "context",
        "left_frames", "right_frames", "precision",
    ),
)
def mfcc(
    waveforms,
    deltas=True,
    context=True,
    n_mels=23,
    n_mfcc=20,
    n_fft=400,
    sample_rate=16000,
    f_min=0.0,
    f_max=None,
    left_frames=5,
    right_frames=5,
    win_length=None,
    hop_length=None,
    norm="ortho",
    log_mels=False,
    precision=None,
):
    """On-device MFCCs ``(..., n_mfcc[*3][*ctx], time)`` (reference features.py:273)."""
    mel = melspectrogram(
        waveforms,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        n_mels=n_mels,
        sample_rate=sample_rate,
        f_min=f_min,
        f_max=f_max,
        precision=precision,
    )
    if log_mels:
        mel = jnp.log(mel + 1e-6)
    else:
        mel = amplitude_to_db(mel)
    dct = jnp.asarray(create_dct(n_mfcc=n_mfcc, n_mels=n_mels, norm=norm))
    out = jnp.swapaxes(
        jnp.matmul(jnp.swapaxes(mel, -1, -2), dct, preferred_element_type=jnp.float32, precision=precision),
        -1, -2,
    )
    if deltas:
        d1 = compute_deltas(out)
        d2 = compute_deltas(d1)
        out = jnp.concatenate((out, d1, d2), axis=-2)
    if context:
        out = _context_window(out, left_frames, right_frames)
    return out


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mel_bins", "frame_length_ms", "frame_shift_ms", "sample_rate",
        "dither", "preemphasis", "remove_dc", "window", "precision",
    ),
)
def kaldi_fbank(
    waveforms,
    num_mel_bins=80,
    frame_length_ms=25.0,
    frame_shift_ms=10.0,
    sample_rate=16000,
    dither=0.0,
    preemphasis=0.97,
    remove_dc=True,
    window="povey",
    rng_key=None,
    precision=None,
):
    """Kaldi-convention log-mel fbank, as used by the reference conformer recipe
    (examples/conformer/dataset.py:142-157: povey window, preemphasis 0.97,
    snip-edges framing, natural-log mel).

    Input ``(..., T)`` (float in [-1, 1] is scaled to int16 range like kaldi);
    output ``(..., n_frames, num_mel_bins)`` — time-major, model-ready.
    """
    frame_length = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    n_fft = 1 << (frame_length - 1).bit_length()  # next pow2, kaldi-style

    # float input in [-1, 1] is scaled to the int16 range like kaldi;
    # integer input (e.g. the collate shipping raw int16 PCM to halve
    # host->device bytes) is already in that range — just cast
    x = waveforms.astype(jnp.float32)
    if not jnp.issubdtype(waveforms.dtype, jnp.integer):
        x = x * 32768.0
    n_frames = 1 + (x.shape[-1] - frame_length) // frame_shift

    # snip-edges framing at frame_length, then per-frame DSP before the DFT
    frames = frame_signal(x, frame_length, frame_shift, n_frames)[..., :frame_length]
    if rng_key is not None and dither > 0:
        frames = frames + dither * jax.random.normal(rng_key, frames.shape)
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis:
        frames = frames - preemphasis * jnp.concatenate(
            [frames[..., :1], frames[..., :-1]], axis=-1
        )

    win = jnp.asarray(get_window(window, frame_length))
    frames = frames * win

    # zero-pad to n_fft and DFT-matmul (cached plain-numpy basis: see
    # dft_matrices' tracer-leak note)
    pad = n_fft - frame_length
    frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    wr_np, wi_np = _raw_dft(n_fft)
    wr = jnp.asarray(wr_np, jnp.float32)
    wi = jnp.asarray(wi_np, jnp.float32)
    real = jnp.matmul(frames, wr, preferred_element_type=jnp.float32, precision=precision)
    imag = jnp.matmul(frames, wi, preferred_element_type=jnp.float32, precision=precision)
    power = real * real + imag * imag

    # kaldi mel banks: triangles evaluated in the mel domain over
    # [20, nyquist] (filterbanks.kaldi_mel_banks — NOT the torchaudio-style
    # linear-in-Hz melscale_fbanks, whose weights differ from kaldi's)
    fb = jnp.asarray(kaldi_mel_banks(num_mel_bins, n_fft, sample_rate))
    mel = jnp.matmul(power, fb, preferred_element_type=jnp.float32, precision=precision)
    return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))


@functools.partial(jax.jit, static_argnames=("win_length",))
def compute_deltas(specgram, win_length=5):
    """Device delta coefficients along time (edge-padded), matching
    ``data.features.compute_deltas`` (reference features.py:158)."""
    n = (win_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3.0
    x = jnp.pad(specgram, [(0, 0)] * (specgram.ndim - 1) + [(n, n)], mode="edge")
    out = jnp.zeros_like(specgram)
    for i in range(-n, n + 1):
        if i == 0:
            continue
        out = out + i * jax.lax.dynamic_slice_in_dim(
            x, n + i, specgram.shape[-1], axis=x.ndim - 1
        )
    return out / denom


def _context_window(x, left_frames, right_frames):
    ctx = left_frames + right_frames + 1
    n_time = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left_frames, right_frames)])
    cols = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, j, n_time, axis=x.ndim - 1) for j in range(ctx)],
        axis=-2,
    )
    return cols.reshape(x.shape[:-2] + (x.shape[-2] * ctx, n_time))


@functools.partial(jax.jit, static_argnames=("frame_step",))
def overlap_and_add(signal, frame_step):
    """Jittable overlap-add ``(..., frames, frame_length) -> (..., T)``.

    GCD-subframe reshape + segment-sum — the XLA-native version of the
    reference's MindSpore ``index_add`` trick (processing.py:547-593), with no
    hard-coded lengths.
    """
    frames, frame_length = signal.shape[-2:]
    sub = math.gcd(frame_length, frame_step)
    step_sub = frame_step // sub
    frame_sub = frame_length // sub
    output_size = frame_step * (frames - 1) + frame_length
    out_sub = output_size // sub

    # (..., frames * frame_sub, sub) subframes with target subframe indices
    subframes = signal.reshape(signal.shape[:-2] + (frames * frame_sub, sub))
    idx = (
        np.arange(frames)[:, None] * step_sub + np.arange(frame_sub)[None, :]
    ).reshape(-1)
    seg = jax.ops.segment_sum(
        jnp.moveaxis(subframes, -2, 0), jnp.asarray(idx), num_segments=out_sub
    )
    return jnp.moveaxis(seg, 0, -2).reshape(signal.shape[:-2] + (output_size,))


@jax.jit
def global_cmvn(x, mean, istd):
    """Global cepstral mean/variance normalization ``(x - mean) * istd``.

    Device port of the reference GlobalCMVN layer (models/layers/cmvn.py:6).
    """
    return (x - mean) * istd


@functools.partial(
    jax.jit,
    static_argnames=("cmn_window", "min_cmn_window", "center", "norm_vars"),
)
def sliding_window_cmn(x, cmn_window=600, min_cmn_window=100, center=False,
                       norm_vars=False):
    """Kaldi sliding-window CMN on device, O(T) via prefix sums.

    Same semantics as the host ``data.processing.sliding_window_cmn``
    (replacing the reference's msaudio.SlidingWindowCmn native kernel,
    reference processing.py:380-407) but computed with cumulative sums and
    gathers instead of a per-frame Python loop.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    t_len = xf.shape[-2]

    # window [ws, we) per frame, replicating the host edge logic
    t_idx = jnp.arange(t_len)
    if center:
        ws = t_idx - cmn_window // 2
        we = ws + cmn_window
        ws_c = jnp.maximum(ws, 0)
        we_c = jnp.where(ws < 0, we - ws, we)
    else:
        ws = t_idx - cmn_window
        we_c = t_idx + 1
        ws_c = jnp.maximum(ws, 0)
        we_c = jnp.maximum(we_c, jnp.minimum(min_cmn_window, t_len))
    over = jnp.maximum(we_c - t_len, 0)
    we_c = we_c - over
    ws_c = jnp.maximum(ws_c - over, 0)

    # prefix sums over time: sum over [ws, we) = cs[we] - cs[ws]
    cs = jnp.cumsum(xf, axis=-2)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1, :]), cs], axis=-2)
    win_sum = (jnp.take(cs, we_c, axis=-2) - jnp.take(cs, ws_c, axis=-2))
    count = (we_c - ws_c).astype(jnp.float32)[..., None]
    mean = win_sum / count

    out = xf - mean
    if norm_vars:
        cs2 = jnp.cumsum(xf**2, axis=-2)
        cs2 = jnp.concatenate([jnp.zeros_like(cs2[..., :1, :]), cs2], axis=-2)
        win_sq = (jnp.take(cs2, we_c, axis=-2) - jnp.take(cs2, ws_c, axis=-2))
        var = win_sq / count - mean**2
        out = out / jnp.sqrt(jnp.maximum(var, 1e-10))
    return out.astype(orig_dtype)


@_precision_aware
@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "win_length", "hop_length", "window", "center",
                     "length", "precision"),
)
def istft(
    stft_ri,
    n_fft=None,
    win_length=None,
    hop_length=None,
    window="hann",
    center=True,
    length=None,
    precision=None,
):
    """On-device inverse STFT (window-sum-square-normalized overlap-add).

    Takes the ``(..., n_freq, n_frames, 2)`` real/imag stack produced by
    ``ops.stft`` and reconstructs the waveform — the device counterpart of
    ``data.spectrum.istft`` (reference spectrum.py:346), completing the
    on-device analysis/modify/resynthesize loop (masking-based enhancement
    and separation stay on-chip end to end).
    """
    n_freq = stft_ri.shape[-3]
    if n_fft is None:
        n_fft = 2 * (n_freq - 1)
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 4

    # inverse rDFT as two matmuls: x = Re @ Cr^T + Im @ Ci^T
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    # hermitian weighting: interior bins count twice
    w = np.full(n_freq, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    cr = jnp.asarray(np.cos(ang) * w / n_fft, jnp.float32)    # (n_fft, n_freq)
    ci = jnp.asarray(-np.sin(ang) * w / n_fft, jnp.float32)

    real = jnp.swapaxes(stft_ri[..., 0], -1, -2)  # (..., n_frames, n_freq)
    imag = jnp.swapaxes(stft_ri[..., 1], -1, -2)
    frames = (
        jnp.matmul(real, cr.T, preferred_element_type=jnp.float32, precision=precision)
        + jnp.matmul(imag, ci.T, preferred_element_type=jnp.float32, precision=precision)
    )  # (..., n_frames, n_fft)

    win = np.zeros(n_fft, np.float32)
    w0 = get_window(window, win_length, fftbins=True)
    lpad = (n_fft - win_length) // 2
    win[lpad: lpad + win_length] = w0
    frames = frames * jnp.asarray(win)

    y = overlap_and_add(frames, hop_length)
    # window-sum-square normalization
    n_frames = frames.shape[-2]
    wss = overlap_and_add(
        jnp.broadcast_to(jnp.asarray(win**2), (n_frames, n_fft)), hop_length
    )
    y = y / jnp.maximum(wss, 1e-10)

    if center:
        y = y[..., n_fft // 2:]
        if length is None:  # trim the trailing center pad too (spectrum.py istft)
            y = y[..., : y.shape[-1] - n_fft // 2]
    if length is not None:
        y = y[..., :length]
        pad = length - y.shape[-1]
        if pad > 0:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    return y
