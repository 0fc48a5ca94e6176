"""Pallas TPU kernel: fused framing + window⊙DFT + power + mel + log.

The performance path behind ``mindaudio_tpu.ops.fbank`` / ``melspectrogram``.
One grid program computes a block of frames end-to-end in VMEM:

    HBM signal chunk ──DMA──► VMEM ──K strided reshapes──► patch (BF, K·hop)
    patch @ Wr, patch @ Wi  (MXU, f32 accumulate)
    power = re² + im²       (VPU, fused)
    power @ mel_fb          (MXU)
    log(max(mel, eps))      (VPU) ──► HBM out block

The signal is read from HBM exactly once; framing never materializes the
(n_frames, n_fft) patch matrix in HBM (the XLA path does). Frame blocks
overlap by (K-1)·hop samples, which standard BlockSpecs can't express, so the
kernel DMAs its own input slice (pallas_guide.md "Async DMA" pattern).

Replaces the host hot loop of the reference (mp.Pool(8) NumPy fbank per batch,
examples/conformer/dataset.py:456-492) with on-chip compute.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filterbanks import get_window, kaldi_mel_banks, melscale_fbanks

__all__ = ["fused_logmel", "fused_logmel_reference"]

_LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _design(n_fft, win_length, hop, window, n_mels, sample_rate, f_min, f_max, kaldi):
    """Host-side constant matrices for the kernel (folded in at trace time).

    The signal enters the kernel as (n_sub, hop_pad) rows — each hop of samples
    padded to a 128-lane row. DFT sample n = j*hop + p therefore lives at patch
    column j*hop_pad + p; the W matrices are laid out in that padded coordinate
    system (pad rows stay zero, so the matmul ignores them).
    """
    n_freq = n_fft // 2 + 1
    k = math.ceil(n_fft / hop)
    hop_pad = _round_up(hop, _LANES)
    width_pad = k * hop_pad
    n_freq_pad = _round_up(n_freq, _LANES)
    n_mels_pad = _round_up(n_mels, _LANES)

    win = np.zeros(n_fft)
    w = get_window(window, win_length, fftbins=not kaldi)
    lpad = (n_fft - win_length) // 2 if not kaldi else 0
    win[lpad : lpad + win_length] = w

    n = np.arange(n_fft)[:, None]
    freqs = np.arange(n_freq)[None, :]
    angle = -2.0 * np.pi * n * freqs / n_fft
    dense_r = np.cos(angle) * win[:, None]
    dense_i = np.sin(angle) * win[:, None]
    wr = np.zeros((width_pad, n_freq_pad), np.float32)
    wi = np.zeros((width_pad, n_freq_pad), np.float32)
    for j in range(k):
        lo, hi = j * hop, min((j + 1) * hop, n_fft)
        if lo >= n_fft:
            break
        wr[j * hop_pad : j * hop_pad + (hi - lo), :n_freq] = dense_r[lo:hi]
        wi[j * hop_pad : j * hop_pad + (hi - lo), :n_freq] = dense_i[lo:hi]

    fmax = f_max if f_max is not None else sample_rate / 2.0
    fb = np.zeros((n_freq_pad, n_mels_pad), np.float32)
    if kaldi:
        # kaldi front-end: triangles evaluated in the mel domain, matching
        # spectral.kaldi_fbank's bank exactly
        fb[:n_freq, :n_mels] = kaldi_mel_banks(n_mels, n_fft, sample_rate,
                                               low_freq=f_min, high_freq=fmax)
    else:
        fb[:n_freq, :n_mels] = melscale_fbanks(
            n_freq, f_min, fmax, n_mels, sample_rate, norm=None, mel_scale="htk"
        )
    # padded mel columns stay zero; the caller's log floor keeps them out of
    # log(0) and they are sliced away after the call
    return (
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(fb),
        k, hop_pad, width_pad, n_freq_pad, n_mels_pad,
    )


def _kernel(sig_hbm, wr_ref, wi_ref, fb_ref, out_ref, sig_vmem, patch, sems,
            *, block_frames, hop_pad, k, log_floor, precision, n_blocks):
    """One (batch, frame-block) program over a flattened 1-D grid.

    The caller pre-shapes the signal as ``(B, n_sub, hop_pad)`` so every
    in-kernel view is a tile-aligned 2-D block (Mosaic has no 1-D→2-D shape
    cast): frame i = subframe rows ``[i, i + k)``, built as K shifted copies.

    Double-buffered: scratch persists across grid steps on a core, so each
    program prefetches the NEXT program's signal slice while computing its
    own (pallas_guide.md "Double Buffering") — the DMA wait is off the
    critical path for every block but the first.
    """
    i = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = sig_vmem.shape[1]  # 8-aligned subframe rows per block

    def dma_for(idx, slot):
        b = idx // n_blocks
        blk = idx % n_blocks
        return pltpu.make_async_copy(
            sig_hbm.at[b, pl.ds(blk * block_frames, rows), :],
            sig_vmem.at[slot], sems.at[slot],
        )

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(i + 1 < n_total)
    def _():
        dma_for(i + 1, next_slot).start()

    dma_for(i, slot).wait()

    # K shifted 2-D copies build the (BF, K*hop_pad) patch without gathers.
    # (Decomposing the matmul over the K shifted views instead measured
    # slower: the sublane-misaligned matmul operands cost more than these
    # copies save.)
    for j in range(k):
        patch[:, j * hop_pad:(j + 1) * hop_pad] = sig_vmem[slot, pl.ds(j, block_frames), :]

    # MXU passes accumulate in f32; DEFAULT (one bf16 pass) is ~16x faster
    # than HIGHEST (6 passes) on v5e and costs ~3e-3 mean abs error in the
    # log-mel (larger only at near-floor silence bins); golden tests request
    # precision="highest".
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    real = jnp.dot(patch[:, :], wr_ref[:, :], preferred_element_type=jnp.float32,
                   precision=prec)
    imag = jnp.dot(patch[:, :], wi_ref[:, :], preferred_element_type=jnp.float32,
                   precision=prec)
    power = real * real + imag * imag
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32,
                  precision=prec)
    out_ref[0, :, :] = jnp.log(jnp.maximum(mel, log_floor))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "win_length", "hop_length", "window", "n_mels", "sample_rate",
        "f_min", "f_max", "center", "log_floor", "block_frames", "kaldi",
        "precision",
    ),
)
def fused_logmel(
    waveforms,
    n_fft=400,
    win_length=None,
    hop_length=None,
    window="hann",
    n_mels=80,
    sample_rate=16000,
    f_min=0.0,
    f_max=None,
    center=True,
    log_floor=1e-10,
    block_frames=1024,
    kaldi=False,
    precision="default",
):
    """Fused log-mel spectrogram via a single Pallas kernel.

    Args:
        waveforms: ``(B, T)`` float32 signal.
        kaldi: if True use a symmetric (non-periodic is still fftbins) window
            placement at offset 0 (used by ``kaldi`` front-ends).

    Returns:
        ``(B, n_frames, n_mels)`` float32 natural-log mel energies
        (time-major, model-ready). ``log(max(mel, log_floor))``.
    """
    assert waveforms.ndim == 2, "fused_logmel expects (batch, time)"
    win_length = win_length or n_fft
    hop = hop_length or win_length // 2

    b, t = waveforms.shape
    if center:
        waveforms = jnp.pad(waveforms, ((0, 0), (n_fft // 2, n_fft // 2)))
        n_frames = 1 + t // hop
    else:
        n_frames = 1 + (t - n_fft) // hop

    wr, wi, fb, k, hop_pad, width_pad, n_freq_pad, n_mels_pad = _design(
        n_fft, win_length, hop, window, n_mels, sample_rate, f_min, f_max,
        kaldi,
    )

    n_blocks = pl.cdiv(n_frames, block_frames)
    frames_pad = n_blocks * block_frames
    # every block DMAs `rows` subframe rows from its start; the sublane slice
    # must be 8-aligned for Mosaic
    rows = _round_up(block_frames + k - 1, 8)
    need = ((n_blocks - 1) * block_frames + rows) * hop
    if waveforms.shape[-1] < need:
        waveforms = jnp.pad(waveforms, ((0, 0), (0, need - waveforms.shape[-1])))
    else:
        waveforms = waveforms[:, :need]
    # (B, n_sub, hop_pad): tile-aligned 2-D subframe layout (lane-padded rows)
    waveforms = waveforms.reshape(b, need // hop, hop)
    if hop_pad > hop:
        waveforms = jnp.pad(waveforms, ((0, 0), (0, 0), (0, hop_pad - hop)))
    # Pallas compiles natively on TPU only; interpret elsewhere (CPU CI).
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_frames=block_frames,
            hop_pad=hop_pad,
            k=k,
            log_floor=log_floor,
            precision=precision,
            n_blocks=n_blocks,
        ),
        grid=(b * n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # signal stays in HBM
            pl.BlockSpec((width_pad, n_freq_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width_pad, n_freq_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq_pad, n_mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_frames, n_mels_pad),
            lambda i: (i // n_blocks, i % n_blocks, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, frames_pad, n_mels_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, hop_pad), jnp.float32),   # double buffer
            pltpu.VMEM((block_frames, width_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * frames_pad * width_pad * (2 * n_freq_pad + n_mels_pad),
            bytes_accessed=4 * b * (need + frames_pad * n_mels_pad),
            transcendentals=b * frames_pad * n_mels_pad,
        ),
        interpret=interpret,
    )(waveforms, wr, wi, fb)

    return out[:, :n_frames, :n_mels]


def fused_logmel_reference(waveforms, **kwargs):
    """Pure-jnp twin of ``fused_logmel`` for golden testing / non-TPU backends."""
    from . import spectral

    n_mels = kwargs.get("n_mels", 80)
    mel = spectral.melspectrogram(
        waveforms,
        n_fft=kwargs.get("n_fft", 400),
        win_length=kwargs.get("win_length"),
        hop_length=kwargs.get("hop_length"),
        window=kwargs.get("window", "hann"),
        n_mels=n_mels,
        sample_rate=kwargs.get("sample_rate", 16000),
        f_min=kwargs.get("f_min", 0.0),
        f_max=kwargs.get("f_max"),
        center=kwargs.get("center", True),
        pad_mode="constant",
    )
    return jnp.swapaxes(
        jnp.log(jnp.maximum(mel, kwargs.get("log_floor", 1e-10))), -1, -2
    )
