"""Record golden DSP outputs from real audio fixtures.

Run from the repo root to (re)generate ``tests/goldens/dsp_goldens.npz``:

    JAX_PLATFORMS=cpu python tests/make_goldens.py

Inputs are the reference's own CI fixtures (real AISHELL / LibriSpeech speech
and an Aachen room impulse response, reference tests/test_spectrum.py:12-17),
read through ``mindaudio_tpu.data.io.read``. Outputs are computed by the host
NumPy parity layer at float64-free default settings plus the device ops at
HIGHEST matmul precision; ``tests/test_golden.py`` then asserts both paths
against the recorded values, so any numeric drift in either layer — or any
divergence between them — fails CI.
"""

from __future__ import annotations

import os

import numpy as np

REF_SAMPLES = "/root/reference/tests/samples"
FIXTURES = {
    "libri": os.path.join(REF_SAMPLES, "ASR", "1089-134686-0001.wav"),
    "aishell": os.path.join(REF_SAMPLES, "ASR", "BAC009S0002W0123.wav"),
    "rir": os.path.join(REF_SAMPLES, "rir",
                        "air_binaural_aula_carolina_0_1_2_90_3_16k.wav"),
}
CLIP_SECONDS = 1.5  # bounds the committed .npz size


def load_clips():
    from mindaudio_tpu.data import io, processing

    clips = {}
    for name, path in FIXTURES.items():
        x, sr = io.read(path)
        if x.ndim > 1:
            x = processing.stereo_to_mono(x.T)
        n = int(CLIP_SECONDS * sr)
        clips[name] = (np.asarray(x[:n], np.float32), sr)
    return clips


def compute_goldens():
    from mindaudio_tpu.data import features, processing, spectrum

    clips = load_clips()
    out = {}
    for name, (x, sr) in clips.items():
        out[f"{name}/wav"] = x
        out[f"{name}/sr"] = np.int64(sr)

        S = spectrum.stft(x, n_fft=512, hop_length=160)
        out[f"{name}/stft_mag"] = np.abs(S).astype(np.float32)
        y = spectrum.istft(S, n_fft=512, hop_length=160, length=len(x))
        out[f"{name}/istft_err"] = np.float32(np.max(np.abs(y - x)))

        out[f"{name}/fbank"] = features.fbank(
            x[None].astype(np.float32), n_mels=40, n_fft=400,
            sample_rate=sr)[0].astype(np.float32)
        out[f"{name}/mfcc"] = features.mfcc(
            x[None].astype(np.float32), deltas=False, context=False,
            n_mels=23, n_mfcc=20, sample_rate=sr)[0].astype(np.float32)
        out[f"{name}/resample_8k"] = processing.resample(
            x, orig_freq=sr, new_freq=8000).astype(np.float32)

    # sliding-window CMN over a real fbank (host layer)
    fb = out["libri/fbank"].T  # (time, freq)
    out["libri/cmn"] = processing.sliding_window_cmn(
        fb[None], cmn_window=100, min_cmn_window=50)[0].astype(np.float32)

    # device kaldi_fbank at HIGHEST precision (drift detection for the
    # on-device conformer front end; no host twin exists)
    import jax.numpy as jnp

    from mindaudio_tpu.ops import spectral as dsp

    x, sr = clips["aishell"]
    out["aishell/kaldi_fbank"] = np.asarray(
        dsp.kaldi_fbank(jnp.asarray(x[None]), num_mel_bins=80,
                        sample_rate=sr, precision="highest")[0],
        np.float32)
    return out


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(here, "goldens", "dsp_goldens.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    goldens = compute_goldens()
    np.savez_compressed(dst, **goldens)
    size = os.path.getsize(dst) / 1e6
    print(f"wrote {dst} ({size:.2f} MB, {len(goldens)} arrays)")


if __name__ == "__main__":
    main()
