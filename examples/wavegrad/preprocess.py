"""LJSpeech → WaveGrad training features: per-utt (audio, log-mel) .npy.

Counterpart of reference ``examples/wavegrad/preprocess.py`` (msaudio
Spectrogram + MelScale + ``_normalize``). Mel frames use hop 300 so the
vocoder's upsampling factors reconstruct the exact audio length.

Usage: python preprocess.py [--data.ljspeech_dir ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.data import io, spectrum
from mindaudio_tpu.train.config import get_config


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "wavegrad.yaml"))
    hop = int(cfg.data.hop_length)
    out_dir = cfg.data.feature_dir
    os.makedirs(out_dir, exist_ok=True)

    entries = []
    wav_dir = os.path.join(cfg.data.ljspeech_dir, "wavs")
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav"):
            continue
        utt = os.path.splitext(name)[0]
        wav, sr = io.read(os.path.join(wav_dir, name))
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav[:, 0]
        # trim to a whole number of hops so frames*hop == len(audio)
        n_frames = len(wav) // hop
        wav = wav[: n_frames * hop]
        mel = spectrum.melspectrogram(
            wav, n_fft=int(cfg.data.n_fft), hop_length=hop,
            win_length=int(cfg.data.win_length), n_mels=int(cfg.data.n_mels),
            sample_rate=sr, pad_mode="constant", power=1.0,
        )[:, :n_frames]
        # dB-normalize to [0, 1] (reference preprocess.py:27 ``_normalize``) —
        # unnormalized log-mels blow up the FiLM-conditioned UBlock outputs
        mel = 20.0 * np.log10(np.clip(mel, 1e-5, None)) - 20.0
        mel = np.clip((mel + 100.0) / 100.0, 0.0, 1.0).T.astype(np.float32)
        np.save(os.path.join(out_dir, utt + ".npy"),
                {"audio": wav, "mel": mel})
        entries.append(utt)

    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(entries))
    print(f"wrote {len(entries)} utterances to {out_dir}")


if __name__ == "__main__":
    main()
