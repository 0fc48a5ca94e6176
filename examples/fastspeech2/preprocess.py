"""LJSpeech → FastSpeech2 features (phonemes, mel, pitch, energy, duration).

Counterpart of reference ``examples/fastspeech2/preprocess.py``
(``get_fs2_features`` :74: pyworld pitch + MFA TextGrid durations).
Self-contained equivalents (neither pyworld nor the textgrid package is in
the image):

- pitch: YIN f0 (``mindaudio_tpu.data.features.yin``, vectorized NumPy),
  averaged per phoneme span;
- duration + phoneme sequence: real MFA ``<utt>.TextGrid`` files are parsed
  from ``<feature_dir>/TextGrid`` (``mindaudio_tpu.data.textgrid``) — the
  wav is trimmed to the aligned span and phones come from the alignment,
  exactly like the reference; a pre-converted ``<utt>.npy`` duration array
  is accepted as a fallback, and with no alignment at all mel frames are
  split uniformly across the transcript's phonemes (pipeline bring-up mode).

Writes per-utt ``<utt>.npy`` dicts + ``train.txt`` list.
Usage: python preprocess.py [--data.ljspeech_dir ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.data import io, spectrum
from mindaudio_tpu.data.features import yin
from mindaudio_tpu.data.textgrid import alignment_to_durations, read_textgrid
from mindaudio_tpu.train.config import get_config

from text import load_cmudict, phones_to_sequence, pinyin_to_sequence, text_to_sequence


def phoneme_average(frame_values, durations):
    """Average frame-level values over phoneme spans (FastSpeech2 convention)."""
    out = np.zeros(len(durations), np.float32)
    pos = 0
    for i, d in enumerate(durations):
        d = int(d)
        if d > 0:
            out[i] = frame_values[pos: pos + d].mean()
        pos += d
    return out


def uniform_durations(n_phones, n_frames):
    edges = np.linspace(0, n_frames, n_phones + 1)
    return np.diff(np.round(edges)).astype(np.int32)


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "fastspeech2.yaml"))
    sr = int(cfg.data.sample_rate)
    hop = int(cfg.data.hop_length)
    out_dir = cfg.data.feature_dir
    os.makedirs(out_dir, exist_ok=True)
    cmudict = load_cmudict(cfg.data.cmudict_path) if cfg.data.cmudict_path else None
    tg_dir = os.path.join(out_dir, "TextGrid")

    entries = []
    meta = os.path.join(cfg.data.ljspeech_dir, "metadata.csv")
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 2:
                continue
            utt, text = parts[0], parts[-1]
            wav_path = os.path.join(cfg.data.ljspeech_dir, "wavs", utt + ".wav")
            if not os.path.exists(wav_path):
                continue
            wav, wav_sr = io.read(wav_path)
            wav = np.asarray(wav, np.float32)
            if wav.ndim > 1:
                wav = wav[:, 0]

            # MFA alignment: phones + durations from the TextGrid, wav
            # trimmed to the aligned span (reference get_fs2_features :74)
            tg_path = os.path.join(tg_dir, utt + ".TextGrid")
            tg_durations = None
            if os.path.exists(tg_path):
                tiers = read_textgrid(tg_path)
                tier = tiers.get("phones") or next(iter(tiers.values()), [])
                phones, durs, start_s, end_s = alignment_to_durations(
                    tier, wav_sr, hop)
                if not phones:
                    continue
                wav = wav[int(round(start_s * wav_sr)):
                          int(round(end_s * wav_sr))]
                phonemes = np.asarray(phones_to_sequence(phones), np.int32)
                tg_durations = np.asarray(durs, np.int32)
            # data.pinyin: transcripts are tone-numbered Mandarin pinyin
            # (the training-side counterpart of generate.py --pinyin)
            elif bool(getattr(cfg.data, "pinyin", False)):
                phonemes = np.asarray(pinyin_to_sequence(text), np.int32)
            else:
                phonemes = np.asarray(text_to_sequence(text, cmudict=cmudict), np.int32)
            if len(phonemes) == 0:
                continue

            mel = spectrum.melspectrogram(
                wav, n_fft=int(cfg.data.n_fft), hop_length=hop,
                win_length=int(cfg.data.win_length),
                n_mels=int(cfg.data.n_mels), sample_rate=wav_sr,
                pad_mode="constant",
            )  # (n_mels, T)
            mel = np.log(np.maximum(mel, 1e-5)).T.astype(np.float32)  # (T, n_mels)
            n_frames = mel.shape[0]

            tg = os.path.join(tg_dir, utt + ".npy")
            if tg_durations is not None:
                durations = tg_durations
            elif os.path.exists(tg):
                durations = np.load(tg).astype(np.int32)
                durations = durations[: len(phonemes)]
                if len(durations) < len(phonemes):
                    durations = np.pad(durations, (0, len(phonemes) - len(durations)))
            else:
                durations = uniform_durations(len(phonemes), n_frames)
            # clamp into the mel frame budget: durations summing past
            # n_frames would make phoneme_average take empty slices -> NaN
            cum = np.cumsum(durations.astype(np.int64))
            durations = np.where(
                cum <= n_frames, durations,
                np.maximum(n_frames - (cum - durations), 0),
            ).astype(np.int32)

            # log1p keeps pitch in the variance-adaptor bin range
            # (VarianceAdaptor.pitch_range ≈ (-2.9, 11.4)); raw Hz would swamp
            # the MSE pitch loss term, and YIN's unvoiced zeros stay zero
            f0_hz = yin(wav, sample_rate=wav_sr, hop_length=hop)
            f0 = np.log1p(np.pad(f0_hz, (0, max(0, n_frames - len(f0_hz))))[:n_frames])
            energy = np.sqrt(
                np.add.reduceat(
                    np.pad(wav, (0, max(0, n_frames * hop - len(wav)))) ** 2,
                    np.arange(0, n_frames * hop, hop),
                ) / hop
            ).astype(np.float32)

            np.save(os.path.join(out_dir, utt + ".npy"), {
                "phonemes": phonemes,
                "mel": mel,
                "pitch": phoneme_average(f0, durations),
                "energy": phoneme_average(energy, durations),
                "duration": durations,
            })
            entries.append(utt)

    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(entries))
    print(f"wrote {len(entries)} utterances to {out_dir}")


if __name__ == "__main__":
    main()
