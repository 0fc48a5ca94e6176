"""DeepSpeech2 LibriSpeech data pipeline: padded raw waveforms + char labels.

TPU-first redesign of reference ``examples/deepspeech2/dataset.py``: the
reference computes log1p(|STFT|) on host per utterance and pads features to
fixed 1250/3500 frames ("MindSpore does not support dynamic shape",
dataset.py:10-15); here the collate pads raw audio into a small set of
length buckets and the spectrogram + per-utterance normalization run inside
the jitted train step (train.py). Labels are the reference's 29-char English
set with ``_`` = CTC blank (deepspeech2.yaml:50-51).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Tuple

import numpy as np

from mindaudio_tpu.data import io

LABELS = [
    "'", "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
    "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z", " ", "_",
]
BLANK_ID = LABELS.index("_")
CHAR2ID = {c: i for i, c in enumerate(LABELS)}

SAMPLE_RATE = 16000
WINDOW_SIZE = 0.02   # 20 ms -> n_fft 320 (reference deepspeech2.yaml audio_conf)
WINDOW_STRIDE = 0.01
N_FFT = int(SAMPLE_RATE * WINDOW_SIZE)
HOP = int(SAMPLE_RATE * WINDOW_STRIDE)

# frame buckets (reference pads everything to 1250 train / 3500 test frames;
# buckets waste less MXU time on short utterances)
FRAME_BUCKETS = (400, 800, 1250, 2000, 3500)
MAX_LABEL_LEN = 350  # reference TRAIN_LABEL_PAD_LENGTH


def read_manifest(manifest_json: str) -> List[Tuple[str, str]]:
    """``libri_*_manifest.json`` → [(wav_path, txt_path)] absolute paths."""
    with open(manifest_json, encoding="utf-8") as f:
        data = json.load(f)
    root = data["data_path"]
    return [
        (os.path.join(root, s["wav_path"]), os.path.join(root, s["txt_path"]))
        for s in data["samples"]
    ]


def encode_transcript(txt_path: str) -> np.ndarray:
    with open(txt_path, encoding="utf-8") as f:
        text = f.read().replace("\n", "")
    ids = [CHAR2ID[c] for c in text.upper() if c in CHAR2ID]
    return np.asarray(ids, np.int32)


def _bucket_for(n_frames: int) -> int:
    for limit in FRAME_BUCKETS:
        if n_frames <= limit:
            return limit
    return FRAME_BUCKETS[-1]


def batch_iterator(
    manifest_json: str,
    batch_size: int,
    epochs: int = 1,
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Duration-sorted bucketed batches of raw audio.

    Yields dicts: ``wavs (B, bucket*HOP + N_FFT) f32``, ``wav_lens``,
    ``labels (B, MAX_LABEL_LEN)``, ``label_lens``, ``n_valid`` (int; rows past
    it are repeats padding the final batch when ``drop_last=False`` — eval
    must use it, training keeps static full batches with ``drop_last=True``).
    """
    samples = read_manifest(manifest_json)
    # sort by file size as a duration proxy (avoids reading headers twice)
    samples = sorted(samples, key=lambda p: os.path.getsize(p[0]))

    for epoch in range(epochs):
        rng = np.random.default_rng(seed + epoch)
        batches = [
            samples[i: i + batch_size]
            for i in range(0, len(samples) - batch_size + 1, batch_size)
        ]
        tail = len(samples) % batch_size
        tail_group_obj = None
        if tail and not drop_last:
            # pad the last batch to the static size by repeating its last row
            group = samples[-tail:]
            group = group + [group[-1]] * (batch_size - tail)
            batches.append(group)
            tail_group_obj = group
        if shuffle:
            rng.shuffle(batches)
        # multi-process DP: all ranks iterate the SAME batch sequence; the
        # bucket shape comes from header-probed lengths of the WHOLE group
        # (ranks must agree on the global batch shape), then each rank decodes
        # only its contiguous 1/world_size row block
        for group in batches:
            tail_group = group is tail_group_obj
            if world_size > 1:
                # header-probe the WHOLE group (ranks must agree on the
                # global batch shape), then decode only this rank's block
                max_frames = 1
                for wav_path, _ in group:
                    n_samp, sr, _, _ = io.info(wav_path)
                    max_frames = max(max_frames, 1 + n_samp // HOP)
                local = len(group) // world_size
                group = group[rank * local:(rank + 1) * local]
            wavs_raw, labels_raw = [], []
            for wav_path, txt_path in group:
                x, sr = io.read(wav_path)
                x = np.asarray(x, np.float32)
                if x.ndim > 1:
                    x = x[:, 0]
                wavs_raw.append(x)
                labels_raw.append(encode_transcript(txt_path))
            if world_size == 1:
                # single process: the decoded audio already gives the
                # lengths — no second header pass over every file
                max_frames = max(
                    [1] + [1 + len(x) // HOP for x in wavs_raw])
            bucket = _bucket_for(max_frames)
            wav_len = bucket * HOP
            wavs = np.zeros((len(group), wav_len), np.float32)
            wav_lens = np.zeros((len(group),), np.int32)
            labels = np.zeros((len(group), MAX_LABEL_LEN), np.int32)
            label_lens = np.zeros((len(group),), np.int32)
            for i, (x, y) in enumerate(zip(wavs_raw, labels_raw)):
                n = min(len(x), wav_len)
                wavs[i, :n] = x[:n]
                wav_lens[i] = n
                m = min(len(y), MAX_LABEL_LEN)
                labels[i, :m] = y[:m]
                label_lens[i] = m
            out = {
                "wavs": wavs, "wav_lens": wav_lens,
                "labels": labels, "label_lens": label_lens,
            }
            if not drop_last:
                # host-only key (eval slices by it); omitted for training so
                # the whole dict can be device_put with batch sharding
                out["n_valid"] = tail if tail_group else batch_size
            yield epoch, out
