"""Conformer ASR data pipeline: bucketed batches of RAW waveforms.

TPU-first redesign of reference ``examples/conformer/dataset.py``: the
reference extracts fbank on host per batch with an mp.Pool(8)
(dataset.py:456-492) and pads features; here the collate only pads raw
audio — feature extraction (kaldi fbank), SpecAugment and CMVN run **inside
the jitted train step on device** (train.py), which is the SURVEY §3.1 hot
loop moved on-chip. Length bucketing (reference ``BucketASRDataset``
dataset.py:290) is kept: per-bucket static shapes bound the jit compile
cache exactly as they bound MindSpore graph shapes.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

from mindaudio_tpu.data import io
from mindaudio_tpu.data.processing import resample
from mindaudio_tpu.utils.common import IGNORE_ID, add_sos_eos, pad_sequence
from mindaudio_tpu.utils.tokenizer import CharTokenizer

SAMPLE_RATE = 16000
FRAME_SHIFT = 160   # 10 ms
FRAME_LEN = 400     # 25 ms

_NATIVE = None


def _native_loader():
    """Lazy-load (and build) the C++ batch wav decoder; None if unavailable."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from mindaudio_tpu import _native

            _NATIVE = _native if _native.available() else False
        except Exception:
            _NATIVE = False
    return _NATIVE or None


@dataclass
class Utt:
    utt_id: str
    wav: str
    duration: float
    text: str


def read_manifest(csv_path: str) -> List[Utt]:
    """AISHELL-style ``ID,duration,wav,transcript`` CSV (data/aishell.py)."""
    utts = []
    with open(csv_path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            utts.append(Utt(row["ID"], row["wav"], float(row["duration"]),
                            row["transcript"]))
    return utts


class BucketSampler:
    """Sort-by-duration length bucketing with per-bucket batch size
    (reference dataset.py:233-379 semantics).

    ``frame_bucket_limit[i]`` is the max fbank frame count of bucket i;
    ``batch_bucket_limit[i]`` its batch size. Yields lists of Utt whose padded
    shape is the bucket shape — a bounded set of jit signatures.
    """

    # Bucket frame limits are chosen so the 4x-subsampled length
    # t_sub = (frames//2 - 1)//2 is a multiple of 8 (here: 56, 104, 152, 200,
    # 256, 304, 376, 504, 752): odd/unaligned t_sub leaves the MXU tiling
    # padded on every attention/FFN matmul — measured 8% of the whole train
    # step at the 1000-frame bucket (PERF.md ablation t_aligned_1027).
    DEFAULT_FRAME_BUCKETS = (227, 419, 611, 803, 1027, 1219, 1507, 2019, 3011)
    DEFAULT_BATCH_BUCKETS = (96, 64, 48, 32, 24, 16, 12, 8, 4)

    def __init__(
        self,
        utts: Sequence[Utt],
        frame_bucket_limit=DEFAULT_FRAME_BUCKETS,
        batch_bucket_limit=DEFAULT_BATCH_BUCKETS,
        batch_factor: float = 1.0,
        batch_multiple: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        assert len(frame_bucket_limit) == len(batch_bucket_limit)
        self.frame_bucket_limit = list(frame_bucket_limit)
        # round to a multiple of the data-axis size so every batch shards evenly
        self.batch_bucket_limit = [
            max(batch_multiple,
                int(b * batch_factor) // batch_multiple * batch_multiple)
            for b in batch_bucket_limit
        ]
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

        buckets: List[List[Utt]] = [[] for _ in frame_bucket_limit]
        for u in sorted(utts, key=lambda u: u.duration):
            n_frames = 1 + int(u.duration * SAMPLE_RATE - FRAME_LEN) // FRAME_SHIFT
            for i, limit in enumerate(self.frame_bucket_limit):
                if n_frames <= limit:
                    buckets[i].append(u)
                    break
            # utterances longer than the last bucket are dropped (reference
            # drops >30 s utterances the same way)
        self.buckets = buckets

    def __iter__(self) -> Iterator[tuple]:
        """Yield ``(bucket_idx, [Utt])`` batches.

        Multi-process DP splits WITHIN each batch, not across batches: every
        rank iterates the identical (seed-deterministic) batch sequence and
        takes its contiguous ``1/world_size`` row block (reference
        dataset.py:553-556 ``batch[rank::group_size]`` semantics). Striding
        whole batches across ranks would hand different ranks different
        bucket SHAPES — the per-rank shards of one global array must agree,
        so the global batch must be one bucket's shape on every rank.
        """
        rng = np.random.default_rng(self.seed)
        batches = []
        for i, bucket in enumerate(self.buckets):
            order = rng.permutation(len(bucket)) if self.shuffle else range(len(bucket))
            bs = self.batch_bucket_limit[i]
            chunk = []
            for j in order:
                chunk.append(bucket[j])
                if len(chunk) == bs:
                    batches.append((i, chunk))
                    chunk = []
            # tail dropped: static shapes need full batches
        if self.shuffle:
            rng.shuffle(batches)
        for i, chunk in batches:
            if self.world_size > 1:
                local = len(chunk) // self.world_size
                chunk = chunk[self.rank * local:(self.rank + 1) * local]
            yield i, chunk

    def __len__(self):
        n = 0
        for i, bucket in enumerate(self.buckets):
            n += len(bucket) // self.batch_bucket_limit[i]
        return n


def collate(
    utts: Sequence[Utt],
    tokenizer: CharTokenizer,
    bucket_frames: int,
    max_label_len: int = 30,
    speed_perturb: bool = False,
    rng: Optional[np.random.Generator] = None,
):
    """Read + pad raw audio and tokenize labels into the ASRModel batch dict.

    Audio is padded to the bucket's static length
    ``bucket_frames * FRAME_SHIFT + FRAME_LEN`` so every batch from one bucket
    compiles once. Speed perturb (0.9/1.0/1.1, reference dataset.py:398)
    happens here on host — it changes the length, so it must precede padding.
    """
    rng = rng or np.random.default_rng()
    wav_len = bucket_frames * FRAME_SHIFT + FRAME_LEN
    n_utts = len(utts)

    # fast path: C++ thread-pool batch decode (mindaudio_tpu/_native); the
    # NumPy path covers resampling/odd formats and missing toolchains
    native_batch = None
    if not speed_perturb and _native_loader() is not None:
        wavs, wav_lens, rates = _native_loader().wav_read_batch(
            [u.wav for u in utts], wav_len
        )
        if (rates == SAMPLE_RATE).all():
            native_batch = (wavs, wav_lens.astype(np.int32))

    if native_batch is not None:
        wavs, wav_lens = native_batch
    else:
        wavs = np.zeros((n_utts, wav_len), np.float32)
        wav_lens = np.zeros((n_utts,), np.int32)
        for i, u in enumerate(utts):
            x, sr = io.read(u.wav)
            x = np.asarray(x, np.float32)
            if x.ndim > 1:
                x = x[:, 0]
            if sr != SAMPLE_RATE:
                x = resample(x, sr, SAMPLE_RATE)
            if speed_perturb:
                speed = rng.choice([0.9, 1.0, 1.1])
                if speed != 1.0:
                    x = resample(x, int(SAMPLE_RATE * speed), SAMPLE_RATE)
            n = min(len(x), wav_len)
            wavs[i, :n] = x[:n]
            wav_lens[i] = n

    labels = [np.asarray(tokenizer.encode(u.text), np.int32) for u in utts]

    # ship int16 PCM, not f32: halves host->device bytes (PCIe / the remote
    # tunnel is the real-pipeline bottleneck, not the 23 ms compute). The
    # sources are 16-bit WAVs, so round(x * 32768) is the original samples;
    # kaldi_fbank accepts integer input directly (ops/spectral.py)
    wavs = np.clip(np.round(wavs * 32768.0), -32768, 32767).astype(np.int16)

    ys_pad = pad_sequence(labels, padding_value=IGNORE_ID, max_len=max_label_len)
    ys_in, ys_out = add_sos_eos(ys_pad, tokenizer.sos, tokenizer.eos)
    label_lens = np.asarray([min(len(l), max_label_len) for l in labels], np.int32)
    return {
        "wavs": wavs,
        "wav_lens": wav_lens,
        "labels": np.where(ys_pad == IGNORE_ID, 0, ys_pad).astype(np.int32),
        "label_lens": label_lens,
        "ys_in": ys_in.astype(np.int32),
        "ys_out": ys_out.astype(np.int32),
        "ys_lens": label_lens + 1,
    }


def batch_iterator(
    manifest_csv: str,
    tokenizer: CharTokenizer,
    epochs: int = 1,
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
    speed_perturb: bool = True,
    batch_factor: float = 1.0,
    batch_multiple: int = 1,
    max_label_len: int = 30,
    frame_bucket_limit=None,
    batch_bucket_limit=None,
):
    """Epoch-looped stream of (bucket_frames, batch dict)."""
    utts = read_manifest(manifest_csv)
    buckets = {}
    if frame_bucket_limit is not None:
        buckets["frame_bucket_limit"] = [int(f) for f in frame_bucket_limit]
    if batch_bucket_limit is not None:
        buckets["batch_bucket_limit"] = [int(b) for b in batch_bucket_limit]
    for epoch in range(epochs):
        sampler = BucketSampler(
            utts, shuffle=True, seed=seed + epoch, rank=rank,
            world_size=world_size, batch_factor=batch_factor,
            batch_multiple=batch_multiple, **buckets,
        )
        rng = np.random.default_rng(seed + epoch)
        for bucket_idx, batch_utts in sampler:
            frames = sampler.frame_bucket_limit[bucket_idx]
            yield epoch, frames, collate(
                batch_utts, tokenizer, frames,
                max_label_len=max_label_len,
                speed_perturb=speed_perturb, rng=rng,
            )
