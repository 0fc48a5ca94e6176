"""ECAPA-TDNN VoxCeleb pipeline: chunked waveform batches + speaker labels.

TPU-first redesign of reference ``examples/ECAPA-TDNN``: the reference dumps
5x-augmented fbank features to .npy offline over many processes
(train_speaker_embeddings.py:530-609) and memmaps them back; here waveform
augmentation (speed perturb / drop_freq / drop_chunk, and optional
noise/reverb corruption — the reference's TimeDomainSpecAugment + EnvCorrupt,
spec_augment.py:180/346) happens on host at collate time and the fbank runs
on device inside the jitted train step — no feature dump, no disk churn.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Iterator, List, Optional

import numpy as np

from mindaudio_tpu.data import io
from mindaudio_tpu.data.augment import add_noise, add_reverb, drop_chunk, drop_freq, speed_perturb

SAMPLE_RATE = 16000


def read_segments(csv_path: str):
    """``ID,duration,wav,start,stop,spk_id`` rows (data/voxceleb.py)."""
    with open(csv_path, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    spk_ids = sorted({r["spk_id"] for r in rows})
    spk2label = {s: i for i, s in enumerate(spk_ids)}
    return rows, spk2label


class Augmenter:
    """Reference TimeDomainSpecAugment + EnvCorrupt on host waveforms."""

    def __init__(self, cfg, rng: np.random.Generator):
        self.cfg = cfg
        self.rng = rng
        self.noises = sorted(glob.glob(os.path.join(cfg.data.noise_folder, "*.wav"))) \
            if cfg.data.noise_folder else []
        self.rirs = sorted(glob.glob(os.path.join(cfg.data.rir_folder, "*.wav"))) \
            if cfg.data.rir_folder else []

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        cfg, rng = self.cfg, self.rng
        out = batch
        if cfg.augment.speed_perturb:
            # batch-level speed choice keeps the static shape: resample then
            # crop/pad back to the segment length. Speeds are the reference's
            # [95, 100, 105] (train_speaker_embeddings.py:655) — resampling
            # rescales the spectral envelope, i.e. the speaker identity, so
            # wider perturbs (±10%) measurably collide nearby speakers and
            # hurt verification EER.
            speed = rng.choice([95, 100, 105])
            if speed != 100:
                n = out.shape[-1]
                res = speed_perturb(out, SAMPLE_RATE, speeds=(int(speed),), rng=rng)
                fixed = np.zeros_like(out)
                m = min(n, res.shape[-1])
                fixed[..., :m] = res[..., :m]
                out = fixed
        if self.rirs:
            out = add_reverb(out, self.rirs, reverb_prob=1.0, rng=rng)
        if self.noises:
            out = add_noise(out, self.noises, 0, 15, mix_prob=1.0, rng=rng)
        if cfg.augment.drop_freq:
            out = drop_freq(out, rng=rng)
        if cfg.augment.drop_chunk:
            lengths = np.full((out.shape[0],), out.shape[-1])
            out = drop_chunk(out, lengths, rng=rng)
        return out.astype(np.float32)


def load_segment(row, seg_len: int, rng: Optional[np.random.Generator] = None
                 ) -> np.ndarray:
    """Read the row's audio and fit it to ``seg_len`` samples.

    ``stop <= start`` means "the whole file" — the convention the eval side
    (speaker_verification_cosine._read_full) and whole-utterance CSVs use; a
    literal zero-length read here silently fed all-zero waveforms to training.
    With ``rng``, a random ``seg_len`` crop is taken (training diversity);
    without, the first ``seg_len`` samples (deterministic eval).
    """
    start, stop = int(row["start"]), int(row["stop"])
    if stop > start:
        x, sr = io.read(row["wav"], offset=start / SAMPLE_RATE,
                        duration=(stop - start) / SAMPLE_RATE)
    else:
        x, sr = io.read(row["wav"])
    x = np.asarray(x, np.float32)
    if x.ndim > 1:
        x = x[:, 0]
    if rng is not None and len(x) > seg_len:
        off = int(rng.integers(0, len(x) - seg_len + 1))
        x = x[off:off + seg_len]
    out = np.zeros(seg_len, np.float32)
    n = min(len(x), seg_len)
    out[:n] = x[:n]
    return out


def batch_iterator(
    csv_path: str,
    batch_size: int,
    seg_dur: float = 3.0,
    epochs: int = 1,
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
    augmenter: Optional[Augmenter] = None,
    shuffle: bool = True,
) -> Iterator[tuple]:
    """Yields (epoch, {"wavs": (B, L), "labels": (B,)})."""
    rows, spk2label = read_segments(csv_path)
    seg_len = int(seg_dur * SAMPLE_RATE)
    for epoch in range(epochs):
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(len(rows)) if shuffle else np.arange(len(rows))
        sel = order[: (len(order) // batch_size) * batch_size].reshape(-1, batch_size)
        # multi-process DP: identical batch sequence on all ranks, each rank
        # loads its contiguous 1/world_size row block (the global batch is
        # assembled by parallel.mesh.put_global_batch)
        for batch_idx in sel:
            if world_size > 1:
                local = batch_size // world_size
                batch_idx = batch_idx[rank * local:(rank + 1) * local]
            wavs = np.stack([load_segment(rows[i], seg_len, rng=rng)
                             for i in batch_idx])
            labels = np.asarray([spk2label[rows[i]["spk_id"]] for i in batch_idx],
                                np.int32)
            if augmenter is not None:
                wavs = augmenter(wavs)
            yield epoch, {"wavs": wavs, "labels": labels}


def n_speakers(csv_path: str) -> int:
    return len(read_segments(csv_path)[1])
