"""Accumulate global CMVN stats over the train manifest on device.

Counterpart of reference ``examples/conformer/compute_cmvn_stats.py``:
features come from the same on-device kaldi fbank used in training, so the
stats match the training distribution exactly.

Usage: python compute_cmvn_stats.py --config conformer.yaml
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.ops.spectral import kaldi_fbank
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.utils.cmvn import CMVNAccumulator, save_cmvn
from mindaudio_tpu.utils.tokenizer import CharTokenizer

from dataset import FRAME_LEN, FRAME_SHIFT, batch_iterator, read_manifest


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "conformer.yaml"))
    utts = read_manifest(cfg.data.train_csv)
    tok = CharTokenizer.from_transcripts(u.text for u in utts)

    fbank = jax.jit(lambda w: kaldi_fbank(
        w, num_mel_bins=cfg.features.num_mel_bins,
        frame_length_ms=cfg.features.frame_length_ms,
        frame_shift_ms=cfg.features.frame_shift_ms,
    ))

    acc = CMVNAccumulator(cfg.features.num_mel_bins)
    for _, frames, batch in batch_iterator(
        cfg.data.train_csv, tok, epochs=1, speed_perturb=False,
        batch_factor=float(cfg.data.batch_factor),
    ):
        feats = np.asarray(fbank(jnp.asarray(batch["wavs"])))
        feat_lens = 1 + (batch["wav_lens"] - FRAME_LEN) // FRAME_SHIFT
        acc.update(feats, feat_lens)

    save_cmvn(cfg.data.cmvn_file, acc)
    print(f"wrote {cfg.data.cmvn_file}: {acc.frame_num} frames")


if __name__ == "__main__":
    main()
