"""TasNet evaluation: SI-SNRi / SDRi over the test set
(counterpart of reference ``examples/tasnet/eval.py:61``).

Usage: python eval.py
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.data.librimix import separation_batch_iterator
from mindaudio_tpu.loss.separation_loss import pit_si_snr_loss
from mindaudio_tpu.metric.snr import cal_SDRi, cal_SISNRi
from mindaudio_tpu.train.checkpoint import restore_checkpoint
from mindaudio_tpu.train.config import get_config

from train import build_model, separate_full


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "tasnet.yaml"))
    model = build_model(cfg)
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    seg = int(float(cfg.data.segment_seconds) * int(cfg.data.sample_rate))

    @jax.jit
    def separate(mix, src, lengths):
        est = separate_full(model, ckpt["params"], mix)
        _, perm = pit_si_snr_loss(est, src, lengths)
        return est, jnp.take_along_axis(src, perm[:, :, None], axis=1)

    si_snri, sdri, count = 0.0, 0.0, 0
    for _, batch in separation_batch_iterator(
        cfg.data.test_dir, 1, seg, epochs=1, shuffle=False
    ):
        est, src = separate(jnp.asarray(batch["mix"]), jnp.asarray(batch["src"]),
                            jnp.asarray(batch["lengths"]))
        n = int(batch["lengths"][0])
        est = np.asarray(est)[0, :, :n]
        src = np.asarray(src)[0, :, :n]
        mix = batch["mix"][0, :n]
        si_snri += cal_SISNRi(src, est, mix)[0]
        sdri += cal_SDRi(src, est, mix)[0]
        count += 1

    print(f"utts={count} SI-SNRi={si_snri / max(count, 1):.2f} dB "
          f"SDRi={sdri / max(count, 1):.2f} dB")


if __name__ == "__main__":
    main()
