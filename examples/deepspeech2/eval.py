"""DeepSpeech2 LibriSpeech evaluation: CTC greedy decode + CER/WER.

Counterpart of reference ``examples/deepspeech2/eval.py`` (MSGreedyDecoder +
softmax net, eval.py:17-33): greedy argmax runs in the same jitted program as
the forward; repeat/blank collapse and Levenshtein scoring stay on host.

Usage: python eval.py --config deepspeech2.yaml
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.metric.wer import cer, wer
from mindaudio_tpu.models.deepspeech2 import DeepSpeechModel
from mindaudio_tpu.train.checkpoint import restore_checkpoint
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.utils.common import remove_duplicates_and_blank

from dataset import BLANK_ID, LABELS, batch_iterator
from train import device_features


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "deepspeech2.yaml"))
    model = DeepSpeechModel(
        vocab_size=len(LABELS),
        hidden_size=int(cfg.model.hidden_size),
        num_rnn_layers=int(cfg.model.num_rnn_layers),
    )
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    @jax.jit
    def greedy(wavs, wav_lens):
        feats, feat_lens = device_features(wavs, wav_lens)
        logits, out_lens = model.apply(variables, feats, feat_lens,
                                       deterministic=True)
        return logits.argmax(-1), out_lens

    refs, hyps = [], []
    for _, batch in batch_iterator(
        cfg.data.test_manifest, int(cfg.data.batch_size), epochs=1,
        shuffle=False, drop_last=False,
    ):
        best, out_lens = greedy(jnp.asarray(batch["wavs"]),
                                jnp.asarray(batch["wav_lens"]))
        best, out_lens = np.asarray(best), np.asarray(out_lens)
        for i in range(batch["n_valid"]):
            ids = remove_duplicates_and_blank(
                best[i, : out_lens[i]].tolist(), BLANK_ID
            )
            hyps.append("".join(LABELS[t] for t in ids))
            n = batch["label_lens"][i]
            refs.append("".join(LABELS[t] for t in batch["labels"][i, :n]))

    print(f"utts={len(refs)} CER={100 * cer(refs, hyps):.2f}% "
          f"WER={100 * wer([r.split() for r in refs], [h.split() for h in hyps]):.2f}%")


if __name__ == "__main__":
    main()
