"""Conformer AISHELL-1 decoding + CER.

Counterpart of reference ``examples/conformer/predict.py:37``: loads a
(possibly parameter-averaged) checkpoint, decodes the test manifest with one
of the four modes (utils/recognize.py), and reports CER against the
transcripts.

Usage:
    python predict.py --config conformer.yaml [--decode.mode ctc_greedy]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.metric.wer import cer
from mindaudio_tpu.ops.spectral import kaldi_fbank
from mindaudio_tpu.train.checkpoint import (
    average_checkpoints,
    list_steps,
    restore_checkpoint,
)
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.utils.recognize import ASRInference
from mindaudio_tpu.utils.tokenizer import CharTokenizer

from dataset import BucketSampler, FRAME_LEN, FRAME_SHIFT, SAMPLE_RATE, read_manifest
from train import build_model

BUCKET_FRAMES = BucketSampler.DEFAULT_FRAME_BUCKETS  # MXU-aligned t_sub


def pad_to_bucket(x: np.ndarray):
    """Pad one waveform to the smallest bucket length (bounded jit cache)."""
    n_frames = max(1, 1 + (len(x) - FRAME_LEN) // FRAME_SHIFT)
    for limit in BUCKET_FRAMES:
        if n_frames <= limit:
            break
    wav_len = limit * FRAME_SHIFT + FRAME_LEN
    out = np.zeros((1, wav_len), np.float32)
    out[0, : len(x)] = x[:wav_len]
    return out, np.asarray([min(len(x), wav_len)], np.int32)


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "conformer.yaml"))
    tokenizer = CharTokenizer.from_file(cfg.data.vocab_file)
    model = build_model(cfg, tokenizer.vocab_size)

    avg_n = int(cfg.decode.average_num)
    ckpt_dir = cfg.train.ckpt_dir
    if avg_n > 1:
        # eval-loss-driven selection when training recorded scores (the
        # published reference CER decodes avg_30 of the best-by-eval-loss
        # checkpoints, callback.py:401-433); last-N otherwise
        from mindaudio_tpu.train.checkpoint import load_scores

        scores = load_scores(ckpt_dir)
        if bool(cfg.decode.get("average_best", True)) and scores:
            on_disk = set(list_steps(ckpt_dir))
            ranked = [s for s, _ in sorted(scores.items(), key=lambda kv: kv[1])
                      if s in on_disk]
            steps = sorted(ranked[:avg_n])
        else:
            steps = list_steps(ckpt_dir)[-avg_n:]
        print(f"averaging checkpoints: {steps}")
        ckpt = average_checkpoints(ckpt_dir, steps)
    else:
        ckpt = restore_checkpoint(ckpt_dir)
    variables = {"params": ckpt["params"]}

    inference = ASRInference(
        model, variables,
        beam_size=int(cfg.decode.beam_size),
        ctc_weight=float(cfg.decode.ctc_weight),
        max_tgt_len=int(cfg.decode.max_tgt_len),
        sos=tokenizer.sos, eos=tokenizer.eos,
    )
    fbank = jax.jit(lambda w: kaldi_fbank(
        w, num_mel_bins=cfg.features.num_mel_bins,
        frame_length_ms=cfg.features.frame_length_ms,
        frame_shift_ms=cfg.features.frame_shift_ms,
    ))
    mode = cfg.decode.mode

    from mindaudio_tpu.data import io

    refs, hyps = [], []
    result_path = str(cfg.decode.get("result_file", "")) or os.path.join(
        os.path.dirname(__file__), "result.txt"
    )
    with open(result_path, "w", encoding="utf-8") as out:
        for u in read_manifest(cfg.data.test_csv):
            x, sr = io.read(u.wav)
            x = np.asarray(x, np.float32)
            if x.ndim > 1:
                x = x[:, 0]
            if sr != SAMPLE_RATE:  # match the training collate's resample
                from mindaudio_tpu.data.processing import resample

                x = resample(x, sr, SAMPLE_RATE)
            wavs, wav_lens = pad_to_bucket(x)
            feats = np.asarray(fbank(jnp.asarray(wavs)))
            feat_lens = 1 + (wav_lens - FRAME_LEN) // FRAME_SHIFT

            if mode == "streaming":
                # chunked incremental decode (model must be trained with
                # use_dynamic_chunk/causal_conv); chunk = decode.chunk_size
                # subsampled frames
                C = int(cfg.decode.get("chunk_size", 16))
                raw = int(feat_lens[0])  # decode valid frames, not bucket pad
                chunks = [
                    feats[:, lo: lo + 4 * C + 3]
                    for lo in range(0, max(raw - 3, 1), 4 * C)
                    if lo + 7 <= raw
                ]
                hyp_ids = inference.streaming_ctc_greedy(chunks)
            elif mode == "ctc_greedy":
                hyp_ids = inference.ctc_greedy_search(feats, feat_lens)[0][0]
            elif mode == "ctc_prefix_beam":
                hyp_ids = list(
                    inference.ctc_prefix_beam_search(feats, feat_lens)[0][0][0]
                )
            elif mode == "attention":
                hyp_ids = inference.recognize(feats, feat_lens)[0]
            else:  # attention_rescoring
                hyp_ids = inference.attention_rescoring(feats, feat_lens)[0]

            hyp = tokenizer.decode(hyp_ids)
            ref = "".join(u.text.split())
            refs.append(ref)
            hyps.append(hyp)
            out.write(f"{u.utt_id} {hyp}\n")

    score = cer(refs, hyps)
    print(f"mode={mode} utts={len(refs)} CER={100 * score:.2f}%")


if __name__ == "__main__":
    main()
