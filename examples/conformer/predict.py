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

    def load_wav(u):
        x, sr = io.read(u.wav)
        x = np.asarray(x, np.float32)
        if x.ndim > 1:
            x = x[:, 0]
        if sr != SAMPLE_RATE:  # match the training collate's resample
            from mindaudio_tpu.data.processing import resample

            x = resample(x, sr, SAMPLE_RATE)
        return x

    refs, hyps = [], []
    result_path = str(cfg.decode.get("result_file", "")) or os.path.join(
        os.path.dirname(__file__), "result.txt"
    )
    utts = read_manifest(cfg.data.test_csv)

    if mode in ("ctc_greedy", "ctc_prefix_beam", "attention",
                "attention_rescoring"):
        # batched decode: utterances grouped into (bucket, B) batches feed
        # ONE encoder program per batch (and one decoder pass for all
        # B*beam rescoring hypotheses) — RTF drops ~50x vs per-utterance
        # round trips (PERF.md); greedy stays exact, beam modes identical to
        # sequential (tests/test_recognize.py TestBatchedDecode)
        decode_bs = int(cfg.decode.get("batch_size", 16))
        by_bucket = {}
        for u in utts:
            x = load_wav(u)
            n_frames = max(1, 1 + (len(x) - FRAME_LEN) // FRAME_SHIFT)
            for limit in BUCKET_FRAMES:
                if n_frames <= limit:
                    break
            if n_frames > limit:  # longer than the largest bucket
                print(f"WARNING: {u.utt_id} is {n_frames} frames; decoding "
                      f"only the first {limit} (~{limit // 100} s) — audio "
                      "past the largest bucket is dropped", file=sys.stderr)
            by_bucket.setdefault(limit, []).append((u, x))

        results = {}
        for limit, items in sorted(by_bucket.items()):
            wav_len = limit * FRAME_SHIFT + FRAME_LEN
            for i in range(0, len(items), decode_bs):
                chunk = items[i:i + decode_bs]
                wavs = np.zeros((len(chunk), wav_len), np.float32)
                lens = np.zeros((len(chunk),), np.int32)
                for j, (_, x) in enumerate(chunk):
                    n = min(len(x), wav_len)
                    wavs[j, :n] = x[:n]
                    lens[j] = n
                feats = np.asarray(fbank(jnp.asarray(wavs)))
                feat_lens = 1 + (lens - FRAME_LEN) // FRAME_SHIFT
                if mode == "ctc_greedy":
                    batch_hyps = inference.ctc_greedy_search(feats, feat_lens)[0]
                elif mode == "ctc_prefix_beam":
                    bh, _, _ = inference.ctc_prefix_beam_search_batch(
                        feats, feat_lens)
                    batch_hyps = [list(h[0][0]) for h in bh]
                elif mode == "attention":
                    batch_hyps = [h for h, _ in
                                  inference.recognize_batch(feats, feat_lens)]
                else:
                    batch_hyps = [h for h, _ in
                                  inference.attention_rescoring_batch(feats, feat_lens)]
                for (u, _), hyp_ids in zip(chunk, batch_hyps):
                    results[u.utt_id] = hyp_ids

        with open(result_path, "w", encoding="utf-8") as out:
            for u in utts:
                hyp = tokenizer.decode(results[u.utt_id])
                refs.append("".join(u.text.split()))
                hyps.append(hyp)
                out.write(f"{u.utt_id} {hyp}\n")
        score = cer(refs, hyps)
        print(f"mode={mode} utts={len(refs)} CER={100 * score:.2f}%")
        return score

    with open(result_path, "w", encoding="utf-8") as out:
        for u in utts:
            x = load_wav(u)
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
                # bound the left context: unbounded (-1) history grows the
                # attention cache — and the jit-shape set — every chunk on
                # long recordings; 128 subsampled frames ≈ 5 s context
                cache = int(cfg.decode.get("streaming_cache_size", 128))
                hyp_ids = inference.streaming_ctc_greedy(
                    chunks, required_cache_size=cache)
            else:
                raise ValueError(f"unknown decode mode {mode}")

            hyp = tokenizer.decode(hyp_ids)
            ref = "".join(u.text.split())
            refs.append(ref)
            hyps.append(hyp)
            out.write(f"{u.utt_id} {hyp}\n")

    score = cer(refs, hyps)
    print(f"mode={mode} utts={len(refs)} CER={100 * score:.2f}%")
    return score


if __name__ == "__main__":
    main()
