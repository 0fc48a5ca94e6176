"""FastSpeech2 inference: text → mel (.npy), optionally vocoded by WaveGrad.

Counterpart of reference ``examples/fastspeech2/generate.py``.
Usage: python generate.py --text "hello world" [--wavegrad_ckpt ./ckpt_wavegrad]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.train.checkpoint import restore_checkpoint
from mindaudio_tpu.train.config import get_config

from text import load_cmudict, pinyin_to_sequence, text_to_sequence
from train import build_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", default="the quick brown fox jumps over the lazy dog")
    parser.add_argument("--pinyin", action="store_true",
                        help="treat --text as tone-numbered Mandarin pinyin "
                        "('ni3 hao3'); counterpart of the reference's "
                        "pypinyin Chinese path (reference generate.py:60-66)")
    parser.add_argument("--output", default="generated_mel.npy")
    parser.add_argument("--wavegrad_ckpt", default="")
    args, rest = parser.parse_known_args()

    cfg = get_config(os.path.join(os.path.dirname(__file__), "fastspeech2.yaml"),
                     rest)
    fs2, _ = build_model(cfg)
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    # FastSpeech2WithLoss wraps the model under the 'model' scope
    params = ckpt["params"]["model"] if "model" in ckpt["params"] else ckpt["params"]

    # --pinyin, or a model preprocessed/trained with data.pinyin: true
    if args.pinyin or bool(getattr(cfg.data, "pinyin", False)):
        seq = np.asarray(pinyin_to_sequence(args.text), np.int32)
    else:
        cmudict = load_cmudict(cfg.data.cmudict_path) if cfg.data.cmudict_path else None
        seq = np.asarray(text_to_sequence(args.text, cmudict=cmudict), np.int32)
    phonemes = jnp.asarray(seq[None])
    src_lens = jnp.asarray([len(seq)], jnp.int32)

    mel, _, _, _, mel_len, _ = fs2.apply(
        {"params": params}, phonemes, src_lens, int(cfg.data.max_mel_len),
        method=fs2.infer,
    )
    n = int(mel_len[0])
    mel = np.asarray(mel)[0, :n]
    np.save(args.output, mel)
    print(f"mel: {mel.shape} -> {args.output}")

    if args.wavegrad_ckpt:
        from mindaudio_tpu.models.wavegrad import WaveGrad, reverse_diffusion

        wg = WaveGrad()  # hop = prod(up_factors) = 300
        wg_ckpt = restore_checkpoint(args.wavegrad_ckpt)
        wg_params = (wg_ckpt["params"]["model"]
                     if "model" in wg_ckpt["params"] else wg_ckpt["params"])

        # compatibility: the vocoder consumes [0,1] dB-normalized mels at
        # hop 300 (wavegrad preprocess convention); FastSpeech2 must be
        # preprocessed/trained with matching hop and mel count to vocode
        wg_mels = wg_params["u_conv"]["kernel"].shape[1]
        if int(cfg.data.hop_length) != 300 or mel.shape[-1] != wg_mels:
            raise SystemExit(
                f"vocoder mismatch: FastSpeech2 mel ({mel.shape[-1]} bins, "
                f"hop {cfg.data.hop_length}) vs WaveGrad ({wg_mels} bins, "
                "hop 300). Re-run both preprocess steps with data.n_mels="
                f"{wg_mels} and data.hop_length=300."
            )
        # FS2 stores ln(power-mel); WaveGrad trains on [0,1] dB magnitude:
        # db = 10*log10(power) = 10*m/ln(10); normalized (db + 80) / 100
        mel_db = np.clip((10.0 * mel / np.log(10.0) - 20.0 + 100.0) / 100.0,
                         0.0, 1.0).astype(np.float32)

        def apply_fn(params, mel_b, audio, scale):
            return wg.apply({"params": params}, mel_b, audio, scale)

        audio = reverse_diffusion(
            wg_params, apply_fn, jnp.asarray(mel_db[None]),
            jax.random.PRNGKey(0), hop=300,
        )
        from mindaudio_tpu.data import io

        wav_path = os.path.splitext(args.output)[0] + ".wav"
        io.write(wav_path, np.asarray(audio[0], np.float32),
                 int(cfg.data.sample_rate))
        print(f"audio -> {wav_path}")


if __name__ == "__main__":
    main()
