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

from text import load_cmudict, text_to_sequence
from train import build_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", default="the quick brown fox jumps over the lazy dog")
    parser.add_argument("--output", default="generated_mel.npy")
    parser.add_argument("--wavegrad_ckpt", default="")
    args, rest = parser.parse_known_args()

    cfg = get_config(os.path.join(os.path.dirname(__file__), "fastspeech2.yaml"),
                     rest)
    fs2, _ = build_model(cfg)
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    # FastSpeech2WithLoss wraps the model under the 'model' scope
    params = ckpt["params"]["model"] if "model" in ckpt["params"] else ckpt["params"]

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

        def apply_fn(params, mel_b, audio, scale):
            return wg.apply({"params": params}, mel_b, audio, scale)

        audio = reverse_diffusion(
            wg_ckpt["params"], apply_fn, jnp.asarray(mel[None]),
            jax.random.PRNGKey(0), hop=300,
        )
        from mindaudio_tpu.data import io

        wav_path = os.path.splitext(args.output)[0] + ".wav"
        io.write(wav_path, np.asarray(audio[0], np.float32),
                 int(cfg.data.sample_rate))
        print(f"audio -> {wav_path}")


if __name__ == "__main__":
    main()
