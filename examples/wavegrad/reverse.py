"""WaveGrad inference: mel → audio by on-device reverse diffusion.

Counterpart of reference ``examples/wavegrad/reverse.py``: the reference
runs the 1000-step ancestral sampler as a host loop with one device forward
plus a NumPy update per step (reverse.py:113-131); here the whole sampler is
a single ``lax.scan`` program (models/wavegrad.py ``reverse_diffusion``).

Usage: python reverse.py --mel features.npy --output out.wav
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.data import io
from mindaudio_tpu.models.wavegrad import (
    WaveGrad,
    default_noise_schedule,
    fast_noise_schedule,
    reverse_diffusion,
)
from mindaudio_tpu.train.checkpoint import restore_checkpoint
from mindaudio_tpu.train.config import get_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mel", required=True,
                        help=".npy with (T, n_mels) log-mel, or a preprocess "
                             "feature dict containing 'mel'")
    parser.add_argument("--output", default="wavegrad_out.wav")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fast", action="store_true",
                        help="6-iteration inference schedule (~170x fewer "
                             "network evals; WaveGrad §4 — valid for any "
                             "checkpoint thanks to continuous noise-level "
                             "conditioning)")
    args, rest = parser.parse_known_args()

    cfg = get_config(os.path.join(os.path.dirname(__file__), "wavegrad.yaml"), rest)
    data = np.load(args.mel, allow_pickle=True)
    mel = data.item()["mel"] if data.dtype == object else data
    mel = jnp.asarray(mel[None], jnp.float32)

    model = WaveGrad()
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    params = (ckpt["params"]["model"]
              if "model" in ckpt["params"] else ckpt["params"])

    def apply_fn(p, mel_b, audio, scale):
        return model.apply({"params": p}, mel_b, audio, scale)

    if args.fast:
        betas = fast_noise_schedule()
    else:
        betas = default_noise_schedule(
            int(cfg.diffusion.num_steps), float(cfg.diffusion.beta_start),
            float(cfg.diffusion.beta_end),
        )
    audio = reverse_diffusion(
        params, apply_fn, mel, jax.random.PRNGKey(args.seed),
        betas=betas, hop=int(cfg.data.hop_length),
    )
    io.write(args.output, np.asarray(audio[0], np.float32),
             int(cfg.data.sample_rate))
    print(f"audio {audio.shape} -> {args.output}")


if __name__ == "__main__":
    main()
