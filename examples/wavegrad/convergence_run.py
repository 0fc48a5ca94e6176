"""WaveGrad convergence artifact: held-out vocoder reconstruction numbers.

Mirrors the conformer/ECAPA/FastSpeech2 protocol (PERF.md): the vocoder is
trained by ``train.py`` on the FS2 synthetic-corpus wavs
(``examples/fastspeech2/convergence_run.py --prep_wavegrad``); this script
then evaluates it on utterances synthesized under a FRESH seed — phone
sequences, harmonic phases and noise the vocoder never saw — by vocoding
their ground-truth mels and measuring the mel-L1 between the re-analyzed
audio and the conditioning mel, for both the 1000-step ancestral sampler
and the 6-step fast schedule (WaveGrad §4). A white-noise "vocoder" row
gives the scale of the metric.

The reference ships only a checkpoint + a listening sample for WaveGrad
(reference examples/wavegrad/README.md); this measures instead.

Artifacts (committed): ``convergence/results.json``,
``convergence/loss_curve.json``.

Usage:
    python convergence_run.py --ckpt /tmp/wg_ckpt [--train_log /tmp/wg_train.log]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "../.."))
sys.path.insert(0, os.path.join(HERE, "../fastspeech2"))

# the corpus generator IS the spec of what the vocoder was trained on —
# reuse it verbatim so "held-out" differs only by seed, not by synthesis
from convergence_run import (  # noqa: E402  (examples/fastspeech2)
    HOP,
    N_FFT,
    N_MELS,
    SR,
    fs2_mel_to_wavegrad,
    synth_utterance,
)


def parse_loss_curve(log_path):
    curve = []
    pat = re.compile(r"epoch (\d+) step (\d+) loss ([\d.]+)")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                curve.append({"step": int(m.group(2)),
                              "loss": float(m.group(3))})
    return curve


def analyze_mel(wav, n_frames):
    from mindaudio_tpu.data import spectrum

    m = spectrum.melspectrogram(
        wav[: n_frames * HOP], n_fft=N_FFT, hop_length=HOP, win_length=N_FFT,
        n_mels=N_MELS, sample_rate=SR, norm="slaney", mel_type="slaney",
    )[:, :n_frames]
    return fs2_mel_to_wavegrad(np.log(np.maximum(m, 1e-5))).T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--train_log", default="")
    ap.add_argument("--n_utts", type=int, default=32)
    ap.add_argument("--seed", type=int, default=777,
                    help="fresh corpus seed: held-out utterances")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mindaudio_tpu.data import io
    from mindaudio_tpu.models.wavegrad import (
        WaveGrad,
        default_noise_schedule,
        fast_noise_schedule,
        reverse_diffusion,
    )
    from mindaudio_tpu.train.checkpoint import restore_checkpoint

    out_dir = os.path.join(HERE, "convergence")
    os.makedirs(out_dir, exist_ok=True)

    if args.train_log:
        with open(os.path.join(out_dir, "loss_curve.json"), "w") as f:
            json.dump(parse_loss_curve(args.train_log), f, indent=1)

    wg = WaveGrad()
    ckpt = restore_checkpoint(args.ckpt)
    params = (ckpt["params"]["model"]
              if "model" in ckpt["params"] else ckpt["params"])
    params = jax.device_put(params)

    def apply_fn(p, mel_b, audio, scale):
        return wg.apply({"params": p}, mel_b, audio, scale)

    # synthesize the full held-out set (mix of 8-16-phone lengths), then run
    # EACH sampler ONCE over the whole batch: mels are padded to the longest
    # utterance with the corpus silence level (mel of digital silence — the
    # vocoder is convolutional, so pad frames only touch the trimmed tail),
    # so the 1000-step scan compiles once instead of once per utterance shape
    rng = np.random.default_rng(args.seed)
    utts = []
    for i in range(args.n_utts):
        n_ph = int(rng.integers(8, 17))
        phones = rng.integers(1, 41, size=n_ph).astype(np.int32)
        wav = synth_utterance(rng, phones)
        n_frames = len(wav) // HOP
        utts.append((n_frames, analyze_mel(wav, n_frames)))
    t_max = max(n for n, _ in utts)
    pad_val = float(fs2_mel_to_wavegrad(np.log(1e-5)))
    mel_batch = np.full((len(utts), t_max, utts[0][1].shape[1]), pad_val,
                        np.float32)
    for i, (n_frames, mel) in enumerate(utts):
        mel_batch[i, :n_frames] = mel

    rows = [{"utt": i, "frames": n} for i, (n, _) in enumerate(utts)]
    for tag, betas in (("1000step", default_noise_schedule()),
                       ("fast6", fast_noise_schedule())):
        audio_b = np.asarray(reverse_diffusion(
            params, apply_fn, jnp.asarray(mel_batch),
            jax.random.PRNGKey(args.seed), betas=betas, hop=HOP,
        ), np.float32)
        for i, (n_frames, mel_gt) in enumerate(utts):
            mel_rt = analyze_mel(audio_b[i, : n_frames * HOP], n_frames)
            rows[i][f"mel_l1_{tag}"] = round(
                float(np.abs(mel_rt - mel_gt).mean()), 4)
        io.write(os.path.join(out_dir, f"sample_{tag}.wav"),
                 audio_b[0, : utts[0][0] * HOP], SR)
        print(tag, "done", flush=True)
    for i, (n_frames, mel_gt) in enumerate(utts):
        noise = rng.standard_normal(n_frames * HOP).astype(np.float32) * 0.1
        rows[i]["mel_l1_noise_baseline"] = round(
            float(np.abs(analyze_mel(noise, n_frames) - mel_gt).mean()), 4)
        print(rows[i], flush=True)

    def stat(key):
        vals = [r[key] for r in rows]
        return {"mean": round(float(np.mean(vals)), 4),
                "std": round(float(np.std(vals)), 4)}

    results = {
        "held_out_utts": len(rows),
        "mel_l1_1000step": stat("mel_l1_1000step")["mean"],
        "mel_l1_1000step_std": stat("mel_l1_1000step")["std"],
        "mel_l1_fast6": stat("mel_l1_fast6")["mean"],
        "mel_l1_fast6_std": stat("mel_l1_fast6")["std"],
        "mel_l1_noise_baseline": stat("mel_l1_noise_baseline")["mean"],
        "mel_l1_noise_baseline_std": stat("mel_l1_noise_baseline")["std"],
        "per_utt": rows,
        "config": {"ckpt": args.ckpt, "seed": args.seed,
                   "train_steps": 20000, "corpus": "fs2 synthetic (2048 utts)"},
    }
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "per_utt"},
                     indent=2))


if __name__ == "__main__":
    main()
