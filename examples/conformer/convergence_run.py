"""Real-scale convergence run: full 46M-param Conformer, >=2k steps, on the
largest corpus constructible in-image, with eval-loss-driven checkpoint
averaging (VERDICT r1 #9).

No speech corpus ships in the image, so the corpus is a synthetic *audio
cipher*: each of 40 transcript characters maps to a distinct 140 ms harmonic
unit (fundamental + 2 partials, per-utterance speaker pitch scale, vibrato,
amplitude jitter, additive noise). The mapping audio→text is real — CER
measures actual acoustic decoding on HELD-OUT utterances, not memorization —
while staying fully reproducible. ~2 h of train audio (4096 utts), 128 dev,
128 test.

Stages (each its own process so a single run fits a bounded window;
``train`` resumes from the last checkpoint, so re-running extends the run):
    python convergence_run.py gen     [--root DIR]
    python convergence_run.py train   [--steps N] [--extra <train.py flags>]
    python convergence_run.py decode  [--root DIR] [--avg N] [--mode M]
    python convergence_run.py report  [--root DIR]

Training protocol (what actually converges — measured, see PERF.md):
    # phase 1, CTC-first: the encoder must learn frame-level acoustics
    # before the decoder gets real gradient. Training hybrid 0.3/0.7 from
    # scratch let the decoder partially memorize transcripts from
    # utterance-signature features and the encoder never escaped that
    # basin (CTC stuck at chance for 8000 steps, warm restarts included);
    # CTC-first from scratch cracks the alignment in <900 steps.
    python convergence_run.py train --steps 3000 \
        --extra --model.ctc_weight 0.99 --optim.lr 0.002
    # phase 2, hybrid: decoder learns on top of locked acoustic features
    python convergence_run.py train --steps 6000 \
        --extra --model.ctc_weight 0.5 --optim.lr 0.001

The train stage drives examples/conformer/train.py's main() unchanged (bucket
batching, on-device fbank+SpecAugment, eval-loss checkpointing); the decode
stage drives predict.py's main() with last-ckpt vs averaged-best-N. Results
accumulate in <root>/results.json; `report` prints the PERF.md table row.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "../.."))
sys.path.insert(0, HERE)

SR = 16000
VOCAB = "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可她里后"[:40]
UNIT_S = 0.14  # seconds per character unit


def _unit_wave(char_idx: int, rng: np.random.Generator, pitch_scale: float):
    """One character's audio unit: f0 + 2 partials, vibrato, ADSR envelope.

    f0 spacing is GEOMETRIC (6% per character) so the per-utterance speaker
    pitch scale (±1.5%) can never alias two characters — linear 22 Hz
    spacing with ±10% scale made neighbors acoustically identical."""
    n = int(UNIT_S * SR)
    t = np.arange(n) / SR
    f0 = 300.0 * (1.06 ** char_idx) * pitch_scale
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(4, 7) * t + rng.uniform(0, 6.28))
    phase = 2 * np.pi * np.cumsum(f0 * vib) / SR
    amp = rng.uniform(0.25, 0.45)
    x = amp * (np.sin(phase) + 0.5 * np.sin(2 * phase + rng.uniform(0, 6.28))
               + 0.25 * np.sin(3 * phase + rng.uniform(0, 6.28)))
    # ADSR-ish envelope so units don't click and boundaries carry information
    env = np.minimum(np.arange(n) / (0.015 * SR), 1.0)
    env *= np.minimum((n - np.arange(n)) / (0.03 * SR), 1.0)
    return x * env


def synth_utt(text: str, rng: np.random.Generator) -> np.ndarray:
    pitch_scale = rng.uniform(0.985, 1.015)  # per-utterance "speaker"
    parts = [np.zeros(int(rng.uniform(0.05, 0.12) * SR), np.float64)]
    for ch in text:
        parts.append(_unit_wave(VOCAB.index(ch), rng, pitch_scale))
    parts.append(np.zeros(int(rng.uniform(0.05, 0.12) * SR), np.float64))
    x = np.concatenate(parts)
    x += 10 ** (-25 / 20) * rng.standard_normal(len(x))  # ~25 dB SNR
    return (0.9 * x / np.abs(x).max()).astype(np.float32)


def gen(root: str, n_train=4096, n_dev=128, n_test=128, seed=0):
    from mindaudio_tpu.data import io

    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = {"train": [], "dev": [], "test": []}
    for split, n in (("train", n_train), ("dev", n_dev), ("test", n_test)):
        for i in range(n):
            text = "".join(rng.choice(list(VOCAB), size=rng.integers(6, 13)))
            x = synth_utt(text, rng)
            utt = f"{split}{i:05d}"
            wav = os.path.join(root, "wavs", utt + ".wav")
            io.write(wav, x, SR)
            rows[split].append((utt, len(x) / SR, wav, " ".join(text)))
    for split, items in rows.items():
        with open(os.path.join(root, f"{split}.csv"), "w", encoding="utf-8") as f:
            f.write("ID,duration,wav,transcript\n")
            for utt, dur, wav, text in items:
                f.write(f"{utt},{dur:.3f},{wav},{text}\n")
    hours = sum(r[1] for r in rows["train"]) / 3600
    print(f"generated {n_train}+{n_dev}+{n_test} utts ({hours:.2f} h train audio)")


def _args(root: str, steps: int):
    return [
        "--data.train_csv", f"{root}/train.csv",
        "--data.dev_csv", f"{root}/dev.csv",
        "--data.test_csv", f"{root}/test.csv",
        "--data.vocab_file", f"{root}/lang_char.txt",
        "--data.cmvn_file", f"{root}/global_cmvn.json",
        "--data.speed_perturb", "false",
        # SpecAugment off: cipher characters are independent (no
        # coarticulation/LM context), so a 50-frame time mask hides ~3.5
        # whole characters and puts an irreducible floor under the loss
        "--features.spec_aug", "false",
        # all utts are 0.9-2.1 s -> one (227-frame, B=64) bucket: a single
        # jitted train-step shape, MXU-aligned (t_sub = 56)
        "--data.frame_bucket_limit", "227",
        "--data.batch_bucket_limit", "64",
        "--optim.epochs", "400",
        "--optim.warmup_steps", "500",
        # 2x the AISHELL base lr: the CTC plateau→cliff transition scales
        # with lr and the Noam decay has it at ~4e-4 by step 3k
        "--optim.lr", "0.002",
        # equal CTC/attention weight: on this corpus the decoder can partially
        # memorize transcripts, starving the encoder of alignment gradient
        "--model.ctc_weight", "0.5",
        "--train.max_steps", str(steps),
        "--train.log_every_steps", "50",
        "--train.save_every_steps", "250",
        "--train.keep_checkpoint_max", "12",
        "--train.resume", "true",   # re-running the stage continues the run
        "--train.ckpt_dir", f"{root}/ckpt",
        "--decode.max_tgt_len", "16",
        "--decode.mode", "ctc_greedy",
        "--decode.result_file", f"{root}/result.txt",
    ]


def train(root: str, steps: int, extra=()):
    sys.argv = ["train.py"] + _args(root, steps) + list(extra)
    import compute_cmvn_stats

    if not os.path.exists(f"{root}/global_cmvn.json"):
        compute_cmvn_stats.main()
    import train as conformer_train

    conformer_train.main()


def decode(root: str, avg: int, mode: str = "ctc_greedy", extra=()):
    import predict

    results_path = os.path.join(root, "results.json")
    results = (json.load(open(results_path)) if os.path.exists(results_path)
               else {})
    sys.argv = (["predict.py"] + _args(root, 0)
                + ["--decode.average_num", str(avg), "--decode.mode", mode]
                + list(extra))
    cer_val = predict.main()
    key = f"{mode}_avg{avg}" if avg > 1 else f"{mode}_last"
    results[key] = cer_val
    with open(results_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{key}: CER {cer_val}")


def report(root: str):
    with open(os.path.join(root, "results.json")) as f:
        print(json.dumps(json.load(f), indent=1))


if __name__ == "__main__":
    stage = sys.argv[1]
    argv = sys.argv[2:]
    root = "/tmp/conformer_convergence"
    if "--root" in argv:
        i = argv.index("--root"); root = argv[i + 1]; del argv[i:i + 2]
    os.makedirs(root, exist_ok=True)
    if stage == "gen":
        gen(root)
    elif stage == "train":
        steps = 2400
        if "--steps" in argv:
            i = argv.index("--steps"); steps = int(argv[i + 1]); del argv[i:i + 2]
        # everything after --extra is forwarded verbatim to train.py's CLI
        extra = []
        if "--extra" in argv:
            i = argv.index("--extra"); extra = argv[i + 1:]
        train(root, steps, extra)
    elif stage == "decode":
        avg = 1
        if "--avg" in argv:
            i = argv.index("--avg"); avg = int(argv[i + 1])
        mode = "ctc_greedy"
        if "--mode" in argv:
            i = argv.index("--mode"); mode = argv[i + 1]
        extra = []
        if "--extra" in argv:
            i = argv.index("--extra"); extra = argv[i + 1:]
        decode(root, avg, mode, extra)
    elif stage == "report":
        report(root)
    else:
        raise SystemExit(f"unknown stage {stage}")
