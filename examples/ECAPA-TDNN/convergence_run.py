"""ECAPA-TDNN convergence run: train to a real EER on one chip.

Mirrors the conformer cipher-corpus protocol (PERF.md): a synthetic
multi-speaker corpus with DISTINCT per-speaker spectral envelopes (random
formant stacks + spectral tilt — the vocal-tract analogue) but OVERLAPPING
per-utterance excitation (f0, noise, amplitude modulation), so speaker
identity is only recoverable from the envelope, the quantity ECAPA-TDNN
embeds. Training goes through the real recipe path
(``train_speaker_embeddings.main``) with augmentation on, evaluation
through ``speaker_verification_cosine.main`` with adaptive s-norm
(reference speaker_verification_cosine.py:572-668 protocol).

Artifacts (committed): ``convergence/results.json`` (EER with/without
s-norm, config) and ``convergence/scores.npz`` (cosine score
distributions for the positive/negative trials).

Usage (real chip or CPU mesh):
    python convergence_run.py [--steps 900] [--speakers 32]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "../.."))
sys.path.insert(0, HERE)

from mindaudio_tpu.data import io  # noqa: E402

SR = 16000


def _speaker_filter(rng, existing=None, min_dist=0.35):
    """A speaker = 4 formant resonators + spectral tilt (sos coefficients).

    ``existing`` holds prior speakers' log-formant vectors; candidates are
    rejection-sampled until the min L1 log-distance to every prior speaker
    is >= ``min_dist`` — the corpus analogue of real speakers being distinct
    people (two VoxCeleb speakers never share a vocal tract). Without this,
    uniform draws collide for some pairs and those pairs dominate the EER.
    """
    from scipy.signal import butter

    for _ in range(1000):
        formants = np.sort(rng.uniform(300, 3600, size=4))
        lf = np.log(formants)
        if existing is None or not existing or min(
                float(np.abs(lf - e).sum()) for e in existing) >= min_dist:
            break
    if existing is not None:
        existing.append(lf)
    bws = rng.uniform(60, 180, size=4)
    sos = []
    for f, bw in zip(formants, bws):
        r = np.exp(-np.pi * bw / SR)
        theta = 2 * np.pi * f / SR
        # resonator biquad: poles at r*e^{±j theta}
        sos.append([1.0, 0.0, 0.0, 1.0, -2 * r * np.cos(theta), r * r])
    tilt = butter(1, rng.uniform(800, 4000) / (SR / 2), btype="low",
                  output="sos")
    return np.concatenate([np.asarray(sos), tilt], axis=0)


def _utterance(rng, spk_sos, seconds):
    """Excitation (pulse train at utterance-random f0 + noise) through the
    speaker's filter; per-utterance AM and gain."""
    from scipy.signal import sosfilt

    n = int(seconds * SR)
    f0 = rng.uniform(85, 240)  # overlapping range: f0 is NOT identity
    jitter = 1.0 + 0.02 * np.cumsum(rng.standard_normal(n)) / np.sqrt(n)
    phase = np.cumsum(f0 * jitter) / SR
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float32)
    excitation = pulses + 0.05 * rng.standard_normal(n).astype(np.float32)
    x = sosfilt(spk_sos, excitation).astype(np.float32)
    am = 0.7 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0)
                            * np.arange(n) / SR + rng.uniform(0, 6.28))
    x = x * am.astype(np.float32)
    x = x / (np.abs(x).max() + 1e-9) * rng.uniform(0.3, 0.8)
    return x.astype(np.float32)


def make_corpus(root, n_speakers, n_train=14, n_enrol=2, n_test=2, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = {"train": [], "enrol": [], "test": []}
    seen_envelopes = []
    for s in range(n_speakers):
        spk = f"spk{s:03d}"
        sos = _speaker_filter(rng, existing=seen_envelopes)
        counts = [("train", n_train), ("enrol", n_enrol), ("test", n_test)]
        u = 0
        for split, cnt in counts:
            for _ in range(cnt):
                # VoxCeleb-like utterance lengths; training crops seg_dur=3 s
                # regardless, eval embeds the full utterance — longer eval
                # utterances sharpen the per-utterance envelope estimate
                seconds = float(rng.uniform(4.0, 8.0))
                x = _utterance(rng, sos, seconds)
                utt_id = f"{spk}--u{u:03d}"
                path = os.path.join(root, "wav", f"{spk}_u{u:03d}.wav")
                io.write(path, x, SR)
                rows[split].append({
                    "ID": utt_id, "duration": f"{seconds:.2f}", "wav": path,
                    "start": "0", "stop": "0", "spk_id": spk,
                })
                u += 1
    for split, rs in rows.items():
        with open(os.path.join(root, f"{split}.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["ID", "duration", "wav",
                                              "start", "stop", "spk_id"])
            w.writeheader()
            w.writerows(rs)

    # verification pairs: every enrol x test pair, label = same speaker
    # (file uses wav-relative names; eval's key_of maps them back to IDs)
    with open(os.path.join(root, "veri_pairs.txt"), "w") as f:
        for e in rows["enrol"]:
            for t in rows["test"]:
                label = int(e["spk_id"] == t["spk_id"])
                f.write(f"{label} {e['ID'].replace('--', '/')}.wav "
                        f"{t['ID'].replace('--', '/')}.wav\n")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--speakers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-train", type=int, default=14,
                    help="train utterances per speaker (each a fresh f0/AM "
                         "draw — more draws = denser harmonic sampling of "
                         "the speaker envelope, the generalization lever)")
    ap.add_argument("--n-eval", type=int, default=2,
                    help="enrol AND test utterances per speaker")
    ap.add_argument("--gen-only", action="store_true",
                    help="write the corpus and exit (lets corpus synthesis "
                         "run on CPU while the chip is busy)")
    ap.add_argument("--root", default=None)
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra config overrides passed through to the "
                         "recipe CLIs (e.g. --extra --augment.drop_freq "
                         "false --optim.max_lr 0.002)")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="ecapa_conv_")
    print(f"corpus -> {root}", flush=True)
    if not os.path.exists(os.path.join(root, "train.csv")):
        make_corpus(root, args.speakers, n_train=args.n_train,
                    n_enrol=args.n_eval, n_test=args.n_eval)
    if args.gen_only:
        return

    ckpt_dir = os.path.join(root, "ckpt")
    overrides = [
        "--data.train_csv", os.path.join(root, "train.csv"),
        "--data.enrol_csv", os.path.join(root, "enrol.csv"),
        "--data.test_csv", os.path.join(root, "test.csv"),
        "--data.veri_pairs", os.path.join(root, "veri_pairs.txt"),
        "--data.batch_size", str(args.batch),
        "--optim.epochs", "100000",
        "--optim.max_lr", "0.001",
        "--optim.cycle_steps", str(max(200, args.steps // 2)),
        "--train.ckpt_dir", ckpt_dir,
        "--train.max_steps", str(args.steps),
        "--train.save_every_steps", str(args.steps),
        "--train.log_every_steps", "50",
        "--eval.cohort_size", "64",
    ] + list(args.extra)

    import train_speaker_embeddings as tse

    sys.argv = ["train_speaker_embeddings.py"] + overrides
    tse.main()

    import speaker_verification_cosine as sv

    # with and without s-norm, through the real eval path
    results = {"steps": args.steps, "speakers": args.speakers,
               "batch": args.batch}
    sys.argv = ["speaker_verification_cosine.py"] + overrides + [
        "--eval.score_norm", "false"]
    results["eer_cosine"] = float(sv.main())
    sys.argv = ["speaker_verification_cosine.py"] + overrides + [
        "--eval.score_norm", "true"]
    results["eer_snorm"] = float(sv.main())

    # score distributions for the committed artifact: rebuild embeddings once
    from mindaudio_tpu.train.checkpoint import restore_checkpoint
    from mindaudio_tpu.train.config import get_config
    from dataset import n_speakers as count_spk, read_segments

    sys.argv = ["x"] + overrides
    cfg = get_config(os.path.join(HERE, "ecapatdnn.yaml"))
    model = sv.SpeakerNet(n_classes=count_spk(cfg.data.train_csv),
                          emb_dim=int(cfg.model.emb_dim),
                          channels=tuple(cfg.model.channels))
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    embed_fn = sv.make_embed_fn(model, variables, cfg)
    embs = sv.embed_rows(embed_fn, read_segments(cfg.data.enrol_csv)[0])
    embs.update(sv.embed_rows(embed_fn, read_segments(cfg.data.test_csv)[0]))
    pairs = []
    with open(cfg.data.veri_pairs) as f:
        for line in f:
            lab, e, t = line.split()
            key = lambda r: r.replace("/", "--").rsplit(".", 1)[0]
            pairs.append((int(lab), key(e), key(t)))
    # same emb-mean normalization the eval path applies (reference
    # eval_impl:778-785): the committed distributions should be the scores
    # the protocol actually thresholds
    mean = np.mean(np.stack(list(embs.values())), axis=0)
    pos, neg = sv.score_trials(sv.subtract_mean(embs, mean), pairs)
    out_dir = os.path.join(HERE, "convergence")
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "scores.npz"),
                        pos=np.asarray(pos), neg=np.asarray(neg))
    results["n_pos"], results["n_neg"] = len(pos), len(neg)
    results["pos_mean"] = float(np.mean(pos))
    results["neg_mean"] = float(np.mean(neg))
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
