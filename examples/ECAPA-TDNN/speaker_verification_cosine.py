"""Speaker verification: cosine scoring (+ s-norm) and EER on VoxCeleb trials.

Counterpart of reference
``examples/ECAPA-TDNN/speaker_verification_cosine.py`` (``eval_impl`` :746,
``evaluate2`` :572, ``emb_mean`` :656, EER :632): embed enrol/test
utterances with the trained EcapaTDNN, score verification pairs by cosine,
optionally apply adaptive s-norm over a training cohort, report EER.

Usage: python speaker_verification_cosine.py
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.metric.eer import get_eer
from mindaudio_tpu.train.checkpoint import restore_checkpoint
from mindaudio_tpu.train.config import get_config

from dataset import SAMPLE_RATE, read_segments
from mindaudio_tpu.data import io
from train_speaker_embeddings import SpeakerNet, extract_features


def embed_utterances(model, variables, csv_path, cfg, seg_len):
    """utt-id → L2-normalized embedding (fixed-length center crop/pad)."""

    @jax.jit
    def run(wavs):
        feats = extract_features(wavs, n_mels=int(cfg.features.n_mels))
        emb, _ = model.apply(variables, feats, deterministic=True)
        emb = emb.reshape(emb.shape[0], -1)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    rows, _ = read_segments(csv_path)
    embs = {}
    batch, keys = [], []
    def flush():
        if not batch:
            return
        out = np.asarray(run(jnp.asarray(np.stack(batch))))
        for k, e in zip(keys, out):
            embs[k] = e
        batch.clear(); keys.clear()

    for r in rows:
        x, sr = io.read(r["wav"])
        x = np.asarray(x, np.float32)
        if x.ndim > 1:
            x = x[:, 0]
        out = np.zeros(seg_len, np.float32)
        n = min(len(x), seg_len)
        out[:n] = x[:n]
        batch.append(out)
        keys.append(r["ID"])
        if len(batch) == 32:
            flush()
    flush()
    return embs


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "ecapatdnn.yaml"))
    # a training checkpoint knows the class count; rebuild the same net
    from dataset import n_speakers

    n_cls = n_speakers(cfg.data.train_csv)
    model = SpeakerNet(n_classes=n_cls, emb_dim=int(cfg.model.emb_dim),
                       channels=tuple(cfg.model.channels))
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    seg_len = int(float(cfg.data.seg_dur) * SAMPLE_RATE)
    embs = embed_utterances(model, variables, cfg.data.enrol_csv, cfg, seg_len)
    embs.update(embed_utterances(model, variables, cfg.data.test_csv, cfg, seg_len))

    def key_of(rel):
        return rel.replace("/", "--").rsplit(".", 1)[0]

    pos, neg = [], []
    pairs = []
    with open(cfg.data.veri_pairs, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                pairs.append((int(parts[0]), key_of(parts[1]), key_of(parts[2])))

    cohort = None
    if bool(cfg.eval.score_norm):
        keys = sorted(embs)
        cohort = np.stack([embs[k] for k in keys[: int(cfg.eval.cohort_size)]])

    for label, e_key, t_key in pairs:
        if e_key not in embs or t_key not in embs:
            continue
        e, t = embs[e_key], embs[t_key]
        score = float(np.dot(e, t))
        if cohort is not None:
            # adaptive s-norm (reference evaluate2:572-668)
            e_c = cohort @ e
            t_c = cohort @ t
            score = 0.5 * ((score - e_c.mean()) / (e_c.std() + 1e-8)
                           + (score - t_c.mean()) / (t_c.std() + 1e-8))
        (pos if label == 1 else neg).append(score)

    eer, threshold = get_eer(np.asarray(pos), np.asarray(neg))
    print(f"pairs={len(pos) + len(neg)} EER={100 * eer:.2f}% thr={threshold:.4f}")


if __name__ == "__main__":
    main()
