"""Speaker verification: cosine scoring (+ s-norm) and EER on VoxCeleb trials.

Counterpart of reference
``examples/ECAPA-TDNN/speaker_verification_cosine.py`` (``eval_impl`` :746,
``evaluate2`` :572, ``emb_mean`` :656, EER :632): embed enrol/test utterances
with the trained EcapaTDNN, score verification pairs by cosine, optionally
apply adaptive s-norm, report EER.

Full-utterance eval: utterances are embedded at their natural length —
bucketed into a bounded set of padded lengths (one jit cache entry per
bucket) with length-masked statistics pooling — matching the reference's
whole-utterance scoring rather than a fixed crop. The s-norm cohort is built
from *training* utterances (the reference's train_data cohort,
speaker_verification_cosine.py:656-668), not from the trial sides.

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

from dataset import SAMPLE_RATE, load_segment, read_segments
from mindaudio_tpu.data import io
from train_speaker_embeddings import SpeakerNet, extract_features

BUCKET_STEP = 2 * SAMPLE_RATE   # pad lengths up to a multiple of 2 s
MAX_LEN = 40 * SAMPLE_RATE      # truncate pathological outliers at 40 s
BATCH = 16


def _bucket_len(n: int) -> int:
    n = min(max(n, 1), MAX_LEN)
    return min(-(-n // BUCKET_STEP) * BUCKET_STEP, MAX_LEN)


def make_embed_fn(model, variables, cfg):
    """Returns embed(wavs (B, L), wav_lens (B,)) → unit-norm embeddings.

    jit caches one executable per bucketed (B, L) shape; the bucket grid keeps
    that set small.
    """

    @jax.jit
    def run(wavs, wav_lens):
        feats, feat_lens = extract_features(
            wavs, n_mels=int(cfg.features.n_mels), wav_lens=wav_lens)
        emb, _ = model.apply(variables, feats, lengths=feat_lens,
                             deterministic=True)
        emb = emb.reshape(emb.shape[0], -1)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    return run


def _read_full(row) -> np.ndarray:
    """The row's full segment: honors start/stop columns when present (a CSV
    may carry several segment rows of one wav file — each must embed its own
    span, not the whole file), else the whole utterance. Non-16 kHz audio is
    resampled (like the training collate) — feeding a wrong-rate waveform
    would silently shift every feature."""
    start, stop = int(row.get("start", 0) or 0), int(row.get("stop", 0) or 0)
    if stop > start:
        # probe the actual rate first: load_segment converts start/stop with
        # SAMPLE_RATE and never resamples, so a non-16 kHz wav must take the
        # full-read path with rescaled indices instead
        _, sr = io.read(row["wav"], duration=1.0 / SAMPLE_RATE)
        if sr == SAMPLE_RATE:
            return load_segment(row, stop - start)[:MAX_LEN]
        x, sr = io.read(row["wav"])
        x = np.asarray(x, np.float32)
        if x.ndim > 1:
            x = x[:, 0]
        from mindaudio_tpu.data.processing import resample

        x = np.asarray(resample(x, sr, SAMPLE_RATE), np.float32)
        start = int(round(start * SAMPLE_RATE / sr))
        stop = int(round(stop * SAMPLE_RATE / sr))
        x = x[start:stop]
    else:
        x, sr = io.read(row["wav"])
        x = np.asarray(x, np.float32)
        if x.ndim > 1:
            x = x[:, 0]
        if sr != SAMPLE_RATE:
            from mindaudio_tpu.data.processing import resample

            x = np.asarray(resample(x, sr, SAMPLE_RATE), np.float32)
    return x[:MAX_LEN]


def embed_rows(embed_fn, rows, loader=_read_full):
    """id → embedding over full utterances, grouped into length buckets."""
    waves = [(r["ID"], loader(r)) for r in rows]
    by_bucket: dict[int, list] = {}
    for key, x in waves:
        by_bucket.setdefault(_bucket_len(len(x)), []).append((key, x))

    embs = {}
    for blen, items in sorted(by_bucket.items()):
        for i in range(0, len(items), BATCH):
            chunk = items[i:i + BATCH]
            # the trailing partial batch is padded to a full one: one (B, L)
            # shape per bucket keeps the jit cache at one entry per bucket
            wavs = np.zeros((BATCH, blen), np.float32)
            lens = np.full((BATCH,), 1, np.int32)
            for j, (_, x) in enumerate(chunk):
                wavs[j, :len(x)] = x
                lens[j] = len(x)
            out = np.asarray(embed_fn(jnp.asarray(wavs), jnp.asarray(lens)))
            for j, (key, _) in enumerate(chunk):
                embs[key] = out[j]
    return embs


def training_cohort(embed_fn, train_csv, pool_size: int = 0):
    """Cohort embeddings from training utterances (reference emb_mean over
    train_dataloader :656-668 embeds the whole training set as the cohort;
    per-trial top-k selection happens later in :func:`score_trials`).

    ``pool_size`` bounds the pool (0 = whole training set); when bounding,
    utterances are taken round-robin across speakers so the cohort spans the
    speaker space.
    """
    rows, _ = read_segments(train_csv)
    target = len(rows) if not pool_size else min(pool_size, len(rows))
    by_spk: dict[str, list] = {}
    for r in rows:
        by_spk.setdefault(r["spk_id"], []).append(r)
    # round-robin across speakers so the cohort spans the speaker space
    ordered = []
    idx = 0
    while len(ordered) < target:
        for spk in sorted(by_spk):
            if idx < len(by_spk[spk]):
                ordered.append(by_spk[spk][idx])
                if len(ordered) >= target:
                    break
        idx += 1

    embs = embed_rows(embed_fn, ordered)
    return np.stack([embs[r["ID"]] for r in ordered])


def subtract_mean(embs, mean):
    """Global-mean embedding subtraction (reference eval_impl:778-785 via
    emb_mean:656-668): remove the common-mode component every embedding
    shares, then re-normalize so dot products are cosines again. The
    reference's running-mean formulation (three passes over the enroll dict,
    then the train cohort under the same accumulator) converges to exactly
    this: cosine scoring of mean-subtracted embeddings. Without it, the
    shared component inflates every cosine (negative pairs land at ~0.7)
    and compresses the score range EER works with."""
    out = {}
    for k, v in embs.items():
        c = v - mean
        out[k] = c / max(float(np.linalg.norm(c)), 1e-12)
    return out


def score_trials(embs, pairs, cohort=None, cohort_size=0):
    """Cosine (optionally s-normed) scores for (label, enrol, test) trials.

    Adaptive s-norm (reference evaluate2:595-612): each trial side is scored
    against the full ``cohort`` matrix, then only the per-trial TOP
    ``cohort_size`` cohort scores (``np.partition`` selection, like the
    reference's ``ops.TopK``) feed the mean/std normalization. Pass
    ``cohort_size=0`` (or a size >= the cohort) for plain s-norm over the
    whole cohort.
    """
    pos, neg = [], []

    def _top(scores):
        k = int(cohort_size)
        if k and k < len(scores):
            scores = np.partition(scores, len(scores) - k)[-k:]
        return scores

    for label, e_key, t_key in pairs:
        if e_key not in embs or t_key not in embs:
            continue
        e, t = embs[e_key], embs[t_key]
        score = float(np.dot(e, t))
        if cohort is not None:
            e_c = _top(cohort @ e)
            t_c = _top(cohort @ t)
            score = 0.5 * ((score - e_c.mean()) / (e_c.std() + 1e-8)
                           + (score - t_c.mean()) / (t_c.std() + 1e-8))
        (pos if label == 1 else neg).append(score)
    return pos, neg


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "ecapatdnn.yaml"))
    # a training checkpoint knows the class count; rebuild the same net
    from dataset import n_speakers

    n_cls = n_speakers(cfg.data.train_csv)
    model = SpeakerNet(n_classes=n_cls, emb_dim=int(cfg.model.emb_dim),
                       channels=tuple(cfg.model.channels))
    ckpt = restore_checkpoint(cfg.train.ckpt_dir)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    embed_fn = make_embed_fn(model, variables, cfg)
    embs = embed_rows(embed_fn, read_segments(cfg.data.enrol_csv)[0])
    embs.update(embed_rows(embed_fn, read_segments(cfg.data.test_csv)[0]))

    def key_of(rel):
        return rel.replace("/", "--").rsplit(".", 1)[0]

    pairs = []
    with open(cfg.data.veri_pairs, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                pairs.append((int(parts[0]), key_of(parts[1]), key_of(parts[2])))

    cohort = None
    if bool(cfg.eval.score_norm):
        # embed a large pool (whole train set unless eval.cohort_pool bounds
        # it); cohort_size then selects the top scores per trial
        cohort = training_cohort(embed_fn, cfg.data.train_csv,
                                 int(cfg.eval.get("cohort_pool", 0)))

    # emb-mean normalization (reference "Sub mean...", eval_impl:778-785):
    # one global mean over trial sides and cohort, subtracted from both so
    # trial-cohort scores live in the same centered space
    stack = list(embs.values()) + ([] if cohort is None else list(cohort))
    mean = np.mean(np.stack(stack), axis=0)
    embs = subtract_mean(embs, mean)
    if cohort is not None:
        cohort = cohort - mean
        cohort /= np.maximum(
            np.linalg.norm(cohort, axis=-1, keepdims=True), 1e-12)

    pos, neg = score_trials(embs, pairs, cohort,
                            cohort_size=int(cfg.eval.cohort_size))
    eer, threshold = get_eer(np.asarray(pos), np.asarray(neg))
    print(f"pairs={len(pos) + len(neg)} EER={100 * eer:.2f}% thr={threshold:.4f}")
    return eer


if __name__ == "__main__":
    main()
