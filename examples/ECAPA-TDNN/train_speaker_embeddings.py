"""ECAPA-TDNN speaker-embedding training on TPU.

Counterpart of reference ``examples/ECAPA-TDNN/train_speaker_embeddings.py``
(manual loop ``train_net`` :326, cyclic LR :418): fbank + per-utterance mean
normalization (the reference's InputNormalization, spec_augment.py:22) run on
device inside the jitted sharded step; EcapaTDNN → cosine Classifier →
AAM-softmax + CE is the classification objective.

Usage: python train_speaker_embeddings.py [--train.max_steps 10]
"""

from __future__ import annotations

import os
import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.loss.aam_softmax import aam_softmax_loss
from mindaudio_tpu.models.ecapa_tdnn import Classifier, EcapaTDNN
from mindaudio_tpu.ops.spectral import fbank as device_fbank
from mindaudio_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         put_global_batch)
from mindaudio_tpu.scheduler.schedules import cyclic_triangular_lr
from mindaudio_tpu.train.checkpoint import CheckpointManager
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.train.log import get_logger
from mindaudio_tpu.train.state import TrainState

from dataset import Augmenter, batch_iterator, n_speakers


class SpeakerNet(nn.Module):
    """Embedding net + cosine classifier in one module (reference
    BuildTrainNetwork, train_speaker_embeddings.py:285)."""

    n_classes: int
    emb_dim: int = 192
    channels: tuple = (512, 512, 512, 512, 1536)

    @nn.compact
    def __call__(self, feats, lengths=None, deterministic=True):
        emb = EcapaTDNN(channels=self.channels, lin_neurons=self.emb_dim,
                        name="embedding_model")(
            feats, lengths=lengths, deterministic=deterministic)
        cosine = Classifier(self.n_classes, lin_neurons=self.emb_dim,
                            name="classifier")(emb, deterministic=deterministic)
        return emb, cosine


FBANK_N_FFT = 400
FBANK_HOP = FBANK_N_FFT // 2  # device_fbank default: hop = win//2, centered


def extract_features(wavs, n_mels=80, wav_lens=None):
    """(B, L) waveforms → (B, T, n_mels) mean-normalized log-fbank, on device.

    With ``wav_lens`` the per-utterance mean is computed over valid frames
    only, padded frames are zeroed, and ``(feats, feat_lens)`` is returned —
    the variable-length path for full-utterance verification eval (reference
    scores whole utterances, speaker_verification_cosine.py:572-668).
    """
    feats = device_fbank(wavs, n_mels=n_mels)  # (B, n_mels, T)
    feats = jnp.swapaxes(feats, -1, -2)
    if wav_lens is None:
        return feats - feats.mean(axis=1, keepdims=True)
    from mindaudio_tpu.utils.mask import make_non_pad_mask

    feat_lens = (1 + wav_lens // FBANK_HOP).astype(jnp.int32)
    mask = make_non_pad_mask(feat_lens, feats.shape[1])[..., None]
    count = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mean = (feats * mask).sum(axis=1, keepdims=True) / count
    return jnp.where(mask, feats - mean, 0.0), feat_lens


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "ecapatdnn.yaml"))
    logger = get_logger("ecapa")
    initialize_distributed()
    mesh = make_mesh(data=jax.device_count())
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    n_cls = n_speakers(cfg.data.train_csv)
    logger.info("speakers: %d", n_cls)
    model = SpeakerNet(n_classes=n_cls, emb_dim=int(cfg.model.emb_dim),
                       channels=tuple(cfg.model.channels))

    # batch must shard evenly over the data axis
    n_data = mesh.shape["data"]
    batch_size = max(n_data, int(cfg.data.batch_size) // n_data * n_data)

    aug = Augmenter(cfg, np.random.default_rng(0))
    it = batch_iterator(
        cfg.data.train_csv, batch_size,
        seg_dur=float(cfg.data.seg_dur), epochs=int(cfg.optim.epochs),
        rank=jax.process_index(), world_size=jax.process_count(),
        augmenter=aug,
    )
    epoch, first = next(it)
    feats = extract_features(jnp.asarray(first["wavs"]),
                             n_mels=int(cfg.features.n_mels))
    variables = model.init(jax.random.PRNGKey(0), feats)
    schedule = cyclic_triangular_lr(
        float(cfg.optim.min_lr), float(cfg.optim.max_lr),
        int(cfg.optim.cycle_steps),
    )
    tx = optax.adamw(schedule, weight_decay=float(cfg.optim.weight_decay))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )
    state = jax.device_put(state, repl)

    def loss_fn(params, batch_stats, batch):
        feats = extract_features(batch["wavs"], n_mels=int(cfg.features.n_mels))
        (emb, cosine), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, feats,
            deterministic=False, mutable=["batch_stats"],
        )
        loss = aam_softmax_loss(
            cosine, batch["labels"],
            margin=float(cfg.optim.margin), scale=float(cfg.optim.scale),
        )
        acc = (cosine.argmax(-1) == batch["labels"]).mean()
        return loss, (mutated["batch_stats"], acc)

    def step(state, batch):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        gnorm = optax.global_norm(grads)
        # non-finite-safe clip: a single inf/NaN leaf must zero the update,
        # not poison the params (inf * 0 = NaN otherwise)
        scale = jnp.where(jnp.isfinite(gnorm),
                          jnp.minimum(1.0, cfg.optim.grad_clip / (gnorm + 1e-6)),
                          0.0)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g * scale, 0.0), grads)
        state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
        return state, {"loss": loss, "acc": acc, "grad_norm": gnorm}

    step_fn = jax.jit(step, in_shardings=(repl, data_sh),
                      out_shardings=(repl, repl), donate_argnums=(0,))

    ckpt = CheckpointManager(cfg.train.ckpt_dir,
                             keep_max=int(cfg.train.keep_checkpoint_max))
    max_steps = int(cfg.train.max_steps)
    t0 = time.time()
    step_count = 0

    def run(state, batch):
        dev = put_global_batch(data_sh, batch)
        return step_fn(state, dev)

    from mindaudio_tpu.train.prefetch import prefetch

    state, metrics = run(state, first)
    step_count += 1
    # collate/augment + H2D for batch N+1 overlap step N on device
    for epoch, batch in prefetch(
            it, size=2,
            transform=lambda eb: (eb[0], put_global_batch(data_sh, eb[1]))):
        state, metrics = step_fn(state, batch)
        step_count += 1
        if step_count % int(cfg.train.log_every_steps) == 0:
            logger.info("epoch %d step %d loss %.4f acc %.3f gnorm %.3g %.2f s/step",
                        epoch, step_count, float(metrics["loss"]),
                        float(metrics["acc"]), float(metrics["grad_norm"]),
                        (time.time() - t0) / step_count)
        if step_count % int(cfg.train.save_every_steps) == 0:
            # all ranks call save (orbax is a global collective; primary writes)
            ckpt.save(jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats}
            ), step_count)
        if max_steps and step_count >= max_steps:
            break

    # all ranks call save (orbax is a global collective; primary writes)
    ckpt.save(jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats}
        ), step_count)
    logger.info("done: %d steps", step_count)


if __name__ == "__main__":
    main()
