"""DeepSpeech2 LibriSpeech training on TPU.

Counterpart of reference ``examples/deepspeech2/train.py:26``. The step —
log1p(|STFT|) feature extraction, masked per-utterance normalization, the
conv+BiLSTM forward, CTC loss, backward, update — is one jitted XLA program,
batch-sharded over the ``data`` mesh axis. The reference computes features on
host per utterance (dataset.py:31-48) and pads everything to 1250 frames.

Usage: python train.py --config deepspeech2.yaml [--train.max_steps 10]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.loss.ctc_loss import ctc_loss
from mindaudio_tpu.models.deepspeech2 import DeepSpeechModel
from mindaudio_tpu.ops.spectral import _power_frames
from mindaudio_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         put_global_batch)
from mindaudio_tpu.train.checkpoint import CheckpointManager
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.train.log import get_logger
from mindaudio_tpu.train.state import (
    TrainState,
    clip_by_global_norm,
    skip_nonfinite_update,
)

from dataset import BLANK_ID, HOP, LABELS, N_FFT, batch_iterator


def device_features(wavs, wav_lens):
    """log1p magnitude spectrogram + masked per-utterance mean/std normalize
    (reference dataset.py:31-48, on device). Returns (B, T, F), frame lens."""
    mag = _power_frames(
        wavs, N_FFT, N_FFT, HOP, "hann", True, "constant", power=1.0,
        precision=None,
    )  # (B, n_frames, n_freq) time-major
    feats = jnp.log1p(mag)
    feat_lens = wav_lens // HOP + 1
    t = feats.shape[1]
    valid = (jnp.arange(t)[None, :] < feat_lens[:, None])[..., None]
    n = jnp.maximum(valid.sum((1, 2)) * feats.shape[-1], 1)[:, None, None]
    mean = jnp.where(valid, feats, 0.0).sum((1, 2), keepdims=True) / n
    var = (jnp.where(valid, feats - mean, 0.0) ** 2).sum((1, 2), keepdims=True) / n
    feats = jnp.where(valid, (feats - mean) / jnp.sqrt(var + 1e-8), 0.0)
    return feats, feat_lens.astype(jnp.int32)


def make_step(cfg, model, mesh, st_sh):
    def loss_fn(params, batch_stats, batch):
        feats, feat_lens = device_features(batch["wavs"], batch["wav_lens"])
        (logits, out_lens), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, feat_lens, deterministic=False, mutable=["batch_stats"],
        )
        loss = ctc_loss(logits, out_lens, batch["labels"], batch["label_lens"],
                        blank_id=BLANK_ID)
        return loss, mutated["batch_stats"]

    def step(state, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        grads, gnorm = clip_by_global_norm(grads, cfg.optim.grad_clip)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        # batch_stats revert too on a non-finite batch (they sit in the state)
        new_state = skip_nonfinite_update(state, new_state, loss, grads=grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step, in_shardings=(st_sh, data_sh), out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    ), data_sh


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "deepspeech2.yaml"))
    logger = get_logger("deepspeech2")
    initialize_distributed()
    mesh = make_mesh(data=jax.device_count())

    model = DeepSpeechModel(
        vocab_size=len(LABELS),
        hidden_size=int(cfg.model.hidden_size),
        num_rnn_layers=int(cfg.model.num_rnn_layers),
    )

    it = batch_iterator(
        cfg.data.train_manifest, int(cfg.data.batch_size),
        epochs=int(cfg.optim.epochs),
        rank=jax.process_index(), world_size=jax.process_count(),
    )
    epoch, first = next(it)
    feats, feat_lens = device_features(
        jnp.asarray(first["wavs"]), jnp.asarray(first["wav_lens"])
    )
    variables = model.init(jax.random.PRNGKey(0), feats, feat_lens)
    tx = optax.adamw(float(cfg.optim.lr), weight_decay=float(cfg.optim.weight_decay))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )

    from mindaudio_tpu.parallel.shardings import state_shardings

    st_sh = state_shardings(
        state, mesh, zero1=bool(cfg.train.get("zero1_optimizer", False)))
    state = jax.device_put(state, st_sh)
    step_fn, data_sh = make_step(cfg, model, mesh, st_sh)

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
            logger.info("epoch %d step %d loss %.4f %.2f s/step",
                        epoch, step_count, float(metrics["loss"]),
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
